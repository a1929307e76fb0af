"""Import the ACTUAL reference implementation (/root/reference) for golden
end-to-end parity tests.

The reference imports kornia (only ``create_meshgrid``,
lib/networks/enerf/utils.py:65) and builds a global cfg singleton from
sys.argv at import time (lib/config/config.py:191-201, reading the
``workspace`` env var at :10). Both are handled here: kornia is stubbed with
an exact ``create_meshgrid`` equivalent, and the import runs under a
controlled argv/cwd pointed at the reference's own
configs/exps/pretrain/enerf/dtu_pretrain.yaml.

This module ships nothing to production — it exists so that tests compare
our TPU build against the reference's real code, not a re-derivation.
"""

from __future__ import annotations

import os
import sys
import tempfile
import types
from types import SimpleNamespace

import numpy as np

_REF_ROOT = "/root/reference"
_ref: SimpleNamespace | None = None


def _create_meshgrid(height, width, normalized_coordinates=True, device=None,
                     dtype=None):
    """Exact stand-in for kornia.utils.create_meshgrid: (1, H, W, 2) grid of
    (x, y) pixel coordinates, optionally normalized to [-1, 1]."""
    import torch

    xs = torch.arange(width, device=device, dtype=dtype or torch.float32)
    ys = torch.arange(height, device=device, dtype=dtype or torch.float32)
    if normalized_coordinates:
        xs = xs / (width - 1) * 2.0 - 1.0
        ys = ys / (height - 1) * 2.0 - 1.0
    grid = torch.stack(torch.meshgrid(xs, ys, indexing="xy"), dim=-1)
    return grid[None]


def _stub_kornia():
    if "kornia" in sys.modules:
        return
    kornia = types.ModuleType("kornia")
    kutils = types.ModuleType("kornia.utils")
    kutils.create_meshgrid = _create_meshgrid
    kornia.utils = kutils
    sys.modules["kornia"] = kornia
    sys.modules["kornia.utils"] = kutils


def _stub_imp():
    """The reference's factories use the removed-in-3.12 ``imp`` module
    (lib/networks/make_network.py:1); provide load_source via importlib."""
    if "imp" in sys.modules:
        return
    import importlib.machinery
    import importlib.util

    imp = types.ModuleType("imp")

    def load_source(name, path):
        loader = importlib.machinery.SourceFileLoader(name, path)
        spec = importlib.util.spec_from_loader(name, loader)
        mod = importlib.util.module_from_spec(spec)
        loader.exec_module(mod)
        sys.modules[name] = mod
        return mod

    imp.load_source = load_source
    sys.modules["imp"] = imp


def load_reference(
    cfg_file: str = "configs/exps/pretrain/enerf/dtu_pretrain.yaml",
):
    """Import the reference package once per process and return a namespace
    with its cfg singleton and network/utils modules.

    The reference cfg is a process-wide singleton, so every caller in one
    pytest process shares the first ``cfg_file``; tests mutate cfg fields
    (it is never frozen, lib/config/config.py:170-188) for their scenario.
    """
    global _ref
    if _ref is not None:
        return _ref

    _stub_kornia()
    _stub_imp()
    os.environ.setdefault("workspace", tempfile.mkdtemp(prefix="ref_ws_"))
    old_argv, old_cwd = sys.argv, os.getcwd()
    sys.argv = ["ref_parity", "--cfg_file", cfg_file]
    os.chdir(_REF_ROOT)
    if _REF_ROOT not in sys.path:
        sys.path.insert(0, _REF_ROOT)
    try:
        from lib.config import cfg  # parses argv, loads the YAML chain

        import lib.networks.enerf.network as enerf_network
        import lib.networks.enerf.utils as enerf_utils
        import lib.networks.enerf.nerf as enerf_nerf
    finally:
        sys.argv = old_argv
        os.chdir(old_cwd)

    _ref = SimpleNamespace(
        cfg=cfg,
        enerf_network=enerf_network,
        enerf_utils=enerf_utils,
        enerf_nerf=enerf_nerf,
    )
    return _ref


def load_reference_boost():
    """Also import the boost_enerf network (needs a view_selection.json in
    cfg.result_dir unless constructed with preprocess=True)."""
    ref = load_reference()
    old_cwd = os.getcwd()
    os.chdir(_REF_ROOT)
    try:
        import lib.networks.boost_enerf.network as boost_network
    finally:
        os.chdir(old_cwd)
    ref.boost_network = boost_network
    return ref


def load_reference_mvsnerf():
    """Import the reference MVSNeRF stack (needs an inplace_abn stub: plain
    BN + leaky_relu(0.01), the InPlaceABN default activation, and a
    torchvision stub — lib/networks/mvsnerf/utils.py:7 imports transforms
    that the network-parity paths never call)."""
    ref = load_reference()
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
    # the reference Embedder pins its frequency bands with .cuda() at
    # construction time (lib/networks/mvsnerf/network.py:44); neutralize it
    # on this CPU-only torch build so Network() can be instantiated
    import torch

    if not torch.cuda.is_available() and not getattr(
        torch.Tensor.cuda, "_parity_noop", False
    ):
        def _cuda_noop(self, *a, **k):
            return self

        _cuda_noop._parity_noop = True
        torch.Tensor.cuda = _cuda_noop

    if "inplace_abn" not in sys.modules:
        import torch.nn as nn

        class InPlaceABN(nn.Module):
            """Numerically-equivalent stand-in: BatchNorm + leaky_relu(0.01)
            (the in-place memory trick is irrelevant for parity). Registers
            weight/bias/running stats directly like the real InPlaceABN, so
            state-dict key names match real checkpoints (``<block>.bn.weight``
            etc. — what port_weights.port_mvsnerf maps); the functional
            batch_norm normalizes dim 1 for 2D and 3D conv activations
            alike (the mvsnerf CostRegNet is Conv3d)."""

            def __init__(self, num_features, eps=1e-5, momentum=0.1, **kw):
                super().__init__()
                self.eps = eps
                self.momentum = momentum
                self.weight = nn.Parameter(torch.ones(num_features))
                self.bias = nn.Parameter(torch.zeros(num_features))
                self.register_buffer(
                    "running_mean", torch.zeros(num_features)
                )
                self.register_buffer("running_var", torch.ones(num_features))

            def forward(self, x):
                y = torch.nn.functional.batch_norm(
                    x,
                    self.running_mean,
                    self.running_var,
                    self.weight,
                    self.bias,
                    self.training,
                    self.momentum,
                    self.eps,
                )
                return torch.nn.functional.leaky_relu(y, 0.01)

        mod = types.ModuleType("inplace_abn")
        mod.InPlaceABN = InPlaceABN
        sys.modules["inplace_abn"] = mod

    old_cwd = os.getcwd()
    os.chdir(_REF_ROOT)
    try:
        import lib.networks.mvsnerf.network as mvsnerf_network
        import lib.networks.mvsnerf.renderer as mvsnerf_renderer
        import lib.networks.mvsnerf.utils as mvsnerf_utils
    finally:
        os.chdir(old_cwd)
    ref.mvsnerf_network = mvsnerf_network
    ref.mvsnerf_renderer = mvsnerf_renderer
    ref.mvsnerf_utils = mvsnerf_utils
    return ref


def load_reference_boost_mvsnerf():
    """Also import the boost_mvsnerf network (needs the mvsnerf stack plus a
    view_selection.json in cfg.result_dir unless preprocess=True)."""
    ref = load_reference_mvsnerf()
    old_cwd = os.getcwd()
    os.chdir(_REF_ROOT)
    try:
        import lib.networks.boost_mvsnerf.network as boost_mvsnerf_network
    finally:
        os.chdir(old_cwd)
    ref.boost_mvsnerf_network = boost_mvsnerf_network
    return ref


def torch_batch_from(batch: dict, levels: int = 2,
                     render_scales=(0.25, 1.0)) -> dict:
    """Convert a framework-convention batch (tests/helpers.make_batch) to the
    reference's torch batch: NCHW images plus CPU-built full-raster ray
    tensors (ray_o(3) + ray_d(3) + uv(2), x-fastest raster order — the test
    split of lib/datasets/enerf_utils.py:63-71)."""
    import torch

    src_inps = np.asarray(batch["src_inps"]).transpose(0, 1, 4, 2, 3)
    out = {
        "src_inps": torch.from_numpy(np.ascontiguousarray(src_inps)),
        "src_exts": torch.from_numpy(np.asarray(batch["src_exts"])),
        "src_ixts": torch.from_numpy(np.asarray(batch["src_ixts"])),
        "tar_ext": torch.from_numpy(np.asarray(batch["tar_ext"])),
        "tar_ixt": torch.from_numpy(np.asarray(batch["tar_ixt"])),
        "near_far": torch.from_numpy(np.asarray(batch["near_far"])),
    }
    B, _, H, W = src_inps.shape[0], src_inps.shape[1], src_inps.shape[3], src_inps.shape[4]
    for lvl in range(levels):
        scale = render_scales[lvl]
        rays = np.stack(
            [
                _full_raster_rays(
                    np.asarray(batch["tar_ext"])[b],
                    np.asarray(batch["tar_ixt"])[b],
                    H,
                    W,
                    scale,
                )
                for b in range(B)
            ]
        )
        out[f"rays_{lvl}"] = torch.from_numpy(rays)
    return out


def _full_raster_rays(tar_ext, tar_ixt, H, W, scale):
    """Reference test-split ray layout (lib/datasets/enerf_utils.py:63-71):
    rays_o = camera center, rays_d = pixel @ (K^-T R^T) unnormalized, plus
    integer uv; raster order with x fastest."""
    ixt = tar_ixt.copy()
    ixt[:2] *= scale
    Hs, Ws = int(H * scale), int(W * scale)
    c2w = np.linalg.inv(tar_ext)
    X, Y = np.meshgrid(np.arange(Ws), np.arange(Hs))
    XYZ = np.concatenate(
        [X[..., None], Y[..., None], np.ones_like(X[..., None])], axis=-1
    )
    XYZ = XYZ @ (np.linalg.inv(ixt).T @ c2w[:3, :3].T)
    rays_o = np.broadcast_to(c2w[:3, 3], (Hs, Ws, 3))
    rays = np.concatenate(
        [rays_o, XYZ, X[..., None], Y[..., None]], axis=-1
    )
    return rays.reshape(-1, 8).astype(np.float32)
