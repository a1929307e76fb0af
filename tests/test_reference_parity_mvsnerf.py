"""Golden end-to-end parity for the MVSNeRF family against the ACTUAL
reference implementation.

Companion to tests/test_reference_parity.py (ENeRF family): imports
/root/reference's own mvsnerf stack (inplace_abn/kornia/torchvision stubbed,
tests/ref_loader.py), seeds the reference ``Network``
(lib/networks/mvsnerf/network.py:782-1126) and the boost variant
(lib/networks/boost_mvsnerf/network.py), ports the state dicts through
utils/port_weights.port_mvsnerf, runs BOTH pipelines on the same synthetic
batch, and asserts rendered rgb/depth parity.

Ray-layout note: the reference's ``ray_marcher`` reads z-march near/far from
ray columns 6:8 (network.py:945-947, the original MVSNeRF ray contract), but
the framework's datasets pack pixel (u, v) there
(lib/datasets/enerf_utils.py:55-69) — the shipped integration marches depth
between pixel coordinates. These tests feed the reference rays with the
scene near/far in columns 6:8 so its math is the well-defined MVSNeRF
semantics, which is what our implementation (z from the selected views'
depth_ranges, models/mvsnerf.py render_volume) computes directly. The
columns are read nowhere else on the mvsnerf path (render uses :3 and 3:6).
"""

import json
import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from boostmvsnerfs_tpu.models.boost_enerf import view_combinations
from boostmvsnerfs_tpu.models.boost_mvsnerf import BoostMVSNeRF
from boostmvsnerfs_tpu.models.mvsnerf import MVSNeRF, MVSNeRFConfig
from boostmvsnerfs_tpu.utils import port_weights as pw
from tests.helpers import make_batch
from tests.ref_loader import (
    _full_raster_rays,
    load_reference_boost_mvsnerf,
    load_reference_mvsnerf,
)

H, W = 64, 96  # feature res 16x24; padded volume (pad=24) 64x72, /8 clean
D = 16  # depth planes AND samples per ray (cost_reg downsamples D by 8)

CFG = MVSNeRFConfig(num_samples=D, eval_sampling="gather", k_best=2)


@pytest.fixture(scope="module")
def ref():
    return load_reference_mvsnerf()


@pytest.fixture(scope="module")
def ref_cfg(ref):
    """Pin the shared reference cfg singleton to mvsnerf semantics
    (configs/exps/pretrain/mvsnerf/dtu_pretrain.yaml collapses the cascade
    to one level at render_scale 1.0); restore afterwards so the ENeRF
    parity module keeps its view of the singleton."""
    cfg = ref.cfg
    saved = (
        list(cfg.enerf.cas_config.num_samples),
        list(cfg.enerf.cas_config.render_scale),
    )
    cfg.enerf.cas_config.num_samples[0] = D
    cfg.enerf.cas_config.render_scale[0] = 1.0
    # not present in the base enerf yaml (only the _ours configs add them);
    # the enerf parity module sets them the same way for its boost tests
    cfg.enerf.cost_volume_input_views = 3
    cfg.enerf.cas_config.k_best = 2
    yield cfg
    (
        cfg.enerf.cas_config.num_samples[:],
        cfg.enerf.cas_config.render_scale[:],
    ) = saved


def _mvs_batches(seed, S_all, near=1.2, far=6.0):
    """Same synthetic scene in both conventions: torch batch with all_src_*
    stacks, depth_ranges, and full-raster rays_0 carrying [near, far] in
    columns 6:8 (see module docstring); jax batch with ray_idx_0."""
    rng = np.random.default_rng(seed)
    base = make_batch(
        rng, B=1, S=S_all, H=H, W=W, levels=1, render_scales=(1.0,),
        full_image=True,
    )
    # depth_ranges identical across views: the reference marches z from the
    # ray columns (shared across the K volumes) while ours uses per-CV
    # near/far from the selected views; equal ranges make both well-defined
    # and identical, isolating the pipeline parity
    dr = np.tile(
        np.array([near / 0.8, far / 1.2], np.float32), (1, S_all, 1)
    )

    src_inps = np.asarray(base["src_inps"]).transpose(0, 1, 4, 2, 3)
    rays = np.stack(
        [
            _full_raster_rays(
                np.asarray(base["tar_ext"])[b],
                np.asarray(base["tar_ixt"])[b],
                H, W, 1.0,
            )
            for b in range(1)
        ]
    )
    rays[..., 6] = near
    rays[..., 7] = far
    tbatch = {
        "all_src_inps": torch.from_numpy(np.ascontiguousarray(src_inps)),
        "all_src_exts": torch.from_numpy(np.asarray(base["src_exts"])),
        "all_src_ixts": torch.from_numpy(np.asarray(base["src_ixts"])),
        "depth_ranges": torch.from_numpy(dr),
        "rays_0": torch.from_numpy(rays.astype(np.float32)),
        "meta": {"scene": ["synthetic"], "tar_view": torch.tensor([0])},
    }

    batch = {k: jnp.asarray(v) for k, v in base.items()}
    batch["all_src_inps"] = batch.pop("src_inps")
    batch["all_src_exts"] = batch.pop("src_exts")
    batch["all_src_ixts"] = batch.pop("src_ixts")
    batch["depth_ranges"] = jnp.asarray(dr)
    batch["ray_idx_0"] = jnp.arange(H * W, dtype=jnp.int32)[None]
    return tbatch, batch


def _psnr(got, want):
    mse = float(np.mean((np.asarray(got) - np.asarray(want)) ** 2))
    return 10 * np.log10(1.0 / max(mse, 1e-12))


import contextlib

pytestmark = pytest.mark.slow


@contextlib.contextmanager
def _deterministic_empty():
    """Reference ``build_volume_costvar_img`` allocates the cost volume with
    ``torch.empty`` but writes only the INTERIOR of the first 3 (ref-RGB)
    channels (network.py:901-903): the pad=24 border ring stays
    uninitialized heap garbage — NaNs included, depending on what was freed
    before (observed: the boost forward renders NaN in one process ordering
    and finite values in another, same seed). Pin empty -> zeros while the
    reference runs so it computes the deterministic zero-border semantics
    our build_volume implements explicitly."""
    orig = torch.empty
    torch.empty = lambda *a, **k: torch.zeros(*a, **k)
    try:
        yield
    finally:
        torch.empty = orig


def test_mvsnerf_end_to_end_parity(ref, ref_cfg):
    """Full single-cost-volume forward (reference network.py:1092-1126):
    FPN features -> padded 9+32ch variance volume -> 3D U-Net -> NDC ray
    march -> Renderer_ours MLP -> raw2outputs, from ported seeded weights."""
    tbatch, batch = _mvs_batches(31, S_all=3)

    torch.manual_seed(0)
    net = ref.mvsnerf_network.Network()
    net.eval()
    with torch.no_grad(), _deterministic_empty():
        want = {k: v.numpy() for k, v in net(tbatch).items()}

    variables = pw.port_mvsnerf(net.state_dict())
    model = MVSNeRF(cfg=CFG)
    got = model.apply(
        {
            "params": variables["params"],
            "batch_stats": variables["batch_stats"],
        },
        batch,
        False,
    )

    g = np.asarray(got["rgb_level0"]).reshape(-1, 3)
    w = want["rgb_level0"].reshape(-1, 3)
    assert g.shape == w.shape
    psnr = _psnr(g, w)
    assert psnr > 45, f"mvsnerf rgb parity PSNR {psnr:.1f} dB"
    gd = np.asarray(got["depth_level0"]).reshape(-1)
    wd = want["depth_level0"].reshape(-1)
    assert np.median(np.abs(gd - wd)) < 1e-3


def test_boost_mvsnerf_fused_parity(ref_cfg):
    """Boost fused K-volume forward on the MVSNeRF backbone
    (lib/networks/boost_mvsnerf/network.py:160-211): per-combo padded cost
    volumes, viewport masks, normalized-mask blend through one
    transmittance integral."""
    ref = load_reference_boost_mvsnerf()
    cfg = ref.cfg
    S_all, K = 5, 2
    tbatch, batch = _mvs_batches(47, S_all=S_all)
    k_best = [0, 3]
    os.makedirs(cfg.result_dir, exist_ok=True)
    with open(os.path.join(cfg.result_dir, "view_selection.json"), "w") as f:
        json.dump({"synthetic_0": k_best}, f)

    torch.manual_seed(0)
    net = ref.boost_mvsnerf_network.Network()
    net.eval()
    with torch.no_grad(), _deterministic_empty():
        want = {k: v.numpy() for k, v in net(tbatch).items()}

    variables = pw.port_mvsnerf(net.state_dict())
    model = BoostMVSNeRF(cfg=CFG)
    batch["combos"] = jnp.asarray(view_combinations(S_all, 3))
    batch["k_best"] = jnp.asarray([k_best], jnp.int32)
    got = model.apply(
        {
            "params": variables["params"],
            "batch_stats": variables["batch_stats"],
        },
        batch,
        False,
    )

    g = np.asarray(got["rgb_level0"]).reshape(-1, 3)
    w = want["rgb_level0"].reshape(-1, 3)
    assert g.shape == w.shape
    psnr = _psnr(g, w)
    assert psnr > 45, f"boost mvsnerf rgb parity PSNR {psnr:.1f} dB"
    gd = np.asarray(got["depth_level0"]).reshape(-1)
    wd = want["depth_level0"].reshape(-1)
    assert np.median(np.abs(gd - wd)) < 1e-3
