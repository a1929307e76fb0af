"""Port reference PyTorch checkpoints into this framework's parameter trees.

The reference releases DTU-pretrained ``.pth`` checkpoints (README.md:47-56);
loading them directly is how the TPU build matches reference PSNR without
retraining (SURVEY.md §7 step 3). Conversions:

* Conv2d  (O,I,kh,kw)        -> (kh,kw,I,O)
* Conv3d  (O,I,kd,kh,kw)     -> (kd,kh,kw,I,O)
* ConvTranspose3d (I,O,k..)  -> (k..,O,I) for flax transpose_kernel=True
  with padding ((1,2),)*n — verified exact vs torch in tests
* Linear  (O,I)              -> (I,O)
* BatchNorm weight/bias      -> scale/bias (params);
  running_mean/var           -> mean/var (batch_stats)

All layer-name maps follow the reference module structure
(lib/networks/enerf/{feature_net,cost_reg_net,nerf}.py).
"""

from __future__ import annotations

import numpy as np


def _conv(w):  # torch conv -> flax kernel
    w = np.asarray(w)
    if w.ndim == 4:
        return w.transpose(2, 3, 1, 0)
    if w.ndim == 5:
        return w.transpose(2, 3, 4, 1, 0)
    raise ValueError(w.shape)


def _deconv(w):  # torch ConvTranspose -> flax transpose_kernel=True kernel
    w = np.asarray(w)
    if w.ndim == 5:  # (I, O, kd, kh, kw) -> (kd, kh, kw, O, I)
        return w.transpose(2, 3, 4, 1, 0)
    raise ValueError(w.shape)


def _linear(w):
    return np.asarray(w).transpose(1, 0)


def _set(tree: dict, path: list[str], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value)


def _cbr(sd, prefix: str, params: dict, stats: dict, path: list[str]):
    """ConvBnReLU (torch .conv/.bn) -> flax ConvBnReLU {Conv_0, BatchNorm_0}."""
    _set(params, path + ["Conv_0", "kernel"], _conv(sd[f"{prefix}.conv.weight"]))
    _set(params, path + ["BatchNorm_0", "scale"], sd[f"{prefix}.bn.weight"])
    _set(params, path + ["BatchNorm_0", "bias"], sd[f"{prefix}.bn.bias"])
    _set(stats, path + ["BatchNorm_0", "mean"], sd[f"{prefix}.bn.running_mean"])
    _set(stats, path + ["BatchNorm_0", "var"], sd[f"{prefix}.bn.running_var"])


def _deconv_bn(sd, prefix: str, params: dict, stats: dict, path: list[str]):
    """torch Sequential(ConvTranspose3d, BN) -> flax DeconvBn."""
    _set(params, path + ["ConvTranspose_0", "kernel"], _deconv(sd[f"{prefix}.0.weight"]))
    _set(params, path + ["BatchNorm_0", "scale"], sd[f"{prefix}.1.weight"])
    _set(params, path + ["BatchNorm_0", "bias"], sd[f"{prefix}.1.bias"])
    _set(stats, path + ["BatchNorm_0", "mean"], sd[f"{prefix}.1.running_mean"])
    _set(stats, path + ["BatchNorm_0", "var"], sd[f"{prefix}.1.running_var"])


def _plain_conv(sd, prefix: str, params: dict, path: list[str], bias=True):
    _set(params, path + ["kernel"], _conv(sd[f"{prefix}.weight"]))
    if bias and f"{prefix}.bias" in sd:
        _set(params, path + ["bias"], sd[f"{prefix}.bias"])


def _dense(sd, prefix: str, params: dict, path: list[str]):
    _set(params, path + ["kernel"], _linear(sd[f"{prefix}.weight"]))
    if f"{prefix}.bias" in sd:
        _set(params, path + ["bias"], sd[f"{prefix}.bias"])


def port_feature_net(sd, params, stats, base="feature_net"):
    """Reference lib/networks/enerf/feature_net.py:4-36."""
    torch_cbrs = [
        "conv0.0", "conv0.1", "conv1.0", "conv1.1", "conv2.0", "conv2.1",
    ]
    for i, t in enumerate(torch_cbrs):
        _cbr(sd, f"{base}.{t}", params, stats, [base, f"ConvBnReLU_{i}"])
    for name in ["toplayer", "lat1", "lat0", "smooth1", "smooth0"]:
        _plain_conv(sd, f"{base}.{name}", params, [base, name])


def port_cost_reg(sd, params, stats, base: str, flax_name: str, minimal: bool):
    """CostRegNet / MinCostRegNet (reference lib/networks/enerf/cost_reg_net.py)."""
    if minimal:
        cbrs = ["conv0", "conv1", "conv2", "conv3", "conv4"]
        deconvs = ["conv9", "conv11"]
    else:
        cbrs = ["conv0", "conv1", "conv2", "conv3", "conv4", "conv5", "conv6"]
        deconvs = ["conv7", "conv9", "conv11"]
    for i, t in enumerate(cbrs):
        _cbr(sd, f"{base}.{t}", params, stats, [flax_name, f"ConvBnReLU_{i}"])
    for i, t in enumerate(deconvs):
        _deconv_bn(sd, f"{base}.{t}", params, stats, [flax_name, f"DeconvBn_{i}"])
    _plain_conv(sd, f"{base}.feat_conv.0", params, [flax_name, "feat_conv"],
                bias=False)
    _plain_conv(sd, f"{base}.depth_conv.0", params, [flax_name, "depth_conv"],
                bias=False)


def port_nerf_head(sd, params, base: str, flax_name: str, viewdir_agg=True):
    """NeRF + Agg heads (reference lib/networks/enerf/nerf.py:6-89)."""
    if viewdir_agg:
        _dense(sd, f"{base}.agg.view_fc.0", params, [flax_name, "agg", "view_fc"])
    _dense(sd, f"{base}.agg.global_fc.0", params, [flax_name, "agg", "global_fc"])
    _dense(sd, f"{base}.agg.agg_w_fc.0", params, [flax_name, "agg", "agg_w_fc"])
    _dense(sd, f"{base}.agg.fc.0", params, [flax_name, "agg", "fc"])
    _dense(sd, f"{base}.lr0.0", params, [flax_name, "lr0"])
    _dense(sd, f"{base}.sigma.0", params, [flax_name, "sigma"])
    _dense(sd, f"{base}.color.0", params, [flax_name, "color0"])
    _dense(sd, f"{base}.color.2", params, [flax_name, "color1"])


def port_enerf(state_dict: dict, num_levels: int = 2, viewdir_agg=True) -> dict:
    """Full reference ENeRF checkpoint -> {'params', 'batch_stats'}.

    Accepts the raw ``net`` state dict of reference checkpoints
    (train_net.py saves {'net': network.state_dict(), ...}).
    """
    sd = {
        k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
        for k, v in state_dict.items()
    }
    params: dict = {}
    stats: dict = {}
    port_feature_net(sd, params, stats)
    for i in range(num_levels):
        port_cost_reg(
            sd, params, stats, f"cost_reg_{i}", f"cost_regs_{i}", minimal=(i == 0)
        )
        port_nerf_head(sd, params, f"nerf_{i}", f"nerf_heads_{i}", viewdir_agg)
    return {"params": params, "batch_stats": stats}


def _cbl(sd, prefix: str, params: dict, stats: dict, path: list[str]):
    """torch Conv+InPlaceABN block -> flax ConvBnLeaky {Conv_0, BatchNorm_0}.
    InPlaceABN stores BN-shaped weight/bias/running stats; its default
    leaky_relu(0.01) activation is applied by our module after the BN."""
    _set(params, path + ["Conv_0", "kernel"], _conv(sd[f"{prefix}.conv.weight"]))
    _set(params, path + ["BatchNorm_0", "scale"], sd[f"{prefix}.bn.weight"])
    _set(params, path + ["BatchNorm_0", "bias"], sd[f"{prefix}.bn.bias"])
    _set(stats, path + ["BatchNorm_0", "mean"], sd[f"{prefix}.bn.running_mean"])
    _set(stats, path + ["BatchNorm_0", "var"], sd[f"{prefix}.bn.running_var"])


def _deconv_bnl(sd, prefix: str, params: dict, stats: dict, path: list[str]):
    _set(params, path + ["ConvTranspose_0", "kernel"],
         _deconv(sd[f"{prefix}.0.weight"]))
    _set(params, path + ["BatchNorm_0", "scale"], sd[f"{prefix}.1.weight"])
    _set(params, path + ["BatchNorm_0", "bias"], sd[f"{prefix}.1.bias"])
    _set(stats, path + ["BatchNorm_0", "mean"], sd[f"{prefix}.1.running_mean"])
    _set(stats, path + ["BatchNorm_0", "var"], sd[f"{prefix}.1.running_var"])


def port_mvsnerf(state_dict: dict, mlp_depth: int = 6) -> dict:
    """Reference MVSNeRF checkpoint -> {'params', 'batch_stats'}.

    Layer names follow reference lib/networks/mvsnerf/network.py: ``feature``
    (FPN trunk, :695-732), ``cost_reg_2`` (3D U-Net, :735-779), ``nerf.nerf``
    (Renderer_ours, :152-229).
    """
    sd = {
        k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
        for k, v in state_dict.items()
    }
    params: dict = {}
    stats: dict = {}
    # feature trunk: conv0 (2 blocks), conv1 (3), conv2 (3), toplayer
    if "feature.toplayer.weight" in sd:
        torch_blocks = [
            "conv0.0", "conv0.1",
            "conv1.0", "conv1.1", "conv1.2",
            "conv2.0", "conv2.1", "conv2.2",
        ]
        for i, t in enumerate(torch_blocks):
            _cbl(sd, f"feature.{t}", params, stats,
                 ["feature", f"ConvBnLeaky_{i}"])
        _plain_conv(sd, "feature.toplayer", params, ["feature", "toplayer"])

    # cost regularizer
    if "cost_reg_2.conv0.conv.weight" in sd:
        for i, t in enumerate(
            ["conv0", "conv1", "conv2", "conv3", "conv4", "conv5", "conv6"]
        ):
            _cbl(sd, f"cost_reg_2.{t}", params, stats,
                 ["cost_reg", f"ConvBnLeaky_{i}"])
        for i, t in enumerate(["conv7", "conv9", "conv11"]):
            _deconv_bnl(sd, f"cost_reg_2.{t}", params, stats,
                        ["cost_reg", f"DeconvBnLeaky_{i}"])

    # renderer MLP
    base = "nerf.nerf"
    if f"{base}.pts_bias.weight" in sd:
        for i in range(mlp_depth):
            _dense(sd, f"{base}.pts_linears.{i}", params,
                   ["renderer", f"pts_{i}"])
        _dense(sd, f"{base}.pts_bias", params, ["renderer", "pts_bias"])
        _dense(sd, f"{base}.alpha_linear", params, ["renderer", "alpha"])
        _dense(sd, f"{base}.feature_linear", params, ["renderer", "feature"])
        _dense(sd, f"{base}.views_linears.0", params, ["renderer", "views_0"])
        _dense(sd, f"{base}.rgb_linear", params, ["renderer", "rgb"])
    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference .pth (CPU); returns the network state dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "net" in ckpt:
        ckpt = ckpt["net"]
    return {k: v.detach().cpu().numpy() for k, v in ckpt.items()}
