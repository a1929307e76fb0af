"""3D U-Nets regularizing plane-sweep cost volumes (NDHWC layout).

Re-design of reference lib/networks/enerf/cost_reg_net.py: ``CostRegNet``
(3 down / 3 up, used at fine cascade levels) and ``MinCostRegNet`` (2 down /
2 up, used at the coarse level, reference lib/networks/enerf/network.py:16-19).
Each returns an 8-channel neural feature volume and per-voxel depth logits.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from boostmvsnerfs_tpu.models.blocks import ConvBnReLU, DeconvBn


def _interp_up(feats, k, bn, dt):
    """Trilinear-resize + conv upsampling stage of the older CostRegNet
    (reference lib/networks/enerf/cost_reg_net_.py:62-85: align-corners
    trilinear interpolate followed by a plain ConvBnReLU3D, instead of the
    transposed conv of the current net)."""

    def up(x, train):
        from boostmvsnerfs_tpu.ops.sampling import resize_trilinear

        B, D, H, W, _ = x.shape
        x = resize_trilinear(x, 2 * D, 2 * H, 2 * W)
        return ConvBnReLU(feats, k, (1, 1, 1), bn, dt)(x, train)

    return up


class CostRegNet(nn.Module):
    bn_axis_name: str | None = None
    dtype: jnp.dtype | None = None
    # True = upsample by align-corners trilinear resize + conv (the older
    # reference variant cost_reg_net_.py) instead of transposed convs
    interp_upsample: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        """x: (B, D, H, W, C) -> (feat (B,D,H,W,8), depth logits (B,D,H,W))."""
        bn = self.bn_axis_name
        dt = self.dtype
        k, s2 = (3, 3, 3), (2, 2, 2)
        conv0 = ConvBnReLU(8, k, (1, 1, 1), bn, dt)(x, train)
        conv2 = ConvBnReLU(16, k, s2, bn, dt)(conv0, train)
        conv2 = ConvBnReLU(16, k, (1, 1, 1), bn, dt)(conv2, train)
        conv4 = ConvBnReLU(32, k, s2, bn, dt)(conv2, train)
        conv4 = ConvBnReLU(32, k, (1, 1, 1), bn, dt)(conv4, train)
        deep = ConvBnReLU(64, k, s2, bn, dt)(conv4, train)
        deep = ConvBnReLU(64, k, (1, 1, 1), bn, dt)(deep, train)
        if self.interp_upsample:
            up = conv4 + DeconvBn(32, k, bn, dt)(deep, train)
            up = conv2 + _interp_up(16, k, bn, dt)(up, train)
            up = conv0 + _interp_up(8, k, bn, dt)(up, train)
            feat = nn.Conv(8, k, padding="SAME", use_bias=False, dtype=dt,
                           name="feat_conv")(up)
            depth = nn.Conv(1, k, padding="SAME", use_bias=False, dtype=dt,
                            name="depth_conv")(up)
            return (feat.astype(jnp.float32),
                    depth[..., 0].astype(jnp.float32))
        up = conv4 + DeconvBn(32, k, bn, dt)(deep, train)
        up = conv2 + DeconvBn(16, k, bn, dt)(up, train)
        up = conv0 + DeconvBn(8, k, bn, dt)(up, train)
        feat = nn.Conv(8, k, padding="SAME", use_bias=False, dtype=dt, name="feat_conv")(up)
        depth = nn.Conv(1, k, padding="SAME", use_bias=False, dtype=dt, name="depth_conv")(up)
        return feat.astype(jnp.float32), depth[..., 0].astype(jnp.float32)


class MinCostRegNet(nn.Module):
    bn_axis_name: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        """2-level variant for the coarse cascade level
        (reference lib/networks/enerf/cost_reg_net.py:51-86)."""
        bn = self.bn_axis_name
        dt = self.dtype
        k, s2 = (3, 3, 3), (2, 2, 2)
        conv0 = ConvBnReLU(8, k, (1, 1, 1), bn, dt)(x, train)
        conv2 = ConvBnReLU(16, k, s2, bn, dt)(conv0, train)
        conv2 = ConvBnReLU(16, k, (1, 1, 1), bn, dt)(conv2, train)
        conv4 = ConvBnReLU(32, k, s2, bn, dt)(conv2, train)
        conv4 = ConvBnReLU(32, k, (1, 1, 1), bn, dt)(conv4, train)
        up = conv2 + DeconvBn(16, k, bn, dt)(conv4, train)
        up = conv0 + DeconvBn(8, k, bn, dt)(up, train)
        feat = nn.Conv(8, k, padding="SAME", use_bias=False, dtype=dt, name="feat_conv")(up)
        depth = nn.Conv(1, k, padding="SAME", use_bias=False, dtype=dt, name="depth_conv")(up)
        return feat.astype(jnp.float32), depth[..., 0].astype(jnp.float32)
