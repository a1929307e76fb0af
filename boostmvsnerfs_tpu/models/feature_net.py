"""FPN image feature extractor for the ENeRF backbone.

Re-design of reference lib/networks/enerf/feature_net.py:4-36 in channels-last
NHWC for XLA TPU convolutions: 3 encoder stages (8/16/32 ch at 1/1, 1/2, 1/4
resolution) with top-down lateral merges producing 32ch@1/4, 16ch@1/2, 8ch@1/1.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from boostmvsnerfs_tpu.models.blocks import ConvBnReLU
from boostmvsnerfs_tpu.ops.sampling import resize_bilinear


class FeatureNet(nn.Module):
    bn_axis_name: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> dict:
        """x: (N, H, W, 3) -> {'level_0': (N,H/4,W/4,32),
        'level_1': (N,H/2,W/2,16), 'level_2': (N,H,W,8)}.

        Level naming follows the cascade consumer (reference
        lib/networks/enerf/network.py:62-66): level_0 is the coarsest.
        """
        bn = self.bn_axis_name
        dt = self.dtype
        conv0 = ConvBnReLU(8, (3, 3), (1, 1), bn, dt)(x, train)
        conv0 = ConvBnReLU(8, (3, 3), (1, 1), bn, dt)(conv0, train)
        conv1 = ConvBnReLU(16, (5, 5), (2, 2), bn, dt)(conv0, train)
        conv1 = ConvBnReLU(16, (3, 3), (1, 1), bn, dt)(conv1, train)
        conv2 = ConvBnReLU(32, (5, 5), (2, 2), bn, dt)(conv1, train)
        conv2 = ConvBnReLU(32, (3, 3), (1, 1), bn, dt)(conv2, train)

        feat2 = nn.Conv(32, (1, 1), dtype=dt, name="toplayer")(conv2)  # 1/4
        lat1 = nn.Conv(32, (1, 1), dtype=dt, name="lat1")(conv1)
        lat0 = nn.Conv(32, (1, 1), dtype=dt, name="lat0")(conv0)

        h1, w1 = conv1.shape[-3], conv1.shape[-2]
        h0, w0 = conv0.shape[-3], conv0.shape[-2]
        feat1 = resize_bilinear(feat2, h1, w1) + lat1
        feat0 = resize_bilinear(feat1, h0, w0) + lat0
        feat1 = nn.Conv(16, (3, 3), padding="SAME", dtype=dt, name="smooth1")(feat1)
        feat0 = nn.Conv(8, (3, 3), padding="SAME", dtype=dt, name="smooth0")(feat0)
        f32 = lambda v: v.astype(jnp.float32)
        return {"level_0": f32(feat2), "level_1": f32(feat1), "level_2": f32(feat0)}


class ResidualConv(nn.Module):
    """Pre-activation residual block (reference
    lib/networks/enerf/res_unet.py:4-25): BN-ReLU-Conv-BN-ReLU-Conv plus a
    Conv-BN skip, optional stride-2 downsampling."""

    features: int
    stride: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt = self.dtype
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=dt, name=name,
        )
        s = (self.stride, self.stride)
        h = nn.relu(norm("bn_in")(x))
        h = nn.Conv(self.features, (3, 3), strides=s, padding=1,
                    dtype=dt, name="conv1")(h)
        h = nn.relu(norm("bn_mid")(h))
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=dt,
                    name="conv2")(h)
        skip = nn.Conv(self.features, (3, 3), strides=s, padding=1,
                       dtype=dt, name="conv_skip")(x)
        skip = norm("bn_skip")(skip)
        return h + skip


class ResUNet(nn.Module):
    """Residual U-Net feature extractor (reference
    lib/networks/enerf/res_unet.py:40-99, an unused alternative to the FPN):
    16/32/64 residual encoder + 128 bridge, one 2x transposed-conv decode
    step, 1x1 conv to a single 32ch map at 1/4 resolution. Returned under
    the same level-dict convention as FeatureNet so it can slot in as the
    level-0 extractor."""

    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> dict:
        dt = self.dtype
        h1 = nn.Conv(16, (3, 3), padding=1, dtype=dt, name="in_conv1")(x)
        h1 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, dtype=dt, name="in_bn")(h1)
        h1 = nn.Conv(16, (3, 3), padding=1, dtype=dt,
                     name="in_conv2")(nn.relu(h1))
        h1 = h1 + nn.Conv(16, (3, 3), padding=1, dtype=dt,
                          name="in_skip")(x)
        h2 = ResidualConv(32, 2, dt, name="res1")(h1, train)
        h3 = ResidualConv(64, 2, dt, name="res2")(h2, train)
        h4 = ResidualConv(128, 2, dt, name="bridge")(h3, train)
        up = nn.ConvTranspose(128, (2, 2), strides=(2, 2), dtype=dt,
                              name="up1")(h4)
        out = nn.Conv(32, (1, 1), dtype=dt, name="out_conv")(
            jnp.concatenate([up, h3], axis=-1)
        )
        return {"level_0": out.astype(jnp.float32)}
