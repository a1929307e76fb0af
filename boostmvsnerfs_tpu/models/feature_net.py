"""FPN image feature extractor for the ENeRF backbone.

Re-design of reference lib/networks/enerf/feature_net.py:4-36 in channels-last
NHWC for XLA TPU convolutions: 3 encoder stages (8/16/32 ch at 1/1, 1/2, 1/4
resolution) with top-down lateral merges producing 32ch@1/4, 16ch@1/2, 8ch@1/1.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from boostmvsnerfs_tpu.models.blocks import ConvBnReLU
from boostmvsnerfs_tpu.ops.sampling import resize_bilinear


class _ConvParams(nn.Module):
    """Parameter container with nn.Conv's exact variable names/shapes/init
    (so checkpoints port 1:1 whether the conv is applied directly or with
    an algebraically composed kernel)."""

    features: int
    in_features: int
    kernel_size: tuple = (3, 3)

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (*self.kernel_size, self.in_features, self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


def _conv2d_same(x, kernel, dtype=None):
    if dtype is not None:
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class FeatureNet(nn.Module):
    bn_axis_name: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> dict:
        """x: (N, H, W, 3) -> {'level_0': (N,H/4,W/4,32),
        'level_1': (N,H/2,W/2,16), 'level_2': (N,H,W,8)}.

        Level naming follows the cascade consumer (reference
        lib/networks/enerf/network.py:62-66): level_0 is the coarsest.

        The full-resolution merge is computed with the 1x1 lateral conv
        COMPOSED into the 3x3 smooth conv (conv3x3(Ws) after conv1x1(Wl)
        == one conv3x3 with kernel sum_m Wl[ci,m] Ws[ky,kx,m,co]), so the
        542MB full-res 32-channel lateral intermediate of the naive form
        is never materialized. Exact by conv linearity, including at the
        zero-padded borders: the lateral BIAS contributes through a
        1-channel ones-image conv whose border rows see fewer in-image
        taps, exactly as the unfused smooth conv would. Parameter tree is
        identical to the unfused form (same names/shapes/init).
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
        k_l0, b_l0 = _ConvParams(32, 8, (1, 1), name="lat0")()
        k_s0, b_s0 = _ConvParams(8, 32, (3, 3), name="smooth0")()

        h1, w1 = conv1.shape[-3], conv1.shape[-2]
        h0, w0 = conv0.shape[-3], conv0.shape[-2]
        # half-res merge stays materialized: it feeds BOTH smooth1 and the
        # full-res upsample, so composing lat1 away would save nothing
        feat1 = resize_bilinear(feat2, h1, w1) + lat1
        up0 = resize_bilinear(feat1, h0, w0)
        # smooth0(up0 + lat0(conv0)) as three SAME convs summed:
        composed0 = jnp.einsum("abim,xymo->xyio", k_l0, k_s0)  # (3,3,8,8)
        bias_k0 = jnp.einsum("m,xymo->xyo", b_l0, k_s0)[..., None, :]
        ones1 = jnp.ones((*up0.shape[:-1], 1), up0.dtype)
        feat0 = (
            _conv2d_same(up0, k_s0, dt)
            + _conv2d_same(conv0, composed0, dt)
            + _conv2d_same(ones1, bias_k0, dt)
            + b_s0
        )
        feat1 = nn.Conv(16, (3, 3), padding="SAME", dtype=dt, name="smooth1")(feat1)
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
