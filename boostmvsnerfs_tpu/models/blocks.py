"""Shared conv building blocks (channels-last, XLA TPU layouts).

Equivalents of reference lib/networks/enerf/utils.py:10-33 (ConvBnReLU /
ConvBnReLU3D). BatchNorm supports an optional ``axis_name`` so batch
statistics sync across a mesh axis inside shard_map — the TPU-native
replacement for torch SyncBatchNorm (reference lib/train/trainers/trainer.py:16).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class ConvBnReLU(nn.Module):
    """Conv(bias-free) + BatchNorm + ReLU, for 2D or 3D (rank of kernel_size).

    ``dtype`` is the computation dtype (bfloat16 = the TPU AMP equivalent of
    the reference's autocast trainer, lib/train/trainers/trainer_amp.py);
    parameters and BN statistics stay float32.
    """

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    bn_axis_name: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # explicit symmetric k//2 padding: torch Conv semantics (flax 'SAME'
        # pads asymmetrically for stride 2, shifting taps by one pixel)
        pad = tuple((k // 2, k // 2) for k in self.kernel_size)
        x = nn.Conv(
            self.features,
            kernel_size=tuple(self.kernel_size),
            strides=tuple(self.strides),
            padding=pad,
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            axis_name=self.bn_axis_name if train else None,
            dtype=self.dtype,
        )(x)
        return nn.relu(x)


class DeconvBn(nn.Module):
    """ConvTranspose(stride 2, bias-free) + BatchNorm — exact 2x upsampling,
    the TPU layout equivalent of torch ConvTranspose3d(k3, s2, p1, op1)
    (reference lib/networks/enerf/cost_reg_net.py:18-31)."""

    features: int
    kernel_size: Sequence[int] = (3, 3, 3)
    bn_axis_name: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        ndim = len(self.kernel_size)
        # padding (1, 2) + transpose_kernel matches torch
        # ConvTranspose(k=3, s=2, p=1, output_padding=1) exactly (verified
        # numerically in tests/test_weight_port.py)
        x = nn.ConvTranspose(
            self.features,
            kernel_size=tuple(self.kernel_size),
            strides=(2,) * ndim,
            padding=((1, 2),) * ndim,
            transpose_kernel=True,
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            axis_name=self.bn_axis_name if train else None,
            dtype=self.dtype,
        )(x)
        return x


class MLP(nn.Module):
    """Dense stack with ReLU between layers and configurable final activation."""

    features: Sequence[int]
    final_act: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, f in enumerate(self.features):
            x = nn.Dense(f, kernel_init=nn.initializers.kaiming_normal())(x)
            if i < len(self.features) - 1:
                x = nn.relu(x)
        if self.final_act == "relu":
            x = nn.relu(x)
        elif self.final_act == "softplus":
            x = nn.softplus(x)
        elif self.final_act == "sigmoid":
            x = nn.sigmoid(x)
        return x
