"""Pallas TPU kernels for the gather-heavy hot paths."""

from boostmvsnerfs_tpu.ops.pallas.warp_variance import (  # noqa: F401
    fused_warp_variance,
)
