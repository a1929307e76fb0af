"""Pallas TPU kernels for the gather-heavy hot paths."""

import os

import jax

from boostmvsnerfs_tpu.ops.pallas.img_sample import (  # noqa: F401
    fused_row_sample,
    fused_row_sample_diff,
)
from boostmvsnerfs_tpu.ops.pallas.warp_variance import (  # noqa: F401
    fused_warp_variance,
    fused_warp_variance_diff,
    warp_variance_bwd_fits,
    warp_variance_fits,
)


def _on_tpu() -> bool:
    """TPU-variant platform names (e.g. remote tunnels) are accepted by
    substring so a v5e behind a proxy still takes the native kernels."""
    try:
        plat = (jax.devices()[0].platform or "").lower()
    except Exception:
        return False
    return "tpu" in plat or jax.default_backend() == "tpu"


def pallas_supported() -> bool:
    """Whether model paths should take the Pallas kernels at all.

    Production paths must NOT fall into Pallas interpret mode on non-TPU
    backends (orders of magnitude slower than the XLA windowed fallback) —
    they route to the windowed path instead. Tests force the interpret-mode
    kernels on CPU with BOOST_PALLAS_FORCE=1 to keep the model-integrated
    kernel path covered.
    """
    return _on_tpu() or os.environ.get("BOOST_PALLAS_FORCE") == "1"


def pallas_interpret() -> bool:
    """interpret flag for kernel calls: only True when a non-TPU backend was
    forced into the Pallas path (tests)."""
    return not _on_tpu()
