"""Image quality metrics in pure jnp (the reference relies on skimage:
lib/evaluators/enerf.py:6-7).

SSIM follows skimage's ``structural_similarity`` defaults: 7x7 uniform
window, K1=0.01, K2=0.03, sample covariance normalization (N/(N-1)),
per-channel evaluation averaged for multichannel inputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def psnr(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0):
    mse = jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(data_range**2 / mse)


def masked_psnr(pred, target, mask, data_range: float = 1.0):
    """PSNR over masked pixels only (reference lib/evaluators/enerf.py:67-71
    evaluates with out-of-mask pixels excluded)."""
    mask = mask.astype(jnp.float32)
    if mask.ndim == pred.ndim - 1:
        mask = mask[..., None]
    diff2 = (pred - target) ** 2 * mask
    denom = jnp.maximum(jnp.sum(jnp.broadcast_to(mask, pred.shape)), 1.0)
    mse = jnp.sum(diff2) / denom
    return 10.0 * jnp.log10(data_range**2 / mse)


def _uniform_filter(img: jnp.ndarray, size: int) -> jnp.ndarray:
    """Mean filter with 'reflect'-free valid windowing matched to skimage's
    crop behavior: computed with a valid convolution (output H-size+1)."""
    kernel = jnp.ones((size, size, 1, 1), img.dtype) / (size * size)
    x = img[None, ..., None]
    out = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out[0, ..., 0]


def ssim_single(
    a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0, win_size: int = 7
) -> jnp.ndarray:
    """SSIM of one channel (H, W), matching skimage defaults."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    n = win_size * win_size
    cov_norm = n / (n - 1)
    ux = _uniform_filter(a, win_size)
    uy = _uniform_filter(b, win_size)
    uxx = _uniform_filter(a * a, win_size)
    uyy = _uniform_filter(b * b, win_size)
    uxy = _uniform_filter(a * b, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    A1 = 2 * ux * uy + C1
    A2 = 2 * vxy + C2
    B1 = ux**2 + uy**2 + C1
    B2 = vx + vy + C2
    S = (A1 * A2) / (B1 * B2)
    return jnp.mean(S)


def ssim(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0):
    """Multichannel SSIM: per-channel mean (skimage multichannel=True)."""
    if pred.ndim == 2:
        return ssim_single(pred, target, data_range)
    vals = [
        ssim_single(pred[..., c], target[..., c], data_range)
        for c in range(pred.shape[-1])
    ]
    return jnp.mean(jnp.stack(vals))


def depth_metrics(pred: np.ndarray, gt: np.ndarray) -> dict:
    """DTU depth metrics (reference lib/evaluators/enerf.py:96-103):
    mean absolute error + accuracy at 2mm / 10mm over valid (gt != 0)."""
    mask = gt != 0.0
    err = np.abs(pred[mask] - gt[mask])
    return {
        "abs": float(err.mean()),
        "acc_2": float((err < 2.0).mean()),
        "acc_10": float((err < 10.0).mean()),
    }
