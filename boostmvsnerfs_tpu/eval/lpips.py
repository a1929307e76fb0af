"""LPIPS perceptual distance (VGG variant).

Same computation as the lpips package used by the reference evaluator
(lib/evaluators/enerf.py:25, net='vgg'): imagenet-style input scaling,
VGG16 relu1_2..relu5_3 activations, channel-wise unit normalization,
squared differences projected through per-layer 1x1 linear heads, spatially
averaged and summed over layers. Linear-head weights load from an .npz
produced by ``convert_lpips_weights`` (needs the lpips package offline).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from boostmvsnerfs_tpu.eval.vgg import VGG16Features

# lpips 'vgg' scaling layer constants (lpips/lpips.py ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _unit_normalize(x: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS:
    """Callable LPIPS distance. Inputs in [-1, 1], shape (B, H, W, 3)."""

    def __init__(self, vgg_variables, lin_weights: list[np.ndarray]):
        self.vgg = VGG16Features()
        self.vgg_variables = vgg_variables
        # each (C_l,) non-negative 1x1 conv weight
        self.lin_weights = [jnp.asarray(w.reshape(-1)) for w in lin_weights]

    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        a = (a - _SHIFT) / _SCALE
        b = (b - _SHIFT) / _SCALE
        fa = self.vgg.apply(self.vgg_variables, a)
        fb = self.vgg.apply(self.vgg_variables, b)
        total = 0.0
        for xa, xb, w in zip(fa, fb, self.lin_weights):
            d = (_unit_normalize(xa) - _unit_normalize(xb)) ** 2
            total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(-1, -2))
        return total


def fixture_lpips(seed: int = 0) -> LPIPS:
    """LPIPS with deterministic stand-in weights.

    This container has no network egress, so the official torchvision VGG16
    / lpips linear-head weights cannot be fetched; the fixture makes the
    full LPIPS pipeline runnable and regression-testable out of the box.
    Values are NOT comparable to published LPIPS numbers — the evaluator
    reports them as ``lpips_uncalibrated``. Supply converted weights via
    ``cfg.lpips_weights`` (see convert_lpips_weights) for calibrated values.
    """
    import jax

    vgg = VGG16Features()
    dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
    vgg_vars = vgg.init(jax.random.PRNGKey(seed), dummy)
    rng = np.random.default_rng(seed)
    chans = (64, 128, 256, 512, 512)
    # non-negative heads, scaled so per-layer terms are O(1) like the
    # trained lpips heads
    lins = [rng.uniform(0.0, 2.0 / c, (c,)).astype(np.float32) for c in chans]
    return LPIPS(vgg_vars, lins)


def load_lpips(vgg_npz: str, lin_npz: str) -> LPIPS:
    from boostmvsnerfs_tpu.eval.vgg import load_vgg_params

    vgg_vars = load_vgg_params(vgg_npz)
    data = np.load(lin_npz)
    lins = [data[f"lin{i}"] for i in range(5)]
    return LPIPS(vgg_vars, lins)


def convert_lpips_weights(out_path: str):  # pragma: no cover
    """One-shot converter from the lpips package's pretrained vgg heads."""
    import lpips as lpips_pkg

    net = lpips_pkg.LPIPS(net="vgg")
    arrays = {}
    for i, lin in enumerate(net.lins):
        arrays[f"lin{i}"] = lin.model[-1].weight.detach().numpy().reshape(-1)
    np.savez(out_path, **arrays)
