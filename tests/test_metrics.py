"""Metric tests against independent numpy oracles (skimage semantics)."""

import jax.numpy as jnp
import numpy as np

from boostmvsnerfs_tpu.eval import metrics
from boostmvsnerfs_tpu.eval.evaluator import Evaluator
from boostmvsnerfs_tpu.models.enerf import CascadeConfig


def _np_ssim_single(a, b, data_range=1.0, win=7):
    """Direct skimage-style SSIM oracle: valid-window uniform filter."""
    from numpy.lib.stride_tricks import sliding_window_view

    def f(x):
        return sliding_window_view(x, (win, win)).mean(axis=(-1, -2))

    n = win * win
    cov_norm = n / (n - 1)
    ux, uy = f(a), f(b)
    vx = cov_norm * (f(a * a) - ux**2)
    vy = cov_norm * (f(b * b) - uy**2)
    vxy = cov_norm * (f(a * b) - ux * uy)
    C1, C2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / ((ux**2 + uy**2 + C1) * (vx + vy + C2))
    return S.mean()


def test_psnr_known_value():
    a = np.zeros((8, 8, 3), np.float32)
    b = np.full((8, 8, 3), 0.1, np.float32)
    # mse = 0.01 -> psnr = 20
    np.testing.assert_allclose(float(metrics.psnr(jnp.asarray(a), jnp.asarray(b))),
                               20.0, rtol=1e-5)


def test_masked_psnr_ignores_masked_out(rng):
    a = rng.uniform(0, 1, (10, 10, 3)).astype(np.float32)
    b = a.copy()
    b[:5] += 100.0  # corrupt top half
    mask = np.zeros((10, 10), np.float32)
    mask[5:] = 1.0
    v = float(metrics.masked_psnr(jnp.asarray(a), jnp.asarray(b), jnp.asarray(mask)))
    assert v > 60.0  # identical in the valid region


def test_ssim_identical_is_one(rng):
    a = rng.uniform(0, 1, (16, 20)).astype(np.float32)
    np.testing.assert_allclose(
        float(metrics.ssim_single(jnp.asarray(a), jnp.asarray(a))), 1.0, atol=1e-5
    )


def test_ssim_matches_numpy_oracle(rng):
    a = rng.uniform(0, 1, (24, 30)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    want = _np_ssim_single(a.astype(np.float64), b.astype(np.float64))
    got = float(metrics.ssim_single(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_ssim_multichannel(rng):
    a = rng.uniform(0, 1, (16, 18, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
    per = [
        float(metrics.ssim_single(jnp.asarray(a[..., c]), jnp.asarray(b[..., c])))
        for c in range(3)
    ]
    np.testing.assert_allclose(
        float(metrics.ssim(jnp.asarray(a), jnp.asarray(b))), np.mean(per), rtol=1e-6
    )


def test_depth_metrics():
    gt = np.array([[10.0, 0.0], [20.0, 30.0]])
    pred = np.array([[11.0, 99.0], [20.5, 45.0]])
    d = metrics.depth_metrics(pred, gt)
    np.testing.assert_allclose(d["abs"], (1.0 + 0.5 + 15.0) / 3)
    np.testing.assert_allclose(d["acc_2"], 2 / 3)
    np.testing.assert_allclose(d["acc_10"], 2 / 3)


def test_evaluator_aggregates(rng):
    cas = CascadeConfig(volume_planes=(16, 8))
    ev = Evaluator(cas)
    h, w = 16, 24
    meta = {"scene": "grass", "tar_view": 0, "frame_id": 0,
            "h_0": h // 4, "w_0": w // 4, "h_1": h, "w_1": w}
    gt1 = rng.uniform(0, 1, (1, h * w, 3)).astype(np.float32)
    gt0 = rng.uniform(0, 1, (1, (h // 4) * (w // 4), 3)).astype(np.float32)
    output = {"rgb_level0": gt0 + 0.01, "rgb_level1": gt1 + 0.01}
    batch = {
        "meta": [meta],
        "rgb_0": gt0,
        "rgb_1": gt1,
        "msk_0": np.ones((1, (h // 4) * (w // 4))),
        "msk_1": np.ones((1, h * w)),
    }
    ev.evaluate(output, batch)
    ev.evaluate(output, batch)
    assert len(ev.psnrs) == 2
    res = ev.summarize()
    assert 35.0 < res["psnr"] < 45.0  # mse 1e-4 -> 40 dB
    assert len(ev.psnrs) == 0  # reset after summarize
