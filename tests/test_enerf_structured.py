"""Full-model equivalence: structured (gather-free) eval sampling vs the
gather path, and windowed vs gather warp."""

import dataclasses

import jax
import numpy as np
import jax.numpy as jnp

from boostmvsnerfs_tpu.models.enerf import CascadeConfig, ENeRF
from tests.helpers import make_batch
import pytest

pytestmark = pytest.mark.slow

BASE = CascadeConfig(
    volume_planes=(16, 8), num_samples=(8, 2),
    warp_mode="gather", eval_sampling="gather", warp_dtype="float32",
)


def test_structured_eval_matches_gather():
    rng = np.random.default_rng(21)
    batch = {k: jnp.asarray(v) for k, v in make_batch(rng, full_image=True).items()}

    model_ref = ENeRF(cas=BASE)
    variables = model_ref.init(jax.random.PRNGKey(0), batch, False)
    want = model_ref.apply(variables, batch, False)

    fast_cas = dataclasses.replace(
        BASE, warp_mode="windowed", eval_sampling="structured"
    )
    model_fast = ENeRF(cas=fast_cas)
    got = model_fast.apply(variables, batch, False)

    np.testing.assert_allclose(
        np.asarray(got["depth_mvs_level0"]),
        np.asarray(want["depth_mvs_level0"]),
        rtol=1e-3, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got["rgb_level1"]), np.asarray(want["rgb_level1"]),
        rtol=1e-3, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(got["rgb_level0"]), np.asarray(want["rgb_level0"]),
        rtol=1e-3, atol=2e-3,
    )


def _train_grads(cas, variables, batch):
    model = ENeRF(cas=cas)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, True, mutable=["batch_stats"],
        )
        loss = 0.0
        for i in (0, 1):
            loss = loss + jnp.mean(
                (out[f"rgb_level{i}"] - batch[f"rgb_{i}"]) ** 2
            )
        return loss

    return jax.grad(loss_fn)(variables["params"])


def _assert_grads_close(got, want, atol=3e-5, tail_atol=None):
    """Per-leaf gradient comparison, relative to the leaf's max magnitude.

    ``tail_atol`` permits a <=1% tail of elements between atol and tail_atol:
    the 2-level cascade feeds level-0 outputs into level-1's depth
    hypotheses, so f32 summation-order noise shifts the linearization point
    and a few gradient elements genuinely differ beyond roundoff (a
    single-level comparison matches to ~1e-4; wrong VJP math is O(1))."""
    flat_w, _ = jax.tree_util.tree_flatten_with_path(want)
    flat_g = jax.tree_util.tree_leaves(got)
    for (path, w), g in zip(flat_w, flat_g):
        w, g = np.asarray(w), np.asarray(g)
        err = np.abs(g - w) / (np.abs(w).max() + 1e-6)
        name = jax.tree_util.keystr(path)
        if tail_atol is None:
            assert err.max() < atol, f"{name}: max err {err.max():.2e}"
        else:
            assert err.max() < tail_atol, f"{name}: max err {err.max():.2e}"
            n_out = int((err >= atol).sum())
            assert n_out <= max(1, int(0.01 * err.size)), (
                f"{name}: {n_out}/{err.size} elements > {atol}"
            )


def test_pallas_warp_training_grads_match_windowed(monkeypatch):
    """Training through the fused warp-variance custom VJP (Pallas forward
    AND backward) must produce the same parameter gradients as the XLA
    windowed path."""
    monkeypatch.setenv("BOOST_PALLAS_FORCE", "1")
    rng = np.random.default_rng(23)
    batch = {
        k: jnp.asarray(v)
        for k, v in make_batch(rng, full_image=False, num_rays=(48, 96)).items()
    }
    ref_cas = dataclasses.replace(BASE, warp_mode="windowed")
    model_ref = ENeRF(cas=ref_cas)
    variables = model_ref.init(jax.random.PRNGKey(0), batch, False)

    want = _train_grads(ref_cas, variables, batch)
    got = _train_grads(dataclasses.replace(BASE, warp_mode="pallas"),
                       variables, batch)
    _assert_grads_close(got, want, atol=2e-3, tail_atol=2e-2)


def test_structured_training_grads_match_gather():
    """Full-image training (the fine-tune regime) through the structured
    windowed sampling path must produce the same gradients as the gather
    path — enabling it under train is a pure-speed change."""
    rng = np.random.default_rng(24)
    batch = {
        k: jnp.asarray(v) for k, v in make_batch(rng, full_image=True).items()
    }
    model_ref = ENeRF(cas=BASE)
    variables = model_ref.init(jax.random.PRNGKey(0), batch, False)

    want = _train_grads(BASE, variables, batch)
    # isolate the sampling change: altering the warp implementation too
    # would flip relu gates in the U-Nets from f32 summation-order noise
    # (finite gradient jumps — warp gradient parity is pinned op-level in
    # test_pallas_warp.py / test_windowed_warp.py instead)
    got = _train_grads(
        dataclasses.replace(BASE, eval_sampling="structured"),
        variables, batch,
    )
    _assert_grads_close(got, want, atol=1e-3, tail_atol=1e-2)


def test_pallas_eval_matches_gather(monkeypatch):
    """warp_mode=pallas + eval_sampling=pallas (fused VMEM kernels, f32,
    interpret on CPU) must match the gather reference end to end. The
    model routes non-TPU backends to the windowed fallback by default, so
    force the kernel path to keep it covered."""
    monkeypatch.setenv("BOOST_PALLAS_FORCE", "1")
    rng = np.random.default_rng(22)
    batch = {k: jnp.asarray(v) for k, v in make_batch(rng, full_image=True).items()}

    model_ref = ENeRF(cas=BASE)
    variables = model_ref.init(jax.random.PRNGKey(0), batch, False)
    want = model_ref.apply(variables, batch, False)

    fast_cas = dataclasses.replace(
        BASE, warp_mode="pallas", eval_sampling="pallas"
    )
    model_fast = ENeRF(cas=fast_cas)
    got = model_fast.apply(variables, batch, False)

    np.testing.assert_allclose(
        np.asarray(got["depth_mvs_level0"]),
        np.asarray(want["depth_mvs_level0"]),
        rtol=1e-3, atol=1e-4,
    )
    for k in ("rgb_level0", "rgb_level1"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=1e-3, atol=2e-3,
            err_msg=k,
        )


def test_pallas_sampling_training_grads_match_windowed(monkeypatch):
    """Full-image training through the fused row sampler's custom VJP
    (Pallas forward AND backward for the render-stage image sampling) must
    produce the same parameter gradients as the structured windowed path.

    Isolates the sampling change (warp stays windowed in both) — warp VJP
    parity is covered by test_pallas_warp_training_grads_match_windowed."""
    monkeypatch.setenv("BOOST_PALLAS_FORCE", "1")
    rng = np.random.default_rng(25)
    batch = {
        k: jnp.asarray(v) for k, v in make_batch(rng, full_image=True).items()
    }
    ref_cas = dataclasses.replace(
        BASE, warp_mode="windowed", eval_sampling="structured"
    )
    model_ref = ENeRF(cas=ref_cas)
    variables = model_ref.init(jax.random.PRNGKey(0), batch, False)

    want = _train_grads(ref_cas, variables, batch)
    got = _train_grads(
        dataclasses.replace(
            BASE, warp_mode="windowed", eval_sampling="pallas"
        ),
        variables, batch,
    )
    _assert_grads_close(got, want, atol=1e-3, tail_atol=1e-2)
