"""Full-model equivalence: structured (gather-free) eval sampling vs the
gather path, and windowed vs gather warp."""

import dataclasses

import jax
import numpy as np
import jax.numpy as jnp

from boostmvsnerfs_tpu.models.enerf import CascadeConfig, ENeRF
from tests.helpers import make_batch

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
