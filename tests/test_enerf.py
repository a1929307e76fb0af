"""End-to-end smoke + invariance tests for the ENeRF cascade model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boostmvsnerfs_tpu.models.enerf import CascadeConfig, ENeRF
from tests.helpers import make_batch

pytestmark = pytest.mark.slow

TEST_CAS = CascadeConfig(volume_planes=(16, 8), num_samples=(8, 2))


@pytest.fixture(scope="module")
def enerf_setup():
    rng = np.random.default_rng(1)
    batch = {k: jnp.asarray(v) for k, v in make_batch(rng, full_image=False).items()}
    model = ENeRF(cas=TEST_CAS)
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    return model, variables, batch


def test_forward_shapes(enerf_setup):
    model, variables, batch = enerf_setup
    out = model.apply(variables, batch, False)
    B, N0 = batch["ray_idx_0"].shape
    _, N1 = batch["ray_idx_1"].shape
    assert out["rgb_level0"].shape == (B, N0, 3)
    assert out["rgb_level1"].shape == (B, N1, 3)
    assert out["depth_level0"].shape == (B, N0)
    assert out["depth_level1"].shape == (B, N1)
    # coarse level MVS depth at volume scale 64*0.125 x 96*0.125
    assert out["depth_mvs_level0"].shape == (1, 8, 12)
    assert out["depth_mvs_level1"].shape == (1, 32, 48)
    for k in ["rgb_level0", "rgb_level1", "depth_level0", "depth_level1"]:
        assert np.isfinite(np.asarray(out[k])).all(), k


def test_forward_jit_and_deterministic(enerf_setup):
    model, variables, batch = enerf_setup
    f = jax.jit(lambda v, b: model.apply(v, b, False))
    o1 = f(variables, batch)
    o2 = f(variables, batch)
    np.testing.assert_array_equal(np.asarray(o1["rgb_level1"]), np.asarray(o2["rgb_level1"]))


def test_rgb_in_unit_range(enerf_setup):
    """Color is a softmax blend of source-view RGB (in [0,1]), so outputs
    must stay in [0, 1] (reference lib/networks/enerf/nerf.py:41-42)."""
    model, variables, batch = enerf_setup
    out = model.apply(variables, batch, False)
    rgb = np.asarray(out["rgb_level1"])
    assert rgb.min() >= -1e-5 and rgb.max() <= 1.0 + 1e-5


def test_train_mode_updates_batch_stats(enerf_setup):
    model, variables, batch = enerf_setup
    out, mutated = model.apply(
        variables, batch, True, mutable=["batch_stats"]
    )
    assert "batch_stats" in mutated
    # running stats actually changed
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    changed = any(not np.allclose(a, b) for a, b in zip(old, new))
    assert changed
