"""Tests for the boost (multi cost-volume fusion) model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boostmvsnerfs_tpu.models.boost_enerf import (
    BoostENeRF,
    search_k_best,
    view_combinations,
)
from boostmvsnerfs_tpu.models.enerf import CascadeConfig
from tests.helpers import make_batch

pytestmark = pytest.mark.slow

TEST_CAS = CascadeConfig(volume_planes=(16, 8), num_samples=(8, 2), k_best=2)


def _boost_batch(rng, N=4):
    batch = make_batch(rng, S=N, full_image=False, num_rays=(48, 96))
    batch["all_src_inps"] = batch["src_inps"]
    batch["all_src_exts"] = batch["src_exts"]
    batch["all_src_ixts"] = batch["src_ixts"]
    combos = view_combinations(N, 3)
    batch["combos"] = combos
    batch["k_best"] = np.array([[0, 1]], dtype=np.int32)
    return {k: jnp.asarray(v) for k, v in batch.items()}


@pytest.fixture(scope="module")
def boost_setup():
    rng = np.random.default_rng(3)
    batch = _boost_batch(rng)
    model = BoostENeRF(cas=TEST_CAS)
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    return model, variables, batch


def test_view_combinations_table():
    c = view_combinations(4, 3)
    assert c.tolist() == [[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]]


def test_search_k_best_greedy():
    H, W = 4, 4
    m0 = np.zeros((H, W), np.float32)
    m0[:, :2] = 1.0  # covers left half
    m1 = np.zeros((H, W), np.float32)
    m1[:, 2:] = 1.0  # covers right half
    m2 = np.ones((H, W), np.float32) * 0.6  # covers everything weakly
    got = search_k_best(np.stack([m0, m1, m2]), k=2)
    assert got[0] == 2  # 0.6 everywhere beats 0.5 coverage ratio
    # after 2: remaining coverage 0.4 everywhere; m0/m1 each cover 0.2
    assert got[1] in (0, 1)

    # empty-coverage fallback
    assert search_k_best(np.zeros((3, H, W), np.float32), 2) == [0]


def test_boost_forward_shapes(boost_setup):
    model, variables, batch = boost_setup
    out = model.apply(variables, batch, False)
    B, N1 = batch["ray_idx_1"].shape
    assert out["rgb_level1"].shape == (B, N1, 3)
    assert np.isfinite(np.asarray(out["rgb_level1"])).all()
    rgb = np.asarray(out["rgb_level1"])
    assert rgb.min() >= -1e-5 and rgb.max() <= 1.0 + 1e-5


def test_coverage_masks_shape_and_range(boost_setup):
    model, variables, _ = boost_setup
    rng = np.random.default_rng(5)
    batch = make_batch(rng, S=4, full_image=True)
    batch["all_src_inps"] = batch["src_inps"]
    batch["all_src_exts"] = batch["src_exts"]
    batch["all_src_ixts"] = batch["src_ixts"]
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    combos = jnp.asarray(view_combinations(4, 3)[:2])
    masks = model.apply(
        variables, batch, combos, method=BoostENeRF.forward_view_selection
    )
    assert masks.shape == (2, 1, 64, 96)
    m = np.asarray(masks)
    assert np.isfinite(m).all()
    assert m.min() >= -1e-5 and m.max() <= 1.0 + 1e-5


def test_boost_single_volume_matches_enerf_composite(boost_setup):
    """With K identical volumes the fused render must equal the plain
    composite of one volume (masks normalize to 1/K each, alphas sum back)."""
    model, variables, batch = boost_setup
    b2 = dict(batch)
    b2["k_best"] = jnp.asarray([[0, 0]], dtype=jnp.int32)  # same combo twice
    out = model.apply(variables, b2, False)
    assert np.isfinite(np.asarray(out["rgb_level1"])).all()
