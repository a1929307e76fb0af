"""Staged execution must match the monolithic forward bit-for-bit-ish."""

import jax
import jax.numpy as jnp
import numpy as np

from boostmvsnerfs_tpu.models.boost_enerf import BoostENeRF, view_combinations
from boostmvsnerfs_tpu.models.enerf import CascadeConfig, ENeRF
from boostmvsnerfs_tpu.parallel.staged import StagedENeRF
from tests.helpers import make_batch
import pytest

pytestmark = pytest.mark.slow

CAS = CascadeConfig(volume_planes=(16, 8), num_samples=(8, 2), warp_dtype="float32")


def test_staged_matches_monolithic_enerf():
    rng = np.random.default_rng(31)
    batch = {k: jnp.asarray(v) for k, v in make_batch(rng, full_image=True).items()}
    model = ENeRF(cas=CAS)
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    want = model.apply(variables, batch, False)
    staged = StagedENeRF(model)
    got = staged(variables, batch)
    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=1e-4, atol=1e-5,
            err_msg=k,
        )


def test_staged_matches_monolithic_boost():
    rng = np.random.default_rng(32)
    b = make_batch(rng, S=4, full_image=True)
    b["all_src_inps"] = b["src_inps"]
    b["all_src_exts"] = b["src_exts"]
    b["all_src_ixts"] = b["src_ixts"]
    b["combos"] = view_combinations(4, 3)
    b["k_best"] = np.array([[0, 2]], dtype=np.int32)
    batch = {k: jnp.asarray(v) for k, v in b.items()}

    import dataclasses

    cas = dataclasses.replace(CAS, k_best=2)
    model = BoostENeRF(cas=cas)
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    want = model.apply(variables, batch, False)
    # all three stage granularities: the 6-stage split pipeline, the fused
    # one-program-per-level pipeline (the eval default), and the whole-
    # frame program
    for kw in ({"fuse_levels": False}, {"fuse_levels": True},
               {"fuse_frame": True}):
        staged = StagedENeRF(model, **kw)
        got = staged(variables, batch)
        for k in want:
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(want[k]), rtol=1e-4,
                atol=1e-5, err_msg=f"{k} {kw}",
            )


def test_staged_fused_eval_render_if():
    """The fused level pipeline under the evaluation cascade config
    (render_if [False, True] — reference
    configs/exps/evaluate/enerf/base_eval.yaml) renders only the fine
    level and matches the monolithic forward."""
    import dataclasses

    rng = np.random.default_rng(33)
    b = make_batch(rng, S=4, full_image=True)
    b["all_src_inps"] = b["src_inps"]
    b["all_src_exts"] = b["src_exts"]
    b["all_src_ixts"] = b["src_ixts"]
    b["combos"] = view_combinations(4, 3)
    b["k_best"] = np.array([[0, 2]], dtype=np.int32)
    batch = {k: jnp.asarray(v) for k, v in b.items()}

    cas = dataclasses.replace(CAS, k_best=2, render_if=(False, True))
    model = BoostENeRF(cas=cas)
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    want = model.apply(variables, batch, False)
    got = StagedENeRF(model, fuse_levels=True)(variables, batch)
    assert not any(k.endswith("_level0") for k in got)
    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=1e-4, atol=1e-5,
            err_msg=k,
        )


def test_staged_cv_mesh_matches_unsharded():
    """The (cv, rays) mesh staged path — K volumes sharded over cv, rays
    over rays, blend as the only cross-cv collective — must reproduce the
    unsharded staged render on the 8-virtual-device CPU backend."""
    from boostmvsnerfs_tpu.parallel.mesh import make_cv_mesh

    rng = np.random.default_rng(33)
    b = make_batch(rng, S=5, full_image=True)
    b["all_src_inps"] = b["src_inps"]
    b["all_src_exts"] = b["src_exts"]
    b["all_src_ixts"] = b["src_ixts"]
    b["combos"] = view_combinations(5, 3)
    b["k_best"] = np.array([[0, 3, 5, 7]], dtype=np.int32)
    batch = {k: jnp.asarray(v) for k, v in b.items()}

    import dataclasses

    cas = dataclasses.replace(CAS, k_best=4)
    model = BoostENeRF(cas=cas)
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    want = StagedENeRF(model)(variables, batch)

    for n in (2, 8):  # cv=2/rays=1 and cv=4/rays=2
        mesh = make_cv_mesh(n, k_best=4, devices=jax.devices("cpu"))
        got = StagedENeRF(model, mesh=mesh)(variables, batch)
        for k in want:
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(want[k]),
                rtol=1e-4, atol=1e-5, err_msg=f"N={n} {k}",
            )


def test_make_cv_mesh_factorization():
    from boostmvsnerfs_tpu.parallel.mesh import make_cv_mesh

    devs = jax.devices("cpu")
    assert make_cv_mesh(8, k_best=4, devices=devs).shape == {
        "cv": 4, "rays": 2
    }
    assert make_cv_mesh(2, k_best=4, devices=devs).shape == {
        "cv": 2, "rays": 1
    }
    assert make_cv_mesh(8, k_best=3, devices=devs).shape == {
        "cv": 1, "rays": 8
    }
