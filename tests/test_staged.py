"""Staged execution must match the monolithic forward bit-for-bit-ish."""

import jax
import jax.numpy as jnp
import numpy as np

from boostmvsnerfs_tpu.models.boost_enerf import BoostENeRF, view_combinations
from boostmvsnerfs_tpu.models.enerf import CascadeConfig, ENeRF
from boostmvsnerfs_tpu.parallel.staged import StagedENeRF
from tests.helpers import make_batch

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
    staged = StagedENeRF(model)
    got = staged(variables, batch)
    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=1e-4, atol=1e-5,
            err_msg=k,
        )
