"""bfloat16 conv policy: runs, keeps float32 params/outputs, stays close."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from boostmvsnerfs_tpu.models.enerf import CascadeConfig, ENeRF
from tests.helpers import make_batch

CAS = CascadeConfig(volume_planes=(16, 8), num_samples=(8, 2))


def test_bf16_policy_close_to_f32():
    rng = np.random.default_rng(5)
    batch = {
        k: jnp.asarray(v)
        for k, v in make_batch(rng, full_image=False, num_rays=(32, 64)).items()
    }
    model32 = ENeRF(cas=CAS)
    variables = model32.init(jax.random.PRNGKey(0), batch, False)
    want = model32.apply(variables, batch, False)

    model16 = ENeRF(cas=dataclasses.replace(CAS, conv_dtype="bfloat16"))
    got = model16.apply(variables, batch, False)

    # params stayed float32-compatible (same variables reused); outputs f32
    assert got["rgb_level1"].dtype == jnp.float32
    # bf16 convs keep outputs in the right ballpark (not bitwise)
    diff = np.abs(np.asarray(got["rgb_level1"]) - np.asarray(want["rgb_level1"]))
    assert np.isfinite(diff).all()
    assert diff.mean() < 0.05
