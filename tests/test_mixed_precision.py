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


def test_bf16_warp_close_to_f32():
    """warp_dtype=bfloat16 (the default, fast MXU interpolation path) must
    stay within the parity budget of the f32 windowed warp on a full render."""
    rng = np.random.default_rng(7)
    batch = {
        k: jnp.asarray(v) for k, v in make_batch(rng, full_image=True).items()
    }
    cas32 = dataclasses.replace(CAS, warp_dtype="float32")
    model32 = ENeRF(cas=cas32)
    variables = model32.init(jax.random.PRNGKey(0), batch, False)
    want = model32.apply(variables, batch, False)

    model16 = ENeRF(cas=dataclasses.replace(CAS, warp_dtype="bfloat16"))
    got = model16.apply(variables, batch, False)

    assert got["rgb_level1"].dtype == jnp.float32
    a = np.asarray(got["rgb_level1"], np.float64)
    b = np.asarray(want["rgb_level1"], np.float64)
    mse = np.mean((a - b) ** 2)
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    # agreement far above any rendering-quality signal (>45 dB)
    assert psnr > 45.0, psnr
