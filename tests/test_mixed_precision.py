"""bfloat16 conv policy: runs, keeps float32 params/outputs, stays close."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from boostmvsnerfs_tpu.models.enerf import CascadeConfig, ENeRF
from tests.helpers import make_batch
import pytest

pytestmark = pytest.mark.slow

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


def test_bf16_training_step():
    """A full train step under the bf16 conv policy (the AMP-trainer
    equivalent, configs/exps/pretrain/enerf/dtu_pretrain_amp.yaml): params
    stay float32, gradients are finite, and the loss tracks the f32 step."""
    from boostmvsnerfs_tpu.parallel.train import (
        create_train_state,
        make_train_step,
    )
    from boostmvsnerfs_tpu.train.schedule import make_optimizer

    rng = np.random.default_rng(9)
    batch = {
        k: jnp.asarray(v)
        for k, v in make_batch(rng, full_image=False, num_rays=(32, 64)).items()
    }
    tx = make_optimizer({"lr": 5e-4, "optim": "adam", "eps": 1e-8},
                        ep_iter=100)

    model32 = ENeRF(cas=CAS)
    state32 = create_train_state(model32, tx, batch)
    _, stats32 = make_train_step(model32, tx)(state32, batch)

    model16 = ENeRF(cas=dataclasses.replace(CAS, conv_dtype="bfloat16"))
    state16 = create_train_state(model16, tx, batch)
    # identical init: reuse the f32 parameters
    state16 = state16.replace(params=state32.params,
                              batch_stats=state32.batch_stats)
    new16, stats16 = make_train_step(model16, tx)(state16, batch)

    assert np.isfinite(float(stats16["loss"]))
    # master weights stay float32 (AMP semantics)
    for leaf in jax.tree_util.tree_leaves(new16.params):
        assert leaf.dtype == jnp.float32
    # bf16 forward/backward tracks the f32 loss within rounding noise
    assert abs(float(stats16["loss"]) - float(stats32["loss"])) < 0.05 * (
        abs(float(stats32["loss"])) + 1e-3
    )
