"""Fused Pallas trilinear volume sampler vs the gather-based reference."""

import jax
import jax.numpy as jnp
import numpy as np

from boostmvsnerfs_tpu.ops import sampling
from boostmvsnerfs_tpu.ops.pallas.tri_sample import (
    fused_tri_sample,
    tri_window_coverage,
)

INTERPRET = jax.devices()[0].platform != "tpu"


def _setup(rng, B=2, Dp=10, Hp=20, Wp=24, C=8, R=6, T=40):
    vol = rng.standard_normal((B, Dp, Hp, Wp, C)).astype(np.float32)
    # smooth per-row curves, including out-of-volume excursions
    xs = np.linspace(-2, Wp + 1, T)[None, None] + rng.normal(0, 0.3, (B, R, T))
    ys = (np.arange(R) * 2.5)[None, :, None] + rng.normal(0, 0.8, (B, R, T))
    zs = (np.arange(R) % 5 * 2.0)[None, :, None] + rng.normal(
        0, 0.2, (B, R, T)
    )
    return (
        jnp.asarray(vol),
        jnp.asarray(xs.astype(np.float32)),
        jnp.asarray(ys.astype(np.float32)),
        jnp.asarray(zs.astype(np.float32)),
    )


def test_fused_tri_matches_gather(rng):
    vol, x, y, z = _setup(rng)
    miss = tri_window_coverage(vol.shape, x, y, z, window_h=8, window_z=5)
    assert float(miss) == 0.0
    got = fused_tri_sample(
        vol, x, y, z, window_h=8, window_z=5,
        compute_dtype=jnp.float32, interpret=INTERPRET,
    )
    B, R, T = x.shape
    xyz = jnp.stack([x, y, z], axis=-1).reshape(B, R * T, 3)
    want = jax.vmap(
        lambda v, p: sampling.grid_sample_3d(v, p, "zeros")
    )(vol, xyz).reshape(B, R, T, -1)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )


def test_fused_tri_bf16_close(rng):
    vol, x, y, z = _setup(rng)
    got = fused_tri_sample(
        vol, x, y, z, window_h=8, window_z=5, interpret=INTERPRET
    )
    B, R, T = x.shape
    xyz = jnp.stack([x, y, z], axis=-1).reshape(B, R * T, 3)
    want = jax.vmap(
        lambda v, p: sampling.grid_sample_3d(v, p, "zeros")
    )(vol, xyz).reshape(B, R, T, -1)
    err = np.abs(np.asarray(got) - np.asarray(want))
    assert err.mean() < 0.02
