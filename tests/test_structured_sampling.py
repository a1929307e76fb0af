"""Structured (gather-free) samplers must equal the gather-based paths."""

import jax.numpy as jnp
import numpy as np
import pytest

from boostmvsnerfs_tpu.ops import sampling


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_windowed_sample_rows_matches_gather(rng, padding_mode):
    H, W, C = 24, 32, 5
    img = rng.standard_normal((H, W, C)).astype(np.float32)
    # smooth per-tile coordinate fields (rows with small y jitter), some
    # out-of-image coordinates included
    n_tiles, T = 6, 40
    xs = np.linspace(-3, W + 2, T)[None] + rng.normal(0, 0.3, (n_tiles, T))
    ys = (np.arange(n_tiles) * 4.0)[:, None] + rng.normal(0, 1.0, (n_tiles, T))
    xy = np.stack([xs, ys], -1).astype(np.float32)

    got = sampling.windowed_sample_rows(
        jnp.asarray(img), jnp.asarray(xy), window_h=8, padding_mode=padding_mode
    )
    want = sampling.grid_sample_2d(
        jnp.asarray(img), jnp.asarray(xy.reshape(-1, 2)), padding_mode
    ).reshape(n_tiles, T, C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_plane_resample_z_matches_trilinear(rng):
    D, Hv, Wv, C = 6, 8, 10, 4
    H_out, W_out, S = 16, 20, 3
    vol = rng.standard_normal((D, Hv, Wv, C)).astype(np.float32)
    # full-raster grid positions: u = x/(W_out-1)*(Wv-1) etc.
    z = rng.uniform(-0.5, D - 0.5, (H_out, W_out, S)).astype(np.float32)

    got = sampling.plane_resample_z(jnp.asarray(vol), jnp.asarray(z))

    xs, ys = np.meshgrid(np.arange(W_out), np.arange(H_out))
    u = xs / (W_out - 1) * (Wv - 1)
    v = ys / (H_out - 1) * (Hv - 1)
    xyz = np.stack(
        [np.repeat(u[..., None], S, -1), np.repeat(v[..., None], S, -1), z], -1
    ).reshape(-1, 3)
    want = sampling.grid_sample_3d(
        jnp.asarray(vol), jnp.asarray(xyz.astype(np.float32)), "zeros"
    ).reshape(H_out, W_out, S, C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
@pytest.mark.parametrize("tiles_per_step", [1, 3])
def test_windowed_sample_tiles_matches_gather(rng, padding_mode, tiles_per_step):
    H, W, C = 24, 32, 5
    img = rng.standard_normal((H, W, C)).astype(np.float32)
    n_tiles, T = 6, 40
    xs = (np.arange(n_tiles) * 3.0)[:, None] + np.linspace(0, 8, T)[None] \
        + rng.normal(0, 0.3, (n_tiles, T))
    ys = (np.arange(n_tiles) * 3.0)[:, None] + rng.normal(0, 1.0, (n_tiles, T))
    xy = np.stack([xs, ys], -1).astype(np.float32)

    got = sampling.windowed_sample_tiles(
        jnp.asarray(img), jnp.asarray(xy), window_h=8, window_w=16,
        padding_mode=padding_mode, tiles_per_step=tiles_per_step,
    )
    want = sampling.grid_sample_2d(
        jnp.asarray(img), jnp.asarray(xy.reshape(-1, 2)), padding_mode
    ).reshape(n_tiles, T, C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
    miss = sampling.sample_window_coverage(img.shape, jnp.asarray(xy), 8, 16,
                                           padding_mode)
    assert float(miss) == 0.0
