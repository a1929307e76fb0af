"""The windowed matmul warp must match the gather-based warp exactly."""

import jax.numpy as jnp
import numpy as np

from boostmvsnerfs_tpu.ops import cost_volume, geometry
from tests.helpers import look_at_ext


def _setup(rng, Hs=32, Ws=48, Ht=16, Wt=24, D=6):
    feat = rng.standard_normal((Hs, Ws, 4)).astype(np.float32)
    tar_ext = look_at_ext(np.array([0.1, 0.05, 3.0]))
    src_ext = look_at_ext(np.array([0.7, -0.2, 2.8]))
    ixt_t = np.array(
        [[Wt * 1.2, 0, Wt / 2], [0, Wt * 1.2, Ht / 2], [0, 0, 1]], np.float32
    )
    ixt_s = np.array(
        [[Ws * 1.2, 0, Ws / 2], [0, Ws * 1.2, Hs / 2], [0, 0, 1]], np.float32
    )
    pm = geometry.proj_mats(
        jnp.asarray(ixt_s)[None, None],
        jnp.asarray(src_ext)[None, None],
        jnp.asarray(ixt_t)[None],
        jnp.asarray(tar_ext)[None],
        1.0,
        1.0,
    )[0, 0]
    dv = jnp.broadcast_to(
        jnp.linspace(2.0, 5.0, D)[:, None, None], (D, Ht, Wt)
    )
    return jnp.asarray(feat), pm, dv


def test_windowed_matches_gather(rng):
    feat, pm, dv = _setup(rng)
    want = cost_volume.warp_src_view(feat, pm, dv)
    got = cost_volume.warp_src_view_windowed(feat, pm, dv, 48, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_windowed_variance_matches(rng):
    feat, pm, dv = _setup(rng)
    feats = jnp.stack([feat, feat * 0.5 + 0.1])
    pms = jnp.stack([pm, pm])
    want = cost_volume.variance_volume(feats, pms, dv)
    got = cost_volume.variance_volume_windowed(feats, pms, dv, 48, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_windowed_handles_out_of_image(rng):
    """Samples projecting outside the source must contribute zeros exactly
    like grid_sample zeros padding (triangle weights vanish)."""
    feat, pm, dv = _setup(rng)
    # shift the projection far off-image for some planes
    pm_shifted = pm.at[0, 3].add(500.0)
    want = cost_volume.warp_src_view(feat, pm_shifted, dv)
    got = cost_volume.warp_src_view_windowed(feat, pm_shifted, dv, 48, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_column_tiled_windowed_matches_gather(rng):
    feat, pm, dv = _setup(rng)
    want = cost_volume.warp_src_view(feat, pm, dv)
    got = cost_volume.warp_src_view_windowed(
        feat, pm, dv, 48, 64, rows_per_tile=4, cols_per_tile=6
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_column_tiled_coverage_zero(rng):
    feat, pm, dv = _setup(rng)
    miss = cost_volume.warp_window_coverage(
        feat.shape, pm, dv, 48, 64, rows_per_tile=4, cols_per_tile=6
    )
    assert float(miss) == 0.0


def test_windowed_variance_grads_match_gather(rng):
    """Autodiff through the windowed warp (the XLA training path) must match
    the gather path's gradients w.r.t. features AND depth hypotheses."""
    import jax

    feat, pm, dv = _setup(rng)
    feats = jnp.stack([feat, feat * 0.5 + 0.1, feat[:, ::-1] * 0.8])
    pms = jnp.stack([pm, pm, pm])
    dv = dv * (1.0 + 0.01 * jnp.sin(jnp.arange(dv.size).reshape(dv.shape)))
    ct = jnp.asarray(
        rng.standard_normal(dv.shape + (feat.shape[-1],)).astype(np.float32)
    )

    def loss_g(f, d):
        return jnp.sum(cost_volume.variance_volume(f, pms, d) * ct)

    def loss_w(f, d):
        return jnp.sum(
            cost_volume.variance_volume_windowed(f, pms, d, 32, 48) * ct
        )

    gg = jax.grad(loss_g, argnums=(0, 1))(feats, dv)
    gw = jax.grad(loss_w, argnums=(0, 1))(feats, dv)
    for a, b, name in [(gg[0], gw[0], "d_feats"), (gg[1], gw[1], "d_depth")]:
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-6
        np.testing.assert_allclose(
            b / scale, a / scale, atol=2e-5, err_msg=name
        )
