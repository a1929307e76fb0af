"""Tests for volume rendering ops against analytic cases."""

import jax.numpy as jnp
import numpy as np

from boostmvsnerfs_tpu.ops import render


def test_depth_regression_peaked_distribution():
    B, D, H, W = 1, 16, 3, 4
    dv = jnp.broadcast_to(jnp.linspace(2.0, 10.0, D)[None, :, None, None], (B, D, H, W))
    logits = jnp.full((B, D, H, W), -30.0).at[:, 5].set(30.0)
    depth, std = render.depth_regression(logits, dv, inverse=False)
    np.testing.assert_allclose(np.asarray(depth), float(dv[0, 5, 0, 0]), rtol=1e-5)
    assert float(std.max()) < 1e-3

    # inverse mode regresses in disparity space
    depth_i, _ = render.depth_regression(logits, dv, inverse=True)
    np.testing.assert_allclose(
        np.asarray(depth_i), 1.0 / float(dv[0, 5, 0, 0]), rtol=1e-5
    )


def test_composite_opaque_first_sample():
    B, N, S = 1, 4, 5
    raw = jnp.zeros((B, N, S, 4))
    raw = raw.at[..., 0, :3].set(jnp.asarray([0.2, 0.4, 0.6]))
    raw = raw.at[..., 0, 3].set(50.0)  # opaque first sample
    z = jnp.broadcast_to(jnp.linspace(1.0, 2.0, S), (B, N, S))
    out = render.composite(raw, z)
    np.testing.assert_allclose(
        np.asarray(out["rgb"]), np.tile([0.2, 0.4, 0.6], (1, N, 1)), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(out["weights"][..., 0]), 1.0, atol=1e-5)


def test_composite_transmittance_two_samples():
    """Analytic: alpha0=0.3, alpha1=0.5 -> w = [0.3, 0.7*0.5]."""
    a0, a1 = 0.3, 0.5
    raw = jnp.zeros((1, 1, 2, 4))
    raw = raw.at[0, 0, 0, 3].set(-np.log(1 - a0))
    raw = raw.at[0, 0, 1, 3].set(-np.log(1 - a1))
    raw = raw.at[0, 0, 0, :3].set(1.0)
    out = render.composite(raw, None)
    w = np.asarray(out["weights"][0, 0])
    np.testing.assert_allclose(w, [a0, (1 - a0) * a1], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["rgb"][0, 0]), [a0] * 3, rtol=1e-5)


def test_composite_blend_k1_matches_composite(rng):
    B, N, S = 2, 6, 4
    raw = jnp.asarray(rng.standard_normal((B, N, S, 4)).astype(np.float32))
    raw = raw.at[..., 3].set(jnp.abs(raw[..., 3]))
    z = jnp.asarray(np.sort(rng.uniform(1, 5, (B, N, S))).astype(np.float32))
    plain = render.composite(raw, z)
    masks = render.normalize_blend_masks(jnp.ones((B, 1, N, S)))
    blend = render.composite_blend(raw[:, None], masks, z[:, None])
    np.testing.assert_allclose(
        np.asarray(blend["rgb"]), np.asarray(plain["rgb"]), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(blend["depth"]), np.asarray(plain["depth"]), rtol=1e-4, atol=1e-5
    )


def test_composite_blend_disjoint_masks(rng):
    """Two volumes with disjoint visibility: the blend must equal a single
    volume holding the visible halves."""
    B, N, S = 1, 4, 6
    raw_a = jnp.asarray(rng.standard_normal((B, N, S, 4)).astype(np.float32))
    raw_b = jnp.asarray(rng.standard_normal((B, N, S, 4)).astype(np.float32))
    raw_a = raw_a.at[..., 3].set(jnp.abs(raw_a[..., 3]))
    raw_b = raw_b.at[..., 3].set(jnp.abs(raw_b[..., 3]))
    half = S // 2
    mask_a = jnp.concatenate([jnp.ones((B, N, half)), jnp.zeros((B, N, half))], -1)
    mask_b = 1.0 - mask_a
    masks = render.normalize_blend_masks(jnp.stack([mask_a, mask_b], axis=1))
    raws = jnp.stack([raw_a, raw_b], axis=1)
    z = jnp.broadcast_to(jnp.linspace(1.0, 2.0, S), (B, N, S))
    blend = render.composite_blend(raws, masks, jnp.stack([z, z], 1))

    merged = jnp.where(mask_a[..., None] > 0, raw_a, raw_b)
    plain = render.composite(merged, z)
    np.testing.assert_allclose(
        np.asarray(blend["rgb"]), np.asarray(plain["rgb"]), rtol=1e-4, atol=1e-5
    )


def test_mask_viewport_counts_views():
    # camera at origin looking down +z with 45deg fov; image 10x10
    ext = jnp.eye(4)[None, None]  # (B=1, V=1, 4, 4)
    ixt = jnp.asarray([[5.0, 0, 5.0], [0, 5.0, 5.0], [0, 0, 1.0]])[None, None]
    inv_scale = jnp.asarray([[9.0, 9.0]])
    pts = jnp.asarray(
        [[[[0.0, 0.0, 2.0], [0.0, 0.0, -1.0], [50.0, 0.0, 2.0]]]]
    )  # (1,1,3,3): in front, behind, far outside
    m = render.mask_viewport(pts, ext, ixt, inv_scale)
    np.testing.assert_allclose(np.asarray(m[0, 0]), [1.0, 0.0, 0.0], atol=1e-6)


def test_sample_along_depth_metric():
    ray_o = jnp.zeros((1, 2, 3))
    ray_d = jnp.asarray([[[0.0, 0.0, 1.0], [0.0, 0.0, 2.0]]])
    bounds = jnp.asarray([[[2.0, 4.0, 1.0, 5.0]] * 2])
    uv = jnp.asarray([[[3.0, 7.0], [1.0, 2.0]]])
    xyz, uvd, z = render.sample_along_depth(ray_o, ray_d, bounds, uv, 3, inverse=False)
    np.testing.assert_allclose(np.asarray(z[0, 0]), [2.0, 3.0, 4.0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(xyz[0, 1, :, 2]), [4.0, 6.0, 8.0], rtol=1e-6)
    # volume coordinate normalized against [vnear, vfar] = [1, 5]
    np.testing.assert_allclose(np.asarray(uvd[0, 0, :, 2]), [0.25, 0.5, 0.75], rtol=1e-6)


def test_sample_along_depth_inverse_disparity():
    ray_o = jnp.zeros((1, 1, 3))
    ray_d = jnp.asarray([[[0.0, 0.0, 1.0]]])
    # disparity band [0.5, 0.25] -> depths [2, 4]
    bounds = jnp.asarray([[[0.5, 0.25, 0.5, 0.25]]])
    uv = jnp.zeros((1, 1, 2))
    xyz, uvd, z = render.sample_along_depth(ray_o, ray_d, bounds, uv, 2, inverse=True)
    np.testing.assert_allclose(np.asarray(z[0, 0]), [0.5, 0.25], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(xyz[0, 0, :, 2]), [2.0, 4.0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(uvd[0, 0, :, 2]), [0.0, 1.0], atol=1e-6)
