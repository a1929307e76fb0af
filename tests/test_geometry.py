"""Closed-form tests for the camera geometry core."""

import jax.numpy as jnp
import numpy as np

from boostmvsnerfs_tpu.ops import cost_volume, geometry


def _random_camera(rng, center):
    """Random-ish look-at w2c extrinsic + intrinsic."""
    fwd = -center / np.linalg.norm(center)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    up2 = np.cross(fwd, right)
    R = np.stack([right, up2, fwd], axis=0)  # w2c rotation
    t = -R @ center
    ext = np.eye(4, dtype=np.float32)
    ext[:3, :3], ext[:3, 3] = R, t
    ixt = np.array(
        [[120.0, 0.0, 32.0], [0.0, 120.0, 24.0], [0.0, 0.0, 1.0]], dtype=np.float32
    )
    return ext, ixt


def test_proj_mats_consistent_with_direct_projection(rng):
    """proj_mat @ [target pixel * depth] must reproduce direct projection of
    the corresponding world point into the source camera."""
    tar_ext, tar_ixt = _random_camera(rng, np.array([0.0, 0.1, 3.0]))
    src_ext, src_ixt = _random_camera(rng, np.array([0.8, -0.2, 2.9]))

    pm = geometry.proj_mats(
        jnp.asarray(src_ixt)[None, None],
        jnp.asarray(src_ext)[None, None],
        jnp.asarray(tar_ixt)[None],
        jnp.asarray(tar_ext)[None],
        src_scale=1.0,
        tar_scale=1.0,
    )[0, 0]

    for _ in range(10):
        world = rng.uniform(-0.5, 0.5, 3).astype(np.float32)
        # direct projections
        xy_t, d_t = geometry.project_points(
            jnp.asarray(world)[None, None], jnp.asarray(tar_ext)[None],
            jnp.asarray(tar_ixt)[None],
        )
        xy_s, d_s = geometry.project_points(
            jnp.asarray(world)[None, None], jnp.asarray(src_ext)[None],
            jnp.asarray(src_ixt)[None],
        )
        # via proj_mat: R @ [x, y, 1] + T / depth, then perspective divide
        g = jnp.concatenate([xy_t[0, 0], jnp.ones(1)])
        v = pm[:, :3] @ g + pm[:, 3] / d_t[0, 0, 0]
        got = v[:2] / v[2]
        np.testing.assert_allclose(np.asarray(got), np.asarray(xy_s[0, 0]), atol=1e-3)


def test_rays_roundtrip_through_projection(rng):
    tar_ext, tar_ixt = _random_camera(rng, np.array([0.3, -0.1, 2.5]))
    xy = rng.uniform(0, 40, size=(1, 7, 2)).astype(np.float32)
    ray_o, ray_d = geometry.rays_from_pixels(
        jnp.asarray(tar_ixt)[None], jnp.asarray(tar_ext)[None], jnp.asarray(xy)
    )
    depth = rng.uniform(1.0, 4.0, size=(1, 7, 1)).astype(np.float32)
    world = ray_o + ray_d * depth  # z-depth parameterization
    xy_back, d_back = geometry.project_points(
        world[:, :, None], jnp.asarray(tar_ext)[None], jnp.asarray(tar_ixt)[None]
    )
    np.testing.assert_allclose(np.asarray(xy_back[:, :, 0]), xy, atol=1e-2)
    np.testing.assert_allclose(np.asarray(d_back[:, :, 0, 0]), depth[..., 0], atol=1e-4)


def test_cam_center_matches_inverse(rng):
    ext, _ = _random_camera(rng, np.array([1.0, 0.5, 2.0]))
    want = np.linalg.inv(ext)[:3, 3]
    got = np.asarray(geometry.cam_center(jnp.asarray(ext)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_initial_depth_values_inverse_spacing():
    nf = jnp.asarray([[2.0, 8.0]])
    dv = cost_volume.initial_depth_values(nf, D=5, H=2, W=3, inverse=True)
    assert dv.shape == (1, 5, 2, 3)
    disp = 1.0 / np.asarray(dv[0, :, 0, 0])
    np.testing.assert_allclose(disp, np.linspace(1 / 2.0, 1 / 8.0, 5), rtol=1e-6)
    dv_lin = cost_volume.initial_depth_values(nf, D=5, H=2, W=3, inverse=False)
    np.testing.assert_allclose(
        np.asarray(dv_lin[0, :, 1, 1]), np.linspace(2.0, 8.0, 5), rtol=1e-6
    )


def test_warp_identity_camera_recovers_feature(rng):
    """Warping a source view that coincides with the target camera must
    return the source feature at every depth (identity homography)."""
    H, W, C = 8, 10, 4
    feat = rng.standard_normal((H, W, C)).astype(np.float32)
    ext = np.eye(4, dtype=np.float32)
    ixt = np.array([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]], dtype=np.float32)
    pm = geometry.proj_mats(
        jnp.asarray(ixt)[None, None],
        jnp.asarray(ext)[None, None],
        jnp.asarray(ixt)[None],
        jnp.asarray(ext)[None],
        1.0,
        1.0,
    )[0, 0]
    dv = jnp.full((3, H, W), 2.5)
    warped = cost_volume.warp_src_view(jnp.asarray(feat), pm, dv)
    for d in range(3):
        np.testing.assert_allclose(np.asarray(warped[d]), feat, atol=1e-3)


def test_variance_volume_zero_for_identical_views(rng):
    H, W, C = 8, 10, 4
    feat = rng.standard_normal((H, W, C)).astype(np.float32)
    ext = np.eye(4, dtype=np.float32)
    ixt = np.array([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]], dtype=np.float32)
    pm = geometry.proj_mats(
        jnp.asarray(ixt)[None, None].repeat(2, 1),
        jnp.asarray(ext)[None, None].repeat(2, 1),
        jnp.asarray(ixt)[None],
        jnp.asarray(ext)[None],
        1.0,
        1.0,
    )[0]
    dv = jnp.full((2, H, W), 3.0)
    feats = jnp.stack([jnp.asarray(feat)] * 2)
    var = cost_volume.variance_volume(feats, pm, dv)
    np.testing.assert_allclose(np.asarray(var), 0.0, atol=1e-4)
