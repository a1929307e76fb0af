"""COLMAP model I/O round-trip and LLFF conversion tests."""

import numpy as np

from boostmvsnerfs_tpu.data.formats import parse_poses_bounds
from boostmvsnerfs_tpu.utils import colmap


def _toy_model(rng):
    cams = {
        1: colmap.Camera(1, "PINHOLE", 64, 48, np.array([60.0, 60.0, 32.0, 24.0]))
    }
    images = {}
    pts = {}
    n_pts = 20
    for pid in range(n_pts):
        pts[pid] = colmap.Point3D(
            pid, rng.uniform(-1, 1, 3) + [0, 0, 3.0],
            rng.integers(0, 255, 3).astype(np.uint8), 0.5,
            np.array([1, 2]), np.array([pid, pid]),
        )
    for iid in (1, 2):
        angle = 0.2 * iid
        R = np.array(
            [[np.cos(angle), 0, np.sin(angle)], [0, 1, 0],
             [-np.sin(angle), 0, np.cos(angle)]]
        )
        q = colmap.rotmat2qvec(R)
        images[iid] = colmap.Image(
            iid, q, rng.uniform(-0.2, 0.2, 3), 1, f"img_{iid}.png",
            rng.uniform(0, 48, (n_pts, 2)), np.arange(n_pts),
        )
    return cams, images, pts


def test_qvec_roundtrip(rng):
    for _ in range(5):
        v = rng.standard_normal(4)
        q = v / np.linalg.norm(v)
        if q[0] < 0:
            q = -q
        R = colmap.qvec2rotmat(q)
        np.testing.assert_allclose(colmap.rotmat2qvec(R), q, atol=1e-6)


def test_model_roundtrip(tmp_path, rng):
    cams, images, pts = _toy_model(rng)
    colmap.write_model(cams, images, pts, str(tmp_path))
    c2, i2, p2 = colmap.read_model(str(tmp_path))
    assert c2[1].model == "PINHOLE"
    np.testing.assert_allclose(c2[1].params, cams[1].params)
    np.testing.assert_allclose(i2[1].qvec, images[1].qvec)
    np.testing.assert_allclose(i2[2].tvec, images[2].tvec)
    assert i2[1].name == "img_1.png"
    np.testing.assert_allclose(p2[3].xyz, pts[3].xyz)
    np.testing.assert_allclose(p2[3].image_ids, pts[3].image_ids)


def test_poses_bounds_conversion(tmp_path, rng):
    cams, images, pts = _toy_model(rng)
    pb = colmap.colmap_to_poses_bounds(cams, images, pts)
    assert pb.shape == (2, 17)
    np.save(tmp_path / "poses_bounds.npy", pb)
    c2ws, ixts, dr = parse_poses_bounds(str(tmp_path / "poses_bounds.npy"))
    # parser halves intrinsics for images_2; undo for comparison
    np.testing.assert_allclose(ixts[0, 0, 0] * 2, 60.0)
    # recovered c2w rotation must match the original camera orientation
    w2c = images[1].w2c()
    c2w_ref = np.linalg.inv(w2c)
    np.testing.assert_allclose(c2ws[0][:3, :3], c2w_ref[:3, :3], atol=1e-6)
    np.testing.assert_allclose(c2ws[0][:3, 3], c2w_ref[:3, 3], atol=1e-6)
    assert dr[0, 0] > 0 and dr[0, 1] > dr[0, 0]
