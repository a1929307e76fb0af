"""Camera path generation tests."""

import numpy as np

from boostmvsnerfs_tpu.utils import camera_paths as cp
from tests.helpers import look_at_ext


def _orbit_c2ws(n=8, r=3.0):
    return np.stack(
        [
            np.linalg.inv(
                look_at_ext(np.array([r * np.sin(a), 0.2, r * np.cos(a)]))
            )
            for a in np.linspace(0, 0.8, n)
        ]
    )


def test_poses_are_rigid():
    c2ws = _orbit_c2ws()
    for path in (cp.spiral_path(c2ws, 12), cp.interpolate_path(c2ws, 12)):
        assert path.shape == (12, 4, 4)
        for m in path:
            R = m[:3, :3]
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
            np.testing.assert_allclose(m[3], [0, 0, 0, 1], atol=1e-12)


def test_interpolate_hits_endpoints():
    c2ws = _orbit_c2ws(4)
    path = cp.interpolate_path(c2ws, 7)
    np.testing.assert_allclose(path[0], c2ws[0], atol=1e-6)
    np.testing.assert_allclose(path[-1], c2ws[-1], atol=1e-6)


def test_spiral_stays_near_scene():
    c2ws = _orbit_c2ws()
    path = cp.spiral_path(c2ws, 20)
    center = c2ws[:, :3, 3].mean(0)
    d = np.linalg.norm(path[:, :3, 3] - center, axis=-1)
    assert d.max() < 2.0  # within the camera rig's scale
