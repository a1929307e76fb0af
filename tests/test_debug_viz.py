"""Geometry debug tooling: epipolar segments + depth-probability figures
(reference lib/utils/enerf/val_data_utils.py:7-72 and
lib/networks/enerf/utils.py:733-751)."""

import os

import numpy as np

from boostmvsnerfs_tpu.utils.debug_viz import (
    corner_points,
    depth_prob_figure,
    epipolar_check_figure,
    epipolar_segments,
)
from tests.helpers import make_batch


def test_epipolar_segments_contain_true_projection(rng):
    """A world point at depth d along a target pixel ray must project onto
    the [near, far] epipolar segment of that pixel in every source view
    (the projective image of a ray is a straight line)."""
    b = make_batch(rng, B=1, S=3, H=48, W=64)
    tar_ixt = np.asarray(b["tar_ixt"])[0]
    tar_ext = np.asarray(b["tar_ext"])[0]
    near, far = np.asarray(b["near_far"])[0]
    pts = np.array([[20.0, 12.0], [40.0, 30.0], [10.0, 40.0]], np.float32)
    for s in range(3):
        src_ixt = np.asarray(b["src_ixts"])[0, s]
        src_ext = np.asarray(b["src_exts"])[0, s]
        segs = epipolar_segments(
            pts, tar_ixt, tar_ext, src_ixt, src_ext, near, far
        )
        for d in (near, 0.5 * (near + far), far):
            mid = epipolar_segments(
                pts, tar_ixt, tar_ext, src_ixt, src_ext, d, d
            )[:, 0]
            # collinearity: cross product of (mid-near_end, far_end-near_end)
            a = mid - segs[:, 0]
            c = segs[:, 1] - segs[:, 0]
            cross = np.abs(a[:, 0] * c[:, 1] - a[:, 1] * c[:, 0])
            norm = np.linalg.norm(c, axis=-1) + 1e-6
            assert (cross / norm < 1e-2).all()
            # and between the endpoints
            t = np.sum(a * c, axis=-1) / np.sum(c * c, axis=-1)
            assert (t >= -1e-4).all() and (t <= 1 + 1e-4).all()


def test_corner_points_on_texture(rng):
    img = rng.uniform(0, 1, (40, 56, 3)).astype(np.float32)
    pts = corner_points(img, 8)
    assert pts.shape == (8, 2)
    assert (pts[:, 0] >= 0).all() and (pts[:, 0] < 56).all()
    assert (pts[:, 1] >= 0).all() and (pts[:, 1] < 40).all()
    # flat image falls back to a grid
    flat = corner_points(np.zeros((40, 56)), 4)
    assert flat.shape == (4, 2)


def test_epipolar_check_figure_writes_png(rng, tmp_path):
    b = make_batch(rng, B=1, S=3, H=48, W=64)
    b["tar_img"] = rng.uniform(0, 1, (1, 48, 64, 3)).astype(np.float32)
    out = str(tmp_path / "epipolar.png")
    segs = epipolar_check_figure(b, out, num_points=6)
    assert os.path.exists(out) and os.path.getsize(out) > 0
    assert segs.shape == (3, 6, 2, 2)


def test_depth_prob_figure_writes_png(rng, tmp_path):
    H, W, D = 24, 32, 16
    dv = np.linspace(2.0, 6.0, D)
    logits = rng.normal(0, 1, (D, H, W))
    prob = np.exp(logits) / np.exp(logits).sum(0)
    depth = (prob * dv[:, None, None]).sum(0)
    std = np.sqrt((prob * (dv[:, None, None] - depth) ** 2).sum(0))
    out = str(tmp_path / "prob.png")
    data = depth_prob_figure(depth, std, prob, dv, (10, 12), out)
    assert os.path.exists(out) and os.path.getsize(out) > 0
    np.testing.assert_allclose(data["prob"], prob[:, 10, 12])
    np.testing.assert_allclose(data["depth"], depth[10, 12])
