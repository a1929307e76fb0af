"""Custom-capture CLI scripts (reference BoostMVSNeRFs_DEMO.ipynb flow:
imgs2poses equivalent + COLMAP database seeding)."""

import os
import subprocess
import sys

import numpy as np

from boostmvsnerfs_tpu.utils import colmap
from boostmvsnerfs_tpu.utils.colmap_db import ColmapDB
from tests.test_colmap import _toy_model

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_capture_to_llff_cli(tmp_path, rng):
    scene = tmp_path / "scene1"
    model_dir = scene / "sparse" / "0"
    model_dir.mkdir(parents=True)
    cams, images, pts = _toy_model(rng)
    colmap.write_model(cams, images, pts, str(model_dir))

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "capture_to_llff.py"),
         str(scene)],
        capture_output=True, text=True, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr
    pb = np.load(scene / "poses_bounds.npy")
    assert pb.shape == (2, 17)
    want = colmap.colmap_to_poses_bounds(cams, images, pts)
    np.testing.assert_allclose(pb, want)


def test_capture_to_llff_init_db(tmp_path):
    scene = tmp_path / "scene2"
    (scene / "images").mkdir(parents=True)
    for i in range(3):
        (scene / "images" / f"{i:06d}.jpg").write_bytes(b"")

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "capture_to_llff.py"),
         str(scene), "--init-db",
         "60", "60", "32", "24", "64", "48"],
        capture_output=True, text=True, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr
    with ColmapDB.open(str(scene / "database.db")) as db:
        cams = db.cameras()
        imgs = db.images()
    assert len(cams) == 1 and len(imgs) == 3
    (cam,) = cams.values()
    assert cam["prior_focal"] and cam["width"] == 64
    np.testing.assert_allclose(cam["params"], [60, 60, 32, 24])
