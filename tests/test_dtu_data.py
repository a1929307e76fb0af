"""DTU dataset loader over a synthetic on-disk fixture."""

import os

import imageio.v2 as imageio
import numpy as np
import pytest

from boostmvsnerfs_tpu.data.dtu import DTUDataset
from boostmvsnerfs_tpu.data.formats import write_pfm
from boostmvsnerfs_tpu.models.enerf import CascadeConfig
from tests.helpers import look_at_ext

CAS = CascadeConfig(volume_planes=(16, 8))
H, W = 64, 96
N_CAMS = 8


def _write_cam(path, ixt, ext, dmin=425.0):
    lines = ["extrinsic"]
    lines += [" ".join(f"{v:.6f}" for v in row) for row in ext]
    lines += ["", "intrinsic"]
    lines += [" ".join(f"{v:.6f}" for v in row) for row in ixt]
    lines += ["", f"{dmin} 2.5"]
    with open(path, "w") as f:
        f.write("\n".join(lines))


@pytest.fixture(scope="module")
def dtu_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dtu"))
    rng = np.random.default_rng(4)
    os.makedirs(os.path.join(root, "Cameras", "train"))
    scene = "scan1"
    os.makedirs(os.path.join(root, "Depths", scene))
    os.makedirs(os.path.join(root, "Rectified", f"{scene}_train"))
    ixt_quarter = np.array(
        [[W * 0.3, 0, W / 8], [0, W * 0.3, H / 8], [0, 0, 1]], np.float32
    )
    for i in range(N_CAMS):
        ext = look_at_ext(
            np.array([600 * np.sin(0.15 * i), 50.0, 600 * np.cos(0.15 * i)])
        )
        _write_cam(
            os.path.join(root, "Cameras/train/{:08d}_cam.txt".format(i)),
            ixt_quarter, ext,
        )
        img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        imageio.imwrite(
            os.path.join(
                root, "Rectified/{}_train/rect_{:03d}_3_r5000.png".format(
                    scene, i + 1)
            ),
            img,
        )
        # PFM depth at 2x the eval crop area: write a (1200, 1600) map so
        # the 1/2-res + crop protocol stays in range
        dpt = rng.uniform(400, 900, (1200, 1600)).astype(np.float32)
        write_pfm(
            os.path.join(root, "Depths/{}/depth_map_{:04d}.pfm".format(scene, i)),
            dpt,
        )
    return root


def test_dtu_dataset_sample(dtu_root):
    ds = DTUDataset(
        dtu_root, "test", CAS, scenes=["scan1"], n_views=3,
        train_ids=[1, 2, 3, 4, 5], val_ids=[0, 6],
    )
    assert len(ds) == 2
    s = ds.get_sample(0)
    assert s["src_inps"].shape == (3, H, W, 3)
    np.testing.assert_allclose(s["near_far"], [425.0, 905.0])
    # intrinsics upscaled 4x from the quarter-res camera files
    np.testing.assert_allclose(s["tar_ixt"][0, 0], W * 0.3 * 4)
    assert "tar_dpt" in s
    assert s["tar_dpt"].shape == (512, 640)


def test_dtu_train_jitter(dtu_root):
    ds = DTUDataset(
        dtu_root, "train", CAS, scenes=["scan1"], n_views=3,
        train_ids=[1, 2, 3, 4, 5], val_ids=[0, 6],
    )
    rng = np.random.default_rng(0)
    picks = {tuple(sorted(ds.jitter_src_views([1, 2, 3, 4], 3, rng)))
             for _ in range(20)}
    assert len(picks) > 1  # actually samples different subsets
    for p in picks:
        assert len(p) == 3
