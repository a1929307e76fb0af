"""End-to-end DTU evaluation: run_evaluate drives the DTU depth metrics.

The reference's DTU evaluation entry (configs/exps/evaluate/enerf/dtu_eval.yaml
+ lib/evaluators/enerf.py:89-103) reports abs / acc@2mm / acc@10mm for both the
NeRF depth and the MVS depth next to PSNR/SSIM. This exercises the same loop
over a synthetic on-disk DTU fixture, sized so the fixed 1/2-res + crop depth
protocol (data/dtu.py read_depth) lands exactly on the fixture image size.
"""

import os

import imageio.v2 as imageio
import numpy as np
import pytest
import yaml

from boostmvsnerfs_tpu.config import make_cfg
from boostmvsnerfs_tpu.data.formats import write_pfm
from tests.helpers import look_at_ext
from tests.test_dtu_data import _write_cam

pytestmark = pytest.mark.slow

# crop is [44:556, 80:720] of the half-res map (reference
# lib/datasets/dtu/enerf_base.py:85-87); a (216, 352) PFM halves to
# (108, 176) so the crop yields exactly (64, 96) = the fixture image size
H_IMG, W_IMG = 64, 96
N_CAMS = 6


@pytest.fixture(scope="module")
def dtu_ws(tmp_path_factory):
    ws = tmp_path_factory.mktemp("ws")
    root = str(ws / "dtu")
    rng = np.random.default_rng(11)
    scene = "scan1"
    os.makedirs(os.path.join(root, "Cameras", "train"))
    os.makedirs(os.path.join(root, "Depths", scene))
    os.makedirs(os.path.join(root, "Rectified", f"{scene}_train"))
    ixt_quarter = np.array(
        [[W_IMG * 0.3, 0, W_IMG / 8], [0, W_IMG * 0.3, H_IMG / 8], [0, 0, 1]],
        np.float32,
    )
    for i in range(N_CAMS):
        ext = look_at_ext(
            np.array([600 * np.sin(0.15 * i), 50.0, 600 * np.cos(0.15 * i)])
        )
        _write_cam(
            os.path.join(root, "Cameras/train/{:08d}_cam.txt".format(i)),
            ixt_quarter, ext,
        )
        img = rng.integers(0, 255, (H_IMG, W_IMG, 3), dtype=np.uint8)
        imageio.imwrite(
            os.path.join(
                root, "Rectified/{}_train/rect_{:03d}_3_r5000.png".format(
                    scene, i + 1)
            ),
            img,
        )
        dpt = rng.uniform(430, 900, (2 * (44 + H_IMG), 2 * (80 + W_IMG)))
        write_pfm(
            os.path.join(
                root, "Depths/{}/depth_map_{:04d}.pfm".format(scene, i)
            ),
            dpt.astype(np.float32),
        )
    return str(ws)


def test_run_evaluate_dtu_depth_metrics(dtu_ws, tmp_path):
    cfg_path = str(tmp_path / "dtu_eval.yaml")
    cfg_d = {
        "task": "evaluate",
        "exp_name": "enerf_dtu",
        "save_tag": "dtu",
        "workspace": dtu_ws,
        "network_module": "boostmvsnerfs_tpu.models.enerf",
        "train_dataset_module": "boostmvsnerfs_tpu.data.dtu",
        "test_dataset_module": "boostmvsnerfs_tpu.data.dtu",
        "scene": "scan1",
        "save_result": False,
        "eval_lpips": False,
        "enerf": {
            "train_input_views": [2, 3, 4],
            "test_input_views": 3,
            "viewdir_agg": True,
            "eval_depth": True,
            "cas_config": {
                "num": 2,
                "depth_inv": [True, False],
                "volume_scale": [0.125, 0.5],
                "volume_planes": [16, 8],
                "im_feat_scale": [0.25, 0.5],
                "im_ibr_scale": [0.25, 1.0],
                "render_scale": [0.25, 1.0],
                "render_im_feat_level": [0, 2],
                "nerf_model_feat_ch": [32, 8],
                # the DTU eval config renders only the fine level
                # (reference configs/exps/evaluate/enerf/base_eval.yaml)
                "render_if": [False, True],
                "num_samples": [8, 2],
                "num_rays": [64, 128],
                "train_img": [True, True],
                "loss_weight": [0.1, 1.0],
            },
        },
        "train_dataset": {"data_root": "dtu", "split": "train",
                          "train_ids": [1, 2, 3, 4], "val_ids": [0, 5]},
        "test_dataset": {"data_root": "dtu", "split": "test",
                         "train_ids": [1, 2, 3, 4], "val_ids": [0, 5]},
        "train": {"batch_size": 1, "lr": 5e-4, "epoch": 1,
                  "scheduler": {"type": "exponential", "gamma": 0.5,
                                "decay_epochs": 50},
                  "sampler_meta": {}},
        "test": {"batch_size": 1},
    }
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg_d, f)
    cfg = make_cfg(cfg_path)
    from boostmvsnerfs_tpu.runner import run_evaluate

    ret = run_evaluate(cfg)
    assert np.isfinite(ret["psnr"])
    # DTU depth metrics (reference lib/evaluators/enerf.py:96-103): NeRF +
    # MVS depth, each abs error (mm) + accuracy thresholds in [0, 1]
    for key in ("abs", "acc_2", "acc_10", "mvs_abs", "mvs_acc_2",
                "mvs_acc_10"):
        assert key in ret, key
        assert np.isfinite(ret[key]), key
    for key in ("acc_2", "acc_10", "mvs_acc_2", "mvs_acc_10"):
        assert 0.0 <= ret[key] <= 1.0, key
