"""End-to-end runner tests over the synthetic Free fixture (CPU)."""

import os

import numpy as np
import pytest
import yaml

from boostmvsnerfs_tpu.config import make_cfg
from tests.test_data import H_IMG, W_IMG, _write_free_scene

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    ws = tmp_path_factory.mktemp("ws")
    _write_free_scene(str(ws / "Free"), "grass")
    return str(ws)


def _write_cfg(path, workspace, boost=False):
    cfg = {
        "task": "evaluate",
        "exp_name": "boost" if boost else "base",
        "workspace": workspace,
        "network_module": (
            "boostmvsnerfs_tpu.models.boost_enerf"
            if boost
            else "boostmvsnerfs_tpu.models.enerf"
        ),
        "train_dataset_module": "boostmvsnerfs_tpu.data.free",
        "test_dataset_module": "boostmvsnerfs_tpu.data.free",
        "scene": "grass",
        "save_result": False,
        "eval_lpips": False,
        "enerf": {
            "train_input_views": [2, 3, 4],
            "test_input_views": 4 if boost else 3,
            "viewdir_agg": True,
            "eval_depth": False,
            "require_view_selection": boost,
            "cost_volume_input_views": 3,
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
                "render_if": [True, True],
                "num_samples": [8, 2],
                "num_rays": [64, 128],
                "train_img": [True, True],
                "loss_weight": [0.1, 1.0],
                "k_best": 2,
            },
        },
        "train_dataset": {"data_root": "Free", "split": "train",
                          "input_h_w": [H_IMG, W_IMG]},
        "test_dataset": {"data_root": "Free", "split": "test",
                         "input_h_w": [H_IMG, W_IMG]},
        "train": {"batch_size": 1, "lr": 5e-4, "epoch": 1,
                  "scheduler": {"type": "exponential", "gamma": 0.5,
                                "decay_epochs": 50},
                  "sampler_meta": {}},
        "test": {"batch_size": 1},
        "ep_iter": 2,
        "save_ep": 1,
        "save_latest_ep": 1,
        "eval_ep": 0,
        "log_interval": 1,
    }
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)


def test_evaluate_base_enerf(workspace, tmp_path):
    cfg_path = str(tmp_path / "cfg.yaml")
    _write_cfg(cfg_path, workspace, boost=False)
    cfg = make_cfg(cfg_path)
    from boostmvsnerfs_tpu.runner import run_evaluate

    ret = run_evaluate(cfg)
    assert np.isfinite(ret["psnr"])
    assert "fps" in ret


def test_evaluate_boost_with_view_selection(workspace, tmp_path):
    cfg_path = str(tmp_path / "cfg.yaml")
    _write_cfg(cfg_path, workspace, boost=True)
    import yaml as _yaml

    with open(cfg_path) as f:
        d = _yaml.safe_load(f)
    d["eval_lpips"] = True  # runs on fixture weights -> uncalibrated key
    with open(cfg_path, "w") as f:
        _yaml.safe_dump(d, f)
    cfg = make_cfg(cfg_path)
    from boostmvsnerfs_tpu.runner import run_evaluate, view_selection_path

    ret = run_evaluate(cfg)
    assert np.isfinite(ret["psnr"])
    # LPIPS runs without special setup; fixture weights are reported under
    # an explicit uncalibrated key, never as 'lpips'
    assert np.isfinite(ret["lpips_uncalibrated"])
    assert "lpips" not in ret
    assert os.path.exists(view_selection_path(cfg))
    import json

    vs = json.load(open(view_selection_path(cfg)))
    assert len(vs) == 2  # two test views in the fixture
    for v in vs.values():
        assert len(v) == 2  # k_best entries


def test_train_smoke(workspace, tmp_path):
    cfg_path = str(tmp_path / "cfg.yaml")
    _write_cfg(cfg_path, workspace, boost=False)
    cfg = make_cfg(cfg_path)
    cfg.exp_name = "train_smoke"
    from boostmvsnerfs_tpu.config import finalize_cfg

    finalize_cfg(cfg)
    from boostmvsnerfs_tpu.runner import run_train

    state = run_train(cfg)
    assert int(np.asarray(state.step)) == 2
    # checkpoint written and resumable
    from boostmvsnerfs_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(cfg.trained_model_dir)
    assert mgr.latest_path() is not None


def test_train_boost_with_view_subsampling(workspace, tmp_path):
    """Boost training end to end: the view-selection pass runs over train
    loaders, and train batches carry FEWER source views than the selection
    saw (view-count sampler) — cached combo ids must clamp into the batch's
    smaller combo table instead of indexing out of range."""
    cfg_path = str(tmp_path / "cfg.yaml")
    _write_cfg(cfg_path, workspace, boost=True)
    import yaml as _yaml

    with open(cfg_path) as f:
        d = _yaml.safe_load(f)
    d["exp_name"] = "boost_train_smoke"
    d["task"] = "train"
    # every train batch subsamples to 3 source views -> C(3,3)=1 combo,
    # while view selection over the full 4-view loaders has C(4,3)=4
    d["train"]["sampler_meta"] = {
        "input_views_num": [3], "input_views_prob": [1.0]
    }
    with open(cfg_path, "w") as f:
        _yaml.safe_dump(d, f)
    cfg = make_cfg(cfg_path)
    from boostmvsnerfs_tpu.config import finalize_cfg

    finalize_cfg(cfg)
    from boostmvsnerfs_tpu.runner import run_train

    state = run_train(cfg)
    assert int(np.asarray(state.step)) == 2


def test_render_novel_path_boost_greedy(workspace, tmp_path):
    """Novel-path frames run the greedy coverage selection per frame (not a
    first-K placeholder)."""
    cfg_path = str(tmp_path / "cfg.yaml")
    _write_cfg(cfg_path, workspace, boost=True)
    cfg = make_cfg(cfg_path)
    cfg.exp_name = "boost_path_smoke"
    cfg.write_video = False
    from boostmvsnerfs_tpu.config import finalize_cfg

    finalize_cfg(cfg)
    from boostmvsnerfs_tpu.runner import render_novel_path

    render_novel_path(cfg, n_frames=1)
    import glob

    pngs = glob.glob(os.path.join(cfg.result_dir, "color_*.png"))
    assert len(pngs) == 1


def test_evaluate_mvsnerf(workspace, tmp_path):
    import yaml as _yaml

    cfg_path = str(tmp_path / "cfg.yaml")
    _write_cfg(cfg_path, workspace, boost=False)
    with open(cfg_path) as f:
        d = _yaml.safe_load(f)
    d["network_module"] = "boostmvsnerfs_tpu.models.mvsnerf"
    d["exp_name"] = "mvsnerf"
    d["enerf"]["cas_config"].update(
        {"num": 1, "depth_inv": [False], "volume_scale": [0.25],
         "volume_planes": [8], "im_feat_scale": [0.25],
         "im_ibr_scale": [0.25], "render_scale": [1.0],
         "render_im_feat_level": [0], "nerf_model_feat_ch": [32],
         "render_if": [True], "num_samples": [8], "num_rays": [64],
         "train_img": [False], "loss_weight": [1.0]}
    )
    d["mvsnerf"] = {"pad": 8}
    with open(cfg_path, "w") as f:
        _yaml.safe_dump(d, f)
    cfg = make_cfg(cfg_path)
    from boostmvsnerfs_tpu.runner import run_evaluate

    ret = run_evaluate(cfg)
    assert np.isfinite(ret["psnr"])


def test_evaluate_boost_mvsnerf(workspace, tmp_path):
    import yaml as _yaml

    cfg_path = str(tmp_path / "cfg.yaml")
    _write_cfg(cfg_path, workspace, boost=True)
    with open(cfg_path) as f:
        d = _yaml.safe_load(f)
    d["network_module"] = "boostmvsnerfs_tpu.models.boost_mvsnerf"
    d["exp_name"] = "boost_mvsnerf"
    d["enerf"]["cas_config"].update(
        {"num": 1, "depth_inv": [False], "volume_scale": [0.25],
         "volume_planes": [8], "im_feat_scale": [0.25],
         "im_ibr_scale": [0.25], "render_scale": [1.0],
         "render_im_feat_level": [0], "nerf_model_feat_ch": [32],
         "render_if": [True], "num_samples": [8], "num_rays": [64],
         "train_img": [False], "loss_weight": [1.0], "k_best": 2}
    )
    d["mvsnerf"] = {"pad": 8}
    with open(cfg_path, "w") as f:
        _yaml.safe_dump(d, f)
    cfg = make_cfg(cfg_path)
    from boostmvsnerfs_tpu.runner import run_evaluate

    ret = run_evaluate(cfg)
    assert np.isfinite(ret["psnr"])


def test_render_novel_path(workspace, tmp_path):
    cfg_path = str(tmp_path / "cfg.yaml")
    _write_cfg(cfg_path, workspace, boost=False)
    cfg = make_cfg(cfg_path)
    cfg.exp_name = "path_smoke"
    cfg.write_video = False
    from boostmvsnerfs_tpu.config import finalize_cfg

    finalize_cfg(cfg)
    from boostmvsnerfs_tpu.runner import render_novel_path

    render_novel_path(cfg, n_frames=2)
    import glob

    pngs = glob.glob(os.path.join(cfg.result_dir, "color_*.png"))
    assert len(pngs) == 2
