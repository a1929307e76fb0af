"""The offline checkpoint-conversion CLI (scripts/convert_reference_ckpt.py)
round-trips seeded reference-layout state dicts for BOTH backbone families
into restorable framework checkpoints (reference train_net.py saves
{'net': network.state_dict(), ...})."""

import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(pth, out_dir, *extra):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts/convert_reference_ckpt.py"),
         pth, out_dir, *extra],
        cwd=REPO, env=env, capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr
    assert "saved to" in res.stdout


def _restored_param_count(out_dir) -> int:
    import jax

    from boostmvsnerfs_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(out_dir)
    assert mgr.latest_path() is not None
    restored = mgr.restore(None)
    assert restored is not None and "params" in restored
    return sum(
        int(np.asarray(v).size)
        for v in jax.tree_util.tree_leaves(restored["params"])
    )


def test_convert_cli_enerf(tmp_path):
    from tests.test_weight_port import (
        TorchCostReg,
        TorchFeatureNet,
        TorchMinCostReg,
        TorchNeRFHead,
    )

    sd = {}
    sd.update({f"feature_net.{k}": v for k, v in
               TorchFeatureNet().state_dict().items()})
    sd.update({f"cost_reg_0.{k}": v for k, v in
               TorchMinCostReg(32).state_dict().items()})
    sd.update({f"cost_reg_1.{k}": v for k, v in
               TorchCostReg(16).state_dict().items()})
    sd.update({f"nerf_0.{k}": v for k, v in
               TorchNeRFHead(35).state_dict().items()})
    sd.update({f"nerf_1.{k}": v for k, v in
               TorchNeRFHead(11).state_dict().items()})
    pth = str(tmp_path / "latest.pth")
    torch.save({"net": sd}, pth)
    out = str(tmp_path / "out_enerf")
    _run_cli(pth, out)
    n_sd = sum(
        int(np.prod(tuple(v.shape)))
        for k, v in sd.items() if "num_batches_tracked" not in k
    )
    assert _restored_param_count(out) > 0.5 * n_sd  # rest in batch_stats


def test_convert_cli_mvsnerf(tmp_path):
    from tests.test_mvsnerf_port import (
        TorchMVSCostReg,
        TorchMVSFeature,
        TorchRenderer,
    )

    sd = {}
    sd.update({f"feature.{k}": v
               for k, v in TorchMVSFeature().state_dict().items()})
    sd.update({f"cost_reg_2.{k}": v
               for k, v in TorchMVSCostReg(41).state_dict().items()})
    sd.update({f"nerf.nerf.{k}": v
               for k, v in TorchRenderer().state_dict().items()})
    pth = str(tmp_path / "latest.pth")
    torch.save({"net": sd}, pth)
    out = str(tmp_path / "out_mvsnerf")
    _run_cli(pth, out, "--family", "mvsnerf")
    assert _restored_param_count(out) > 0
