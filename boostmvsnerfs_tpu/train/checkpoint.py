"""Checkpoint I/O with the reference's retention policy.

Reference lib/utils/net_utils.py:390-412 (``save_model``): numbered
checkpoints + rolling ``latest``, pruning beyond the 5 most recent;
:350-387 (``load_model``) resume; :495-515 (``load_pretrain``) cross-task
warm start. Implemented over orbax PyTree checkpointing.
"""

from __future__ import annotations

import os
import shutil

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class CheckpointManager:
    def __init__(self, model_dir: str, keep: int = 5):
        self.model_dir = os.path.abspath(model_dir)
        self.keep = keep
        os.makedirs(self.model_dir, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()

    # -- save -----------------------------------------------------------
    def save(self, state_tree, epoch: int, latest: bool = True):
        tree = _to_numpy_tree(state_tree)
        path = os.path.join(self.model_dir, str(epoch))
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckptr.save(path, tree)
        if latest:
            lpath = os.path.join(self.model_dir, "latest")
            if os.path.exists(lpath):
                shutil.rmtree(lpath)
            self._ckptr.save(lpath, tree)
        self._gc()

    def _gc(self):
        epochs = self.numbered_epochs()
        for e in epochs[: -self.keep]:
            shutil.rmtree(os.path.join(self.model_dir, str(e)), ignore_errors=True)

    def numbered_epochs(self) -> list[int]:
        out = []
        if not os.path.isdir(self.model_dir):
            return out
        for d in os.listdir(self.model_dir):
            if d.isdigit():
                out.append(int(d))
        return sorted(out)

    # -- load -----------------------------------------------------------
    def latest_path(self) -> str | None:
        lpath = os.path.join(self.model_dir, "latest")
        if os.path.isdir(lpath):
            return lpath
        epochs = self.numbered_epochs()
        if epochs:
            return os.path.join(self.model_dir, str(epochs[-1]))
        return None

    def restore(self, target_tree=None, path: str | None = None):
        path = path or self.latest_path()
        if path is None:
            return None
        if target_tree is not None:
            return self._ckptr.restore(path, item=_to_numpy_tree(target_tree))
        return self._ckptr.restore(path)


def load_pretrain(pretrain_dir: str, target_tree):
    """Warm-start network weights from another task's latest checkpoint
    (reference net_utils.py:495-515) — restores only matching subtrees."""
    mgr = CheckpointManager(pretrain_dir)
    return mgr.restore(target_tree)
