"""Config system: attribute-access dict tree + recursive YAML inheritance.

Mirrors the semantics of the reference config layer (lib/config/config.py:170-188
``make_cfg``: recursive ``parent_cfg`` merge, then CLI dotted-key overrides with
an ``other_opts`` escape hatch) without the yacs dependency. Values are plain
Python; the tree is hashable-freezable so that static render settings can be
passed through ``jax.jit`` as static arguments.
"""

from __future__ import annotations

import copy
import os
from typing import Any, Iterator

import yaml


class CfgNode(dict):
    """Dict with attribute access and recursive merge.

    Unlike yacs (reference lib/config/yacs.py) this node stays mutable; call
    :meth:`freeze_hashable` to obtain an immutable, hashable snapshot usable as
    a jit static argument.
    """

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __deepcopy__(self, memo):
        node = CfgNode()
        for k, v in self.items():
            node[k] = copy.deepcopy(v, memo)
        return node

    @staticmethod
    def from_dict(d: dict) -> "CfgNode":
        node = CfgNode()
        for k, v in d.items():
            node[k] = CfgNode.from_dict(v) if isinstance(v, dict) else v
        return node

    def to_dict(self) -> dict:
        return {
            k: v.to_dict() if isinstance(v, CfgNode) else v for k, v in self.items()
        }

    def merge_from(self, other: dict) -> None:
        """Recursively merge ``other`` into self (other wins)."""
        for k, v in other.items():
            if isinstance(v, dict) and isinstance(self.get(k), dict):
                sub = self[k]
                if not isinstance(sub, CfgNode):
                    sub = CfgNode.from_dict(sub)
                    self[k] = sub
                sub.merge_from(v)
            else:
                self[k] = CfgNode.from_dict(v) if isinstance(v, dict) else v

    def merge_from_list(self, opts: list) -> None:
        """CLI-style overrides: ["a.b.c", "1", "x", "[1,2]"] pairs.

        Stops at the literal token ``other_opts`` (reference
        lib/config/config.py:182-186).
        """
        if "other_opts" in opts:
            opts = opts[: opts.index("other_opts")]
        assert len(opts) % 2 == 0, f"override list must be key/value pairs: {opts}"
        for key, raw in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                if p not in node or not isinstance(node[p], dict):
                    node[p] = CfgNode()
                node = node[p]
            node[parts[-1]] = _parse_value(raw, node.get(parts[-1]))

    def freeze_hashable(self) -> "FrozenCfg":
        return FrozenCfg(self)


def _parse_value(raw: Any, old: Any) -> Any:
    if not isinstance(raw, str):
        return raw
    try:
        val = yaml.safe_load(raw)
    except yaml.YAMLError:
        val = raw
    if isinstance(val, str):
        # YAML 1.1 does not recognize "1e-3"-style floats; fall back to float()
        try:
            val = float(val)
        except ValueError:
            pass
    if old is not None and isinstance(old, bool) and isinstance(val, int):
        val = bool(val)
    return val


class FrozenCfg:
    """Immutable, hashable view of a CfgNode — usable as a jit static arg."""

    __slots__ = ("_items", "_hash")

    def __init__(self, node: dict):
        items = []
        for k in sorted(node.keys()):
            v = node[k]
            if isinstance(v, dict):
                v = FrozenCfg(v)
            elif isinstance(v, list):
                v = tuple(
                    FrozenCfg(x) if isinstance(x, dict) else x for x in v
                )
            items.append((k, v))
        object.__setattr__(self, "_items", tuple(items))
        object.__setattr__(self, "_hash", hash(self._items))

    def __getattr__(self, name: str) -> Any:
        for k, v in self._items:
            if k == name:
                return v
        raise AttributeError(name)

    def __getitem__(self, name: str) -> Any:
        return getattr(self, name)

    def __contains__(self, name: str) -> bool:
        return any(k == name for k, _ in self._items)

    def get(self, name: str, default: Any = None) -> Any:
        try:
            return getattr(self, name)
        except AttributeError:
            return default

    def keys(self) -> Iterator[str]:
        return (k for k, _ in self._items)

    def __hash__(self) -> int:
        return self._hash

    def __eq__(self, other: object) -> bool:
        return isinstance(other, FrozenCfg) and self._items == other._items

    def __repr__(self) -> str:
        return f"FrozenCfg({dict(self._items)!r})"


# ---------------------------------------------------------------------------
# Defaults — the subset of reference lib/config/config.py:8-141 defaults that
# the TPU framework uses, plus TPU-specific knobs.
# ---------------------------------------------------------------------------

def default_cfg() -> CfgNode:
    cfg = CfgNode.from_dict(
        {
            "task": "hello",
            "exp_name": "default",
            "exp_name_tag": "",
            "pretrain": "",
            "workspace": os.environ.get("workspace", "workspace"),
            "scene": "",
            "save_result": False,
            "clear_result": False,
            "save_tag": "default",
            "eval_lpips": True,
            "skip_eval": False,
            "fix_random": False,
            # enable jax_debug_nans during training (the analog of the
            # reference's torch anomaly detection / NaN ipdb traps)
            "debug_nans": False,
            # write a jax.profiler trace of the eval loop to this directory
            "profile_dir": "",
            "resume": True,
            "ep_iter": -1,
            "save_ep": 1,
            "save_latest_ep": 1,
            "eval_ep": 1,
            "log_interval": 20,
            "write_video": False,
            # component selection (module-path factories, as in the reference)
            "train_dataset_module": "",
            "test_dataset_module": "",
            "network_module": "",
            "loss_module": "",
            "evaluator_module": "",
            "visualizer_module": "",
            "train_dataset": {},
            "test_dataset": {},
            "train": {
                "epoch": 300,
                "optim": "adam",
                "lr": 5e-4,
                "weight_decay": 0.0,
                "eps": 1e-8,
                "batch_size": 1,
                "shuffle": True,
                "scheduler": {"type": "exponential", "gamma": 0.5, "decay_epochs": 50},
                "batch_sampler": "default",
                "sampler_meta": {},
                "num_workers": 0,
                "collator": "default",
            },
            "test": {
                "batch_size": 1,
                "batch_sampler": "default",
                "sampler_meta": {},
                "collator": "default",
            },
            # TPU-specific
            "mesh": {"data": 1, "rays": 1},
            "precision": {"compute_dtype": "float32", "conv_dtype": "bfloat16"},
        }
    )
    return cfg


def load_cfg_file(path: str, cfg: CfgNode | None = None) -> CfgNode:
    """Load a YAML config following the recursive ``parent_cfg`` chain
    (reference lib/config/config.py:171-180)."""
    if cfg is None:
        cfg = default_cfg()
    with open(path, "r") as f:
        current = yaml.safe_load(f) or {}
    if "parent_cfg" in current:
        cfg = load_cfg_file(current["parent_cfg"], cfg)
        current = {k: v for k, v in current.items() if k != "parent_cfg"}
    cfg.merge_from(current)
    return cfg


def make_cfg(cfg_file: str, opts: list | None = None) -> CfgNode:
    cfg = default_cfg()
    # site-local default overrides (the reference merges an empty-by-default
    # configs/default.yaml before every experiment config)
    site_default = os.path.join("configs", "default.yaml")
    if os.path.exists(site_default) and os.path.abspath(
        site_default
    ) != os.path.abspath(cfg_file):
        cfg = load_cfg_file(site_default, cfg)
    cfg = load_cfg_file(cfg_file, cfg)
    if opts:
        cfg.merge_from_list(list(opts))
    finalize_cfg(cfg)
    return cfg


def finalize_cfg(cfg: CfgNode) -> None:
    """Derive result/record/model dirs (reference lib/config/config.py:157-168)."""
    if cfg.get("exp_name_tag"):
        cfg.exp_name = f"{cfg.exp_name}_{cfg.exp_name_tag}"
    ws = cfg.workspace
    cfg.trained_model_dir = os.path.join(ws, "trained_model", cfg.task, cfg.exp_name)
    cfg.record_dir = os.path.join(ws, "record", cfg.task, cfg.exp_name)
    cfg.result_dir = os.path.join(
        ws, "result", cfg.task, cfg.exp_name, cfg.get("save_tag", "default")
    )
