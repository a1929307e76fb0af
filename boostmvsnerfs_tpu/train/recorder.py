"""Training metrics recorder: tensorboard scalars + windowed console stats.

Reference lib/train/recorder.py: SmoothedValue medians over a deque window,
rank-0 gating, step persisted with the checkpoint. Rank-0 here is
``jax.process_index() == 0``.
"""

from __future__ import annotations

from collections import defaultdict, deque

import numpy as np


class SmoothedValue:
    def __init__(self, window_size: int = 20):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0

    def update(self, value: float):
        self.deque.append(value)
        self.count += 1
        self.total += value

    @property
    def median(self) -> float:
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)


class Recorder:
    def __init__(self, record_dir: str | None = None, enabled: bool = True):
        self.enabled = enabled
        self.step = 0
        self.epoch = 0
        self.stats = defaultdict(SmoothedValue)
        self.writer = None
        if enabled and record_dir:
            try:
                from tensorboardX import SummaryWriter

                self.writer = SummaryWriter(log_dir=record_dir)
            except Exception:
                self.writer = None

    def update(self, scalars: dict):
        if not self.enabled:
            return
        for k, v in scalars.items():
            self.stats[k].update(float(v))

    def record(self, prefix: str = "train"):
        if self.writer is None:
            return
        for k, v in self.stats.items():
            self.writer.add_scalar(f"{prefix}/{k}", v.median, self.step)

    def state_dict(self) -> dict:
        return {"step": self.step}

    def load_state_dict(self, d: dict):
        self.step = int(d.get("step", 0))

    def __str__(self):
        return "  ".join(
            f"{k}: {v.median:.4f}" for k, v in sorted(self.stats.items())
        )
