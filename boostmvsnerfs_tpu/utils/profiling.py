"""Profiling utilities (reference lib/utils/net_utils.py:31-70 ``perf_timer``).

The reference brackets CUDA timing with ``torch.cuda.synchronize``; the TPU
equivalents are ``block_until_ready`` bracketed wall timers plus
``jax.profiler`` device traces viewable in TensorBoard / Perfetto.
"""

from __future__ import annotations

import contextlib
import time

import jax


class perf_timer:
    """Device-synchronized wall timer.

    >>> with perf_timer("render") as t:
    ...     out = fn(x)
    ...     t.sync(out)          # block on the computation being timed
    """

    def __init__(self, name: str = "", enabled: bool = True):
        self.name = name
        self.enabled = enabled
        self.elapsed = 0.0

    def sync(self, out):
        jax.block_until_ready(out)
        return out

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        if self.enabled and self.name:
            print(f"[perf] {self.name}: {self.elapsed * 1e3:.2f} ms")
        return False


@contextlib.contextmanager
def device_trace(logdir: str | None):
    """jax.profiler trace scope; no-op when ``logdir`` is falsy.

    View with ``tensorboard --logdir <dir>`` (profile plugin) or upload the
    .trace.json.gz to Perfetto.
    """
    if not logdir:
        yield
        return
    with jax.profiler.trace(logdir):
        yield


def annotate(name: str):
    """Named trace annotation for a code region (shows up in the profile)."""
    return jax.profiler.TraceAnnotation(name)
