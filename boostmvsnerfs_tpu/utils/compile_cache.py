"""Persistent XLA compilation cache.

The staged eval programs compile in seconds, but the fused train-step
variants take ~100s each on the remote TPU compiler. JAX's persistent
compilation cache keys executables by (HLO, compiler flags, device kind),
so repeated invocations of bench/train/run with unchanged programs skip
compilation entirely. The TPU-native analog of the reference relying on
torch's kernel cache being warm (it has no cross-process compile cache at
all — every CUDA run re-JITs nothing but also re-autotunes cudnn).

Off by default only when BOOST_COMPILE_CACHE=0; the cache directory
defaults to ~/.cache/boostmvsnerfs_tpu/xla (override with
BOOST_COMPILE_CACHE_DIR).
"""

from __future__ import annotations

import os

_ENABLED = False


def enable_compile_cache(path: str | None = None) -> str | None:
    """Idempotently enable the persistent compilation cache; returns the
    cache directory (None when disabled or unsupported)."""
    global _ENABLED
    if os.environ.get("BOOST_COMPILE_CACHE", "1") == "0":
        return None
    path = path or os.environ.get(
        "BOOST_COMPILE_CACHE_DIR",
        os.path.join(
            os.path.expanduser("~"), ".cache", "boostmvsnerfs_tpu", "xla"
        ),
    )
    if _ENABLED:
        return path
    try:
        import jax

        if jax.default_backend() == "cpu" and os.environ.get(
            "BOOST_COMPILE_CACHE"
        ) != "1":
            # CPU AOT cache entries record the *compile* machine's CPU
            # features; replaying them on a different host risks SIGILL
            # (and CPU compiles are fast anyway). Opt in explicitly with
            # BOOST_COMPILE_CACHE=1.
            return None
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache every compile that took measurable time; the default 1s
        # threshold would skip the many small staged-eval programs whose
        # *sum* dominates cold-start latency
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _ENABLED = True
        return path
    except Exception:  # unsupported backend/flag set — run uncached
        return None
