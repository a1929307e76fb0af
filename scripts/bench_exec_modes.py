"""Drift-controlled comparison of flagship-render execution modes.

Interleaves, within ONE process/session on the TPU chip:
  * staged-split  — StagedENeRF(fuse_levels=False): 6-stage pipeline (r4)
  * staged-fused  — StagedENeRF(fuse_levels=True): features + one program
                    per cascade level (3 dispatches)
  * monolithic    — single jit of the whole forward (1 dispatch;
                    BENCH_MONO=0 skips its long first compile)
and for each, both per-frame-sync latency and pipelined throughput
(BENCH_DEPTH frames dispatched back-to-back, one sync): the per-frame
sync pays one tunnel round-trip per frame, which is measurement overhead
for a video-rendering workload, while the pipelined number is the real
frames/second the executor sustains.

Prints one JSON line per mode.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    leaf = out["rgb_level1"] if "rgb_level1" in out else (
        jax.tree_util.tree_leaves(out)[-1]
    )
    jax.block_until_ready(leaf)
    np.asarray(jax.device_get(leaf.ravel()[0]))


def _sync_all(out):
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(jax.device_get(leaf.ravel()[0]))


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


def main():
    from boostmvsnerfs_tpu.models.boost_enerf import BoostENeRF
    from boostmvsnerfs_tpu.models.enerf import CascadeConfig
    from boostmvsnerfs_tpu.parallel.staged import StagedENeRF
    from boostmvsnerfs_tpu.utils.autotune import (
        tune_cascade_windows_calibrated,
    )
    from boostmvsnerfs_tpu.utils.compile_cache import enable_compile_cache
    from boostmvsnerfs_tpu.utils.init_utils import init_variables
    from boostmvsnerfs_tpu.utils.synthetic import make_scene_batch

    enable_compile_cache()
    H = int(os.environ.get("BENCH_H", 480))
    W = int(os.environ.get("BENCH_W", 736))
    iters = int(os.environ.get("BENCH_ITERS", 6))
    depth = int(os.environ.get("BENCH_DEPTH", 4))
    k_best = 4

    render_if = (
        (True, True) if os.environ.get("BENCH_RENDER_ALL") == "1"
        else (False, True)
    )
    cas = CascadeConfig(k_best=k_best, render_if=render_if)
    np_batch = make_scene_batch(
        B=1, n_views=6, H=H, W=W, boost=True, k_best=k_best, seed=0,
        rig="forward",
    )
    variables = init_variables(BoostENeRF(cas=cas), np_batch)
    if os.environ.get("BENCH_AUTOTUNE", "1") == "1":
        cas = tune_cascade_windows_calibrated(np_batch, cas, variables)
        print(f"# windows: img_h={cas.pallas_img_window_h} "
              f"img_w={cas.pallas_img_window_w}", file=sys.stderr)
    model = BoostENeRF(cas=cas)
    batch = {k: jnp.asarray(v) for k, v in np_batch.items()}
    variables = jax.device_put(variables)

    modes = {
        "staged_split": StagedENeRF(model, fuse_levels=False),
        "staged_fused": StagedENeRF(model, fuse_levels=True),
        "staged_frame": StagedENeRF(model, fuse_frame=True),
    }
    skip = os.environ.get("BENCH_SKIP", "").split(",")
    modes = {k: v for k, v in modes.items() if k not in skip}
    if os.environ.get("BENCH_MONO", "1") == "1":
        modes["monolithic"] = jax.jit(lambda v, b: model.apply(v, b, False))

    for name, fwd in modes.items():
        t0 = time.perf_counter()
        _sync_all(fwd(variables, batch))
        print(f"# {name} warmup {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)

    n_rays = batch["ray_idx_1"].shape[1]
    lat = {m: [] for m in modes}
    thr = {m: [] for m in modes}
    for _ in range(iters):
        for name, fwd in modes.items():
            t0 = time.perf_counter()
            _sync(fwd(variables, batch))
            lat[name].append(time.perf_counter() - t0)
        for name, fwd in modes.items():
            t0 = time.perf_counter()
            out = None
            for _ in range(depth):
                out = fwd(variables, batch)
            _sync(out)
            thr[name].append((time.perf_counter() - t0) / depth)
    for name in modes:
        dt_l, dt_t = _median(lat[name]), _median(thr[name])
        print(json.dumps({
            "mode": name,
            "frame_ms_latency": round(dt_l * 1e3, 2),
            "frame_ms_pipelined": round(dt_t * 1e3, 2),
            "rays_per_sec_latency": round(n_rays / dt_l, 1),
            "rays_per_sec_pipelined": round(n_rays / dt_t, 1),
            "spread_ms": [round(min(lat[name]) * 1e3, 1),
                          round(max(lat[name]) * 1e3, 1)],
        }))


if __name__ == "__main__":
    main()
