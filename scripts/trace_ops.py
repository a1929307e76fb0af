"""Op-level device-time attribution for a jitted program.

Runs a target computation under ``jax.profiler.trace`` (perfetto export)
and aggregates device-stream op durations by fusion/op name — the
table-producing tool behind PROFILE_r05's device-trace sections (the
reference's analog is nvprof over its CUDA renderer,
reference lib/networks/enerf/network.py:76-113).

Targets:
  train      blocked-loss fwd+bwd at full geometry (the 6.9 s step)
  train_l1   ONLY the level-1 render blocks fwd+bwd, isolated
  mvsnerf    StagedMVSNeRF frame
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def run_traced(fn, args_, logdir, iters=1):
    """Warm up, then trace ``iters`` calls; returns the trace dir."""
    out = fn(*args_)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args_)
    jax.block_until_ready(out)
    wall = time.perf_counter() - t0
    print(f"# warm wall: {wall:.3f}s", flush=True)
    with jax.profiler.trace(logdir, create_perfetto_trace=True):
        for _ in range(iters):
            out = fn(*args_)
        jax.block_until_ready(out)
    return logdir, wall


def aggregate(logdir, top=45, device_only=True, iters=1):
    """Aggregate per-op durations from the perfetto trace json."""
    paths = sorted(
        glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        print("no perfetto trace found under", logdir)
        return
    with gzip.open(paths[-1], "rt") as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])
    # map pid/tid -> track name; device streams are named like "/device:TPU:0"
    pids, tids = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    per_op = defaultdict(float)
    per_op_n = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pids.get(e["pid"], "")
        tname = tids.get((e["pid"], e.get("tid")), "")
        on_device = ("TPU" in pname or "XLA Ops" in tname
                     or "device" in pname.lower())
        if device_only and not on_device:
            continue
        # skip host-side python annotation tracks
        if "python" in tname.lower() or "main" in tname.lower():
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        per_op[name] += dur
        per_op_n[name] += 1
        total += dur
    print(f"# device op time total: {total / iters:.1f} ms/iter "
          f"({len(per_op)} distinct ops)")
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{ms / iters:9.2f} ms  x{per_op_n[name] // iters:4d}  "
              f"{name[:110]}")


def build_train(args):
    from boostmvsnerfs_tpu.models.boost_enerf import BoostENeRF
    from boostmvsnerfs_tpu.models.enerf import CascadeConfig
    from boostmvsnerfs_tpu.parallel.train import make_blocked_loss
    from boostmvsnerfs_tpu.utils.compile_cache import enable_compile_cache
    from boostmvsnerfs_tpu.utils.init_utils import init_variables
    from boostmvsnerfs_tpu.utils.synthetic import make_scene_batch

    enable_compile_cache()
    H, W = args.height, args.width
    cas = CascadeConfig(k_best=4, warp_dtype="float32")
    model = BoostENeRF(cas=cas)
    np_batch = make_scene_batch(
        B=1, n_views=6, H=H, W=W, boost=True, k_best=4, with_targets=True,
        seed=0,
    )
    batch = {k: jnp.asarray(v) for k, v in np_batch.items()}
    variables = jax.device_put(init_variables(model, np_batch))
    loss = make_blocked_loss(model, args.ray_blocks)
    vag = jax.jit(
        lambda p, bs, b: jax.value_and_grad(
            lambda q: loss(q, bs, b)[0]
        )(p)
    )
    return vag, (variables["params"], variables["batch_stats"], batch)


def build_mvsnerf(args):
    from boostmvsnerfs_tpu.models.boost_enerf import view_combinations
    from boostmvsnerfs_tpu.models.boost_mvsnerf import BoostMVSNeRF
    from boostmvsnerfs_tpu.models.mvsnerf import MVSNeRFConfig
    from boostmvsnerfs_tpu.parallel.staged import StagedMVSNeRF
    from boostmvsnerfs_tpu.utils.autotune import tune_mvsnerf_windows
    from boostmvsnerfs_tpu.utils.compile_cache import enable_compile_cache
    from boostmvsnerfs_tpu.utils.synthetic import make_scene_batch

    enable_compile_cache()
    H, W = args.height, args.width
    n_views, k_best, D = 6, 4, 32
    np_batch = make_scene_batch(
        B=1, n_views=n_views, H=H, W=W, boost=True, k_best=k_best, seed=0,
        rig="forward", render_scales=(1.0,),
    )
    np_batch["depth_ranges"] = np.tile(
        np.asarray(np_batch["near_far"], np.float32)[:, None, :],
        (1, n_views, 1),
    )
    np_batch["combos"] = np.asarray(view_combinations(n_views, 3))
    np_batch["k_best"] = np.array([[0, 5, 9, 14]], np.int32)
    np_batch["ray_idx_0"] = np.arange(H * W, dtype=np.int32)[None]
    batch = {k: jnp.asarray(v) for k, v in np_batch.items()}
    cfg = MVSNeRFConfig(num_samples=D, k_best=k_best)
    if os.environ.get("BENCH_AUTOTUNE", "1") == "1":
        cfg = tune_mvsnerf_windows(np_batch, cfg)
    model = BoostMVSNeRF(cfg=cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        {**batch, "ray_idx_0": batch["ray_idx_0"][:, :256]},
        False,
    )
    staged = StagedMVSNeRF(model, row_chunk=28)
    fn = lambda b: staged(variables, b)  # noqa: E731
    return fn, (batch,)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("target", choices=["train", "mvsnerf"])
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=736)
    ap.add_argument("--ray-blocks", type=int, default=16)
    ap.add_argument("--iters", type=int, default=1)
    ap.add_argument("--top", type=int, default=45)
    ap.add_argument("--logdir", default="/tmp/trace_ops")
    args = ap.parse_args()

    if args.target == "train":
        fn, fargs = build_train(args)
    else:
        args.height = args.height if args.height != 480 else 224
        args.width = args.width if args.width != 736 else 352
        fn, fargs = build_mvsnerf(args)

    logdir = os.path.join(args.logdir, args.target)
    os.makedirs(logdir, exist_ok=True)
    logdir, wall = run_traced(fn, fargs, logdir, iters=args.iters)
    aggregate(logdir, top=args.top, iters=args.iters)


if __name__ == "__main__":
    main()
