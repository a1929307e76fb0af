"""Fine-tune train-step throughput at the Free-dataset geometry.

Compares the round-1 training path (windowed warp + gather sampling) against
the fast path (Pallas warp-variance custom VJP + structured windowed
sampling) on the flagship BoostENeRF K=4 fused model with full-image
training rays — the per-scene fine-tuning regime
(configs/exps/finetune/enerf_ours/free/base.yaml; reference
lib/train/trainers/trainer.py:44-93 drives the same step).

Usage:
  python scripts/bench_train.py [--height 480 --width 736 --iters 3]
      [--modes fast,baseline] [--model boost|enerf] [--json out.json]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(jax.device_get(leaf.ravel()[0]))
    return out


MODES = {
    # round-1 training path: windowed warp autodiff, gather render sampling
    "baseline": dict(warp_mode="windowed", eval_sampling="gather"),
    # fast path: Pallas warp VJP + structured windowed sampling under train
    "fast": dict(warp_mode="pallas", eval_sampling="pallas"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=736)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--modes", default="baseline,fast")
    ap.add_argument("--model", default="boost", choices=("boost", "enerf"))
    ap.add_argument("--n-views", type=int, default=6)
    ap.add_argument("--ray-blocks", type=int, default=0,
                    help="ray-blocked remat step (memory-bounded backward;"
                         " enables full 480x736 full-image training on one"
                         " chip)")
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    from boostmvsnerfs_tpu.models.boost_enerf import BoostENeRF
    from boostmvsnerfs_tpu.models.enerf import CascadeConfig, ENeRF
    from boostmvsnerfs_tpu.parallel.train import (
        create_train_state,
        make_train_step,
    )
    from boostmvsnerfs_tpu.train.schedule import make_optimizer
    from boostmvsnerfs_tpu.utils.init_utils import init_variables
    from boostmvsnerfs_tpu.utils.synthetic import make_scene_batch

    H, W = args.height, args.width
    boost = args.model == "boost"
    np_batch = make_scene_batch(
        B=1, n_views=args.n_views, H=H, W=W, boost=boost,
        k_best=4, with_targets=True, seed=0,
    )
    batch = {k: jnp.asarray(v) for k, v in np_batch.items()}
    n_rays = int(batch["ray_idx_1"].shape[1])

    results = {}
    for mode in args.modes.split(","):
        cas = CascadeConfig(k_best=4, warp_dtype="float32", **MODES[mode])
        model = (BoostENeRF if boost else ENeRF)(cas=cas)
        variables = jax.device_put(init_variables(model, np_batch))
        tx = make_optimizer(
            {"lr": 5e-5, "optim": "adam", "eps": 1e-8}, ep_iter=500
        )
        state = create_train_state(model, tx, batch, variables=variables)
        if args.ray_blocks > 1:
            from boostmvsnerfs_tpu.parallel.train import (
                make_blocked_train_step,
            )

            step = make_blocked_train_step(model, tx, args.ray_blocks)
        else:
            step = make_train_step(model, tx)

        t0 = time.perf_counter()
        state, stats = step(state, batch)
        _sync(stats)
        compile_s = time.perf_counter() - t0

        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            state, stats = step(state, batch)
            _sync(stats)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        results[mode] = {
            "step_seconds": dt,
            "rays_per_sec": n_rays / dt,
            "compile_seconds": compile_s,
            "loss": float(stats["loss"]),
        }
        print(
            json.dumps(
                {
                    "metric": f"train_step_{args.model}_{mode}"
                    + (f"_rb{args.ray_blocks}" if args.ray_blocks > 1 else ""),
                    "value": round(n_rays / dt, 1),
                    "unit": "rays/s",
                    "step_seconds": round(dt, 4),
                }
            ),
            flush=True,
        )

    if "fast" in results and "baseline" in results:
        speedup = (
            results["baseline"]["step_seconds"]
            / results["fast"]["step_seconds"]
        )
        print(json.dumps({"metric": "train_step_speedup",
                          "value": round(speedup, 3), "unit": "x"}))
        results["speedup"] = speedup
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
