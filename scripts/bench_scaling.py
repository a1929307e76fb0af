"""Ray-throughput scaling-efficiency harness.

Measures rendered rays/s of the flagship model at 1/2/4/.../N devices with
the ray axis sharded over the mesh, and reports per-N efficiency vs linear
scaling — the north-star acceptance metric (BASELINE.json: >=80% ray
throughput scaling at N>=2). The TPU-native analog of the reference's FPS
harness (reference run.py:112-129) extended across a device mesh.

Usage:
  python scripts/bench_scaling.py                      # real backend
  JAX_PLATFORMS=cpu python scripts/bench_scaling.py    # 8 virtual devices
  ... --model enerf|boost --height 256 --width 384 --iters 3

Prints ONE JSON line:
  {"metric": "ray_scaling", "rays_per_sec": {"1": ..., ...},
   "efficiency": {"2": ..., "4": ..., ...}, "devices": N, ...}
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# virtual multi-device CPU mesh must be requested before jax initializes
if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# the site-installed TPU plugin overrides the JAX_PLATFORMS env var; the
# platform must be forced via jax.config before backend initialization
if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    jax.config.update("jax_platforms", "cpu")


def _sync(out):
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(jax.device_get(leaf.ravel()[0]))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=("enerf", "boost"), default="boost")
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=384)
    ap.add_argument("--views", type=int, default=6)
    ap.add_argument("--k-best", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from boostmvsnerfs_tpu.models.boost_enerf import BoostENeRF
    from boostmvsnerfs_tpu.models.enerf import CascadeConfig, ENeRF
    from boostmvsnerfs_tpu.parallel import mesh as mesh_lib
    from boostmvsnerfs_tpu.parallel.train import make_eval_step
    from boostmvsnerfs_tpu.utils.init_utils import init_variables
    from boostmvsnerfs_tpu.utils.synthetic import make_scene_batch

    boost = args.model == "boost"
    cas = CascadeConfig(k_best=args.k_best)
    model = (BoostENeRF if boost else ENeRF)(cas=cas)
    np_batch = make_scene_batch(
        B=1, n_views=args.views, H=args.height, W=args.width,
        boost=boost, k_best=args.k_best, seed=0,
        input_views=cas.cost_volume_input_views if boost else 3,
    )

    devices = jax.devices()
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    n_rays_total = np_batch["ray_idx_1"].shape[1]
    # ray counts divisible by every mesh size measured
    nmax = sizes[-1]
    for i in (0, 1):
        n = (np_batch[f"ray_idx_{i}"].shape[1] // nmax) * nmax
        np_batch[f"ray_idx_{i}"] = np_batch[f"ray_idx_{i}"][:, :n]
    batch = {k: jnp.asarray(v) for k, v in np_batch.items()}
    n_rays_total = batch["ray_idx_1"].shape[1]

    variables = jax.device_put(init_variables(model, np_batch))
    eval_step = make_eval_step(model)

    rays_per_sec = {}
    for n in sizes:
        mesh = mesh_lib.make_mesh(n_data=1, n_rays=n, devices=devices)
        sharded = mesh_lib.shard_batch(mesh, batch)
        _sync(eval_step(variables, sharded))  # compile + warm up
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            _sync(eval_step(variables, sharded))
            times.append(time.perf_counter() - t0)
        rays_per_sec[str(n)] = n_rays_total / min(times)

    base = rays_per_sec[str(sizes[0])]
    efficiency = {
        str(n): rays_per_sec[str(n)] / (n * base) for n in sizes if n > 1
    }
    result = {
        "metric": "ray_scaling",
        "model": args.model,
        "height": args.height,
        "width": args.width,
        "n_rays": n_rays_total,
        "backend": jax.default_backend(),
        "devices": len(devices),
        "rays_per_sec": {k: round(v, 1) for k, v in rays_per_sec.items()},
        "efficiency": {k: round(v, 4) for k, v in efficiency.items()},
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
