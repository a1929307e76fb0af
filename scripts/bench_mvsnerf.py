"""Benchmark: novel-view render throughput of the second flagship
(BoostMVSNeRF K=4 fused render) at the reference's mvsnerf evaluation
geometry (224x352, 6 source views — configs/exps/evaluate/mvsnerf_ours/
scannet_plus_eval.yaml) on one TPU chip.

Prints ONE JSON line {"metric": "boost_mvsnerf_render_rays_per_sec", ...}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync_all(out):
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(jax.device_get(leaf.ravel()[0]))
    return out


def _sync_frame(out):
    leaf = out["rgb_level0"]
    jax.block_until_ready(leaf)
    np.asarray(jax.device_get(leaf.ravel()[0]))
    return out


def main():
    from boostmvsnerfs_tpu.models.boost_enerf import view_combinations
    from boostmvsnerfs_tpu.models.boost_mvsnerf import BoostMVSNeRF
    from boostmvsnerfs_tpu.models.mvsnerf import MVSNeRFConfig
    from boostmvsnerfs_tpu.utils.synthetic import make_scene_batch

    H = int(os.environ.get("BENCH_H", 224))
    W = int(os.environ.get("BENCH_W", 352))
    n_views, k_best, D = 6, 4, 32
    iters = int(os.environ.get("BENCH_ITERS", 6))

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
    batch = {k: jnp.asarray(v) for k, v in np_batch.items() if k != "meta"}

    cfg = MVSNeRFConfig(num_samples=D, k_best=k_best)
    if os.environ.get("BENCH_AUTOTUNE", "1") == "1":
        from boostmvsnerfs_tpu.utils.autotune import tune_mvsnerf_windows

        cfg = tune_mvsnerf_windows(np_batch, cfg)
        print("# tuned windows:",
              {"vol_h": cfg.pallas_vol_window_h,
               "vol_z": cfg.pallas_vol_window_z,
               "img_h": cfg.pallas_img_window_h,
               "depth_group": cfg.pallas_depth_group},
              file=sys.stderr)
    model = BoostMVSNeRF(cfg=cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        {**batch, "ray_idx_0": batch["ray_idx_0"][:, :256]},
        False,
    )
    # row-block staged executor: the monolithic forward materializes ~20GB
    # of per-sample features at this geometry (parallel/staged.py)
    from boostmvsnerfs_tpu.parallel.staged import StagedMVSNeRF

    staged = StagedMVSNeRF(model, row_chunk=int(os.environ.get("BENCH_ROWS", 28)))
    fwd = staged
    _sync_all(fwd(variables, batch))  # compile + warm up

    # pipelined throughput (the sustained frames/s of a trajectory render)
    # + single-frame latency incl. the per-frame tunnel round-trip — same
    # protocol as the flagship bench.py
    depth_frames = int(os.environ.get("BENCH_DEPTH", 3))
    times, lat = [], []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync_frame(fwd(variables, batch))
        lat.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        out = None
        for _ in range(depth_frames):
            out = fwd(variables, batch)
        _sync_frame(out)
        times.append((time.perf_counter() - t0) / depth_frames)

    n_rays = H * W
    times.sort()
    dt = times[len(times) // 2]
    from boostmvsnerfs_tpu.utils.roofline import mvsnerf_speed_of_light

    sol = mvsnerf_speed_of_light(H, W, dt, k_best=k_best, D=D)
    print(
        json.dumps(
            {
                "metric": "boost_mvsnerf_render_rays_per_sec",
                "value": round(n_rays / dt, 1),
                "unit": "rays/s",
                "fps": round(1.0 / dt, 3),
                "frame_ms_latency": round(
                    sorted(lat)[len(lat) // 2] * 1e3, 2
                ),
                "height": H,
                "width": W,
                "mfu": round(sol["mfu"], 4),
                "sol_pct": round(sol["sol_pct"], 4),
                "gflops_per_view": round(sol["gflops_per_view"], 1),
            }
        )
    )


if __name__ == "__main__":
    main()
