"""Per-stage profile of the BoostMVSNeRF staged eval pipeline.

MVSNERF_BENCH_r04 measured 177.6k rays/s (MFU 0.040) with no stage
breakdown. This times each StagedMVSNeRF stage separately — features,
per-combo volume build (warp + 3D U-Net), one row-block render (tri-sample
+ img-sample + MLP), blend — each jitted alone and synced on one output
leaf, then the whole pipeline, at the same geometry as the bench
(224x352, K=4, D=32).

Usage: python scripts/profile_mvsnerf.py [--iters 3] [--rows 28]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync1(out):
    # fetch ONE element (ravel on device first): device_get of the whole
    # leaf would drag megabytes through the tunnel and swamp the timing
    leaf = jax.tree_util.tree_leaves(out)[-1]
    jax.block_until_ready(leaf)
    np.asarray(jax.device_get(leaf.ravel()[0]))


def _t(fn, *args, iters=3):
    _sync1(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync1(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=224)
    ap.add_argument("--width", type=int, default=352)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--rows", type=int, default=28)
    args = ap.parse_args()

    from boostmvsnerfs_tpu.models.boost_enerf import view_combinations
    from boostmvsnerfs_tpu.models.boost_mvsnerf import BoostMVSNeRF
    from boostmvsnerfs_tpu.models.mvsnerf import MVSNeRFConfig, mvs_proj_mats
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
        print(f"# windows: vol_h={cfg.pallas_vol_window_h} "
              f"vol_z={cfg.pallas_vol_window_z} "
              f"img_h={cfg.pallas_img_window_h} "
              f"G={cfg.pallas_depth_group}", file=sys.stderr)
    model = BoostMVSNeRF(cfg=cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        {**batch, "ray_idx_0": batch["ray_idx_0"][:, :256]},
        False,
    )
    staged = StagedMVSNeRF(model, row_chunk=args.rows)

    # replicate the staged __call__'s folding to drive stages in isolation
    from boostmvsnerfs_tpu.models.boost_enerf import _take_views

    B = batch["all_src_inps"].shape[0]
    K = cfg.k_best
    sel = jnp.take(batch["combos"], batch["k_best"], axis=0)
    I = sel.shape[-1]

    def fold(x):
        g = _take_views(x, sel.reshape(B, K * I))
        return g.reshape(B * K, I, *x.shape[2:])

    def rep(x):
        return jnp.repeat(x, K, axis=0)

    dt = _t(staged._features, variables, batch["all_src_inps"],
            iters=args.iters)
    print(json.dumps({"stage": "features", "ms": round(dt * 1e3, 2)}))

    feats_all = staged._features(variables, batch["all_src_inps"])
    sub = {
        "src_inps": fold(batch["all_src_inps"]),
        "src_exts": fold(batch["all_src_exts"]),
        "src_ixts": fold(batch["all_src_ixts"]),
        "tar_ext": rep(batch["tar_ext"]),
        "tar_ixt": rep(batch["tar_ixt"]),
    }
    feats = fold(feats_all)
    dr = fold(batch["depth_ranges"])
    near = jnp.min(dr[..., 0], axis=1) * cfg.near_far_scale[0]
    far = jnp.max(dr[..., 1], axis=1) * cfg.near_far_scale[1]
    t = jnp.linspace(0.0, 1.0, cfg.num_samples)
    dv = near[:, None] * (1 - t) + far[:, None] * t
    pm = mvs_proj_mats(sub["src_ixts"], sub["src_exts"])

    dt = _t(staged._volume, variables, sub["src_inps"], feats, pm, dv,
            iters=args.iters)
    print(json.dumps({"stage": "volume_build_k4", "ms": round(dt * 1e3, 2)}))

    volume = staged._volume(variables, sub["src_inps"], feats, pm, dv)
    blocks = staged._ray_blocks(batch["ray_idx_0"], W)
    ridx0 = rep(blocks[0])
    dt = _t(staged._render[True], variables, sub, volume, ridx0, near, far,
            iters=args.iters)
    print(json.dumps({
        "stage": "render_block", "ms": round(dt * 1e3, 2),
        "blocks_per_frame": len(blocks),
        "est_frame_ms": round(dt * 1e3 * len(blocks), 1),
    }))

    raw = staged._render[True](variables, sub, volume, ridx0, near, far)
    raws = raw["net_output"].reshape(B, K, *raw["net_output"].shape[1:])
    masks = raw["mask"].reshape(B, K, *raw["mask"].shape[1:])
    zs = raw["z_vals"].reshape(B, K, *raw["z_vals"].shape[1:])
    dt = _t(staged._blend, raws, masks, zs, iters=args.iters)
    print(json.dumps({"stage": "blend_block", "ms": round(dt * 1e3, 2)}))

    dt = _t(staged, variables, batch, iters=args.iters)
    print(json.dumps({
        "stage": "full_frame", "ms": round(dt * 1e3, 2),
        "rays_per_sec": round(H * W / dt, 1),
    }))


if __name__ == "__main__":
    main()
