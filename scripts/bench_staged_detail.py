"""Per-stage timing of the staged BoostENeRF pipeline at eval geometry."""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from boostmvsnerfs_tpu.models.boost_enerf import BoostENeRF
from boostmvsnerfs_tpu.models.enerf import CascadeConfig
from boostmvsnerfs_tpu.parallel.staged import StagedENeRF, _render_batch
from boostmvsnerfs_tpu.models.boost_enerf import _take_views
from boostmvsnerfs_tpu.utils.synthetic import make_scene_batch


def sync(out):
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(jax.device_get(leaf.ravel()[0]))
    return out


def timeit(name, fn, *args, iters=3, reps=None):
    """Amortized stage timing: REPS back-to-back dispatches between host
    syncs, so the per-sync tunnel round-trip (~100ms on the axon remote
    backend) is divided across reps instead of polluting every sample."""
    reps = reps or int(os.environ.get("BENCH_REPS", 10))
    t0 = time.perf_counter()
    out = sync(fn(*args))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        sync(out)
        ts.append((time.perf_counter() - t0) / reps)
    print(f"{name:28s} compile {compile_s:6.1f}s  exec {min(ts)*1e3:8.1f}ms",
          flush=True)
    return out


def main():
    H = int(os.environ.get("BENCH_H", 480))
    W = int(os.environ.get("BENCH_W", 736))
    K = 4
    cas = CascadeConfig(k_best=K)
    np_batch = make_scene_batch(B=1, n_views=6, H=H, W=W, boost=True,
                                k_best=K, seed=0,
                                rig=os.environ.get("BENCH_RIG", "forward"))
    if os.environ.get("BENCH_AUTOTUNE", "1") == "1":
        # match bench.py: per-scene kernel-window tuning
        from boostmvsnerfs_tpu.utils.autotune import tune_cascade_windows

        cas = tune_cascade_windows(np_batch, cas)
        print("autotuned:", {"warp_h": cas.pallas_window_h,
                             "img_h": cas.pallas_img_window_h,
                             "img_w": cas.pallas_img_window_w}, flush=True)
    model = BoostENeRF(cas=cas)
    batch = {k: jnp.asarray(v) for k, v in np_batch.items()}
    from boostmvsnerfs_tpu.utils.init_utils import init_variables

    variables = jax.device_put(init_variables(model, np_batch))
    staged = StagedENeRF(model)

    B = 1
    sel = jnp.take(batch["combos"], batch["k_best"], axis=0)
    I = sel.shape[-1]

    feats_all = timeit("features (6 views)", staged._features, variables,
                       batch["all_src_inps"])

    def fold(x):
        g = _take_views(x, sel.reshape(B, K * I))
        return g.reshape(B * K, I, *x.shape[2:])

    def rep(x):
        return jnp.repeat(x, K, axis=0)

    sub = {
        "src_inps": fold(batch["all_src_inps"]),
        "src_exts": fold(batch["all_src_exts"]),
        "src_ixts": fold(batch["all_src_ixts"]),
        "tar_ext": rep(batch["tar_ext"]),
        "tar_ixt": rep(batch["tar_ixt"]),
        "near_far": rep(batch["near_far"]),
    }
    feats = {lvl: fold(f) for lvl, f in feats_all.items()}

    prev = None
    for i in range(cas.num):
        out = timeit(
            f"volume level {i}", staged._volume[i], variables, feats,
            sub["src_exts"], sub["src_ixts"], sub["tar_ext"], sub["tar_ixt"],
            sub["near_far"], prev,
        )
        feat_vol, depth, std, nf_map = out
        prev = (depth, std, nf_map)
        raw_out = timeit(
            f"render level {i}", staged._render[(i, True)], variables, feats,
            feat_vol, depth, std, nf_map, _render_batch(sub),
            rep(batch[f"ray_idx_{i}"]),
        )
        raws = raw_out["net_output"].reshape(B, K, *raw_out["net_output"].shape[1:])
        masks = raw_out["mask"].reshape(B, K, *raw_out["mask"].shape[1:])
        zs = raw_out["z_vals"].reshape(B, K, *raw_out["z_vals"].shape[1:])
        depth0 = depth.reshape(B, K, *depth.shape[1:])[:, 0]
        std0 = std.reshape(B, K, *std.shape[1:])[:, 0]
        timeit(f"blend level {i}", staged._blend[i], raws, masks, zs, depth0,
               std0)


if __name__ == "__main__":
    main()
