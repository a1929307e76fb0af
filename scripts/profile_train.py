"""Stage-level profile of the full-geometry fine-tune train step.

TRAIN_BENCH_FULL_r04 measured 7.34 s/step at 480x736 K=4 with the
ray-blocked remat backward, but nothing said WHERE the time goes. This
times, separately jitted and separately synced, the fwd+bwd of each
pipeline piece at the same geometry:

  * features       — 6-view FPN, d(loss)/d(params)
  * volume[i]      — warp + cost-reg + depth regression per level
                     (grad wrt params AND the incoming features)
  * render[i]      — ONE ray block of the fused render+blend
                     (grad wrt params and the volume inputs), scaled by
                     the block count for the per-step estimate
  * full step      — make_blocked_train_step for reference

Each measurement syncs on a scalar loss, so tunnel RTT is one fetch per
stage. Prints one JSON line per stage.

Usage: python scripts/profile_train.py [--height 480 --width 736]
       [--ray-blocks 16] [--iters 2]
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


def _t(fn, *args, iters=2):
    def sync(out):
        # one-element fetch (ravel on device first — fetching the whole
        # leaf would drag megabytes through the tunnel into the timing)
        leaf = jax.tree_util.tree_leaves(out)[0]
        jax.block_until_ready(leaf)
        np.asarray(jax.device_get(leaf.ravel()[0]))

    sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=736)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--ray-blocks", type=int, default=16)
    ap.add_argument("--full", action="store_true",
                    help="also run the whole blocked train step")
    ap.add_argument("--skip-stages", action="store_true",
                    help="only the full step (for ray-block sweeps)")
    args = ap.parse_args()

    from boostmvsnerfs_tpu.models.boost_enerf import BoostENeRF, _take_views
    from boostmvsnerfs_tpu.models.enerf import CascadeConfig, ENeRF
    from boostmvsnerfs_tpu.ops import render as render_ops
    from boostmvsnerfs_tpu.utils.compile_cache import enable_compile_cache
    from boostmvsnerfs_tpu.utils.init_utils import init_variables
    from boostmvsnerfs_tpu.utils.synthetic import make_scene_batch

    enable_compile_cache()
    H, W = args.height, args.width
    K = 4
    cas = CascadeConfig(k_best=K, warp_dtype="float32")
    model = BoostENeRF(cas=cas)
    np_batch = make_scene_batch(
        B=1, n_views=6, H=H, W=W, boost=True, k_best=K, with_targets=True,
        seed=0,
    )
    batch = {k: jnp.asarray(v) for k, v in np_batch.items()}
    variables = jax.device_put(init_variables(model, np_batch))
    params, bstats = variables["params"], variables["batch_stats"]

    B = batch["all_src_inps"].shape[0]
    sel = jnp.take(batch["combos"], batch["k_best"], axis=0)
    I = sel.shape[-1]

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

    if not args.skip_stages:
        # ---- features fwd+bwd -------------------------------------------------
        @jax.jit
        def feat_grad(p):
            def f(p):
                out, _ = model.apply(
                    {"params": p, "batch_stats": bstats},
                    batch["all_src_inps"], True, mutable=["batch_stats"],
                    method=ENeRF.extract_features,
                )
                return sum(jnp.sum(v) for v in out.values())

            v, g = jax.value_and_grad(f)(p)
            # keep the backward alive (a discarded grad tree is DCE'd,
            # silently measuring the forward only)
            return v + jax.tree_util.tree_reduce(
                lambda a, x: a + jnp.sum(x), g, 0.0
            )

        print(json.dumps({"stage": "features_fwd_bwd",
                          "seconds": round(_t(feat_grad, params,
                                              iters=args.iters), 3)}))

        # ---- per-level volume fwd+bwd ----------------------------------------
        @jax.jit
        def feats_only(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": bstats}, batch["all_src_inps"],
                True, mutable=["batch_stats"], method=ENeRF.extract_features,
            )
            return out

        feats = {lvl: fold(f) for lvl, f in feats_only(params).items()}
        prev = None
        vols = {}
        for i in range(cas.num):
            def vol_grad_fn(p, fe, prev=prev, i=i):
                (fv, depth, std, nf), _ = model.apply(
                    {"params": p, "batch_stats": bstats}, i, fe,
                    sub["src_exts"], sub["src_ixts"], sub["tar_ext"],
                    sub["tar_ixt"], sub["near_far"], prev, True,
                    mutable=["batch_stats"], method=ENeRF.build_level_volume,
                )
                return jnp.sum(depth) + jnp.sum(fv) + jnp.sum(std), (
                    fv, depth, std, nf,
                )

            def _vol_probe(p, fe, i=i, prev=prev):
                v, g = jax.value_and_grad(
                    lambda p2, f2: vol_grad_fn(p2, f2, prev, i)[0],
                    argnums=(0, 1),
                )(p, fe)
                return v + jax.tree_util.tree_reduce(
                    lambda a, x: a + jnp.sum(x), g, 0.0
                )

            vol_grad = jax.jit(_vol_probe)
            print(json.dumps({"stage": f"volume{i}_fwd_bwd",
                              "seconds": round(_t(vol_grad, params, feats,
                                                  iters=args.iters), 3)}))
            vols[i] = jax.jit(
                lambda p, fe, i=i, prev=prev: vol_grad_fn(p, fe, prev, i)[1]
            )(params, feats)
            prev = vols[i][1:]

        # ---- one render+blend ray block fwd+bwd ------------------------------
        for i in range(cas.num):
            if not cas.render_if[i]:
                continue
            fv, depth, std, nf = vols[i]
            ray_idx = batch[f"ray_idx_{i}"]
            N = ray_idx.shape[1]
            nb = args.ray_blocks if N % args.ray_blocks == 0 else 1
            ridx = rep(ray_idx[:, : N // nb])

            def rb_fn(p, fe, fv, depth, std, i=i, nf=nf, ridx=ridx):
                o = model.apply(
                    {"params": p, "batch_stats": bstats}, i, fe, fv, depth,
                    std, nf, sub, ridx, True, True,
                    method=ENeRF.render_level,
                )
                raws = o["net_output"].reshape(B, K, *o["net_output"].shape[1:])
                masks = render_ops.normalize_blend_masks(
                    o["mask"].reshape(B, K, *o["mask"].shape[1:])
                )
                z = o["z_vals"].reshape(B, K, *o["z_vals"].shape[1:])
                return jnp.sum(
                    render_ops.composite_blend(raws, masks, z)["rgb"] ** 2
                )

            def _rb_probe(p, fe, fv, d, s, i=i):
                v, g = jax.value_and_grad(
                    rb_fn, argnums=(0, 1, 2, 3, 4)
                )(p, fe, fv, d, s)
                return v + jax.tree_util.tree_reduce(
                    lambda a, x: a + jnp.sum(x), g, 0.0
                )

            rb_grad = jax.jit(_rb_probe)
            dt = _t(rb_grad, params, feats, fv, depth, std, iters=args.iters)
            print(json.dumps({
                "stage": f"render{i}_block_fwd_bwd",
                "seconds": round(dt, 3),
                "blocks_per_step": nb,
                "est_step_seconds": round(dt * nb, 2),
            }))

        # ---- whole blocked step ----------------------------------------------
    if args.full:
        from boostmvsnerfs_tpu.parallel.train import (
            create_train_state,
            make_blocked_train_step,
        )
        from boostmvsnerfs_tpu.train.schedule import make_optimizer

        tx = make_optimizer(
            {"lr": 5e-5, "optim": "adam", "eps": 1e-8}, ep_iter=500
        )
        state = create_train_state(model, tx, batch, variables=variables)
        step = make_blocked_train_step(model, tx, args.ray_blocks)

        t0 = time.perf_counter()
        state, stats = step(state, batch)
        np.asarray(jax.device_get(stats["loss"]))
        print(json.dumps({"stage": "full_step_compile",
                          "seconds": round(time.perf_counter() - t0, 1)}))
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            state, stats = step(state, batch)
            np.asarray(jax.device_get(stats["loss"]))
            times.append(time.perf_counter() - t0)
        print(json.dumps({"stage": "full_step",
                          "seconds": round(min(times), 3)}))


if __name__ == "__main__":
    main()
