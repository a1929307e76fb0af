"""Bisect the full-geometry train step: forward-only vs fwd+bwd vs +adam.

profile_train.py's isolated stages sum to ~3s while the integrated step
measures ~6.9s at ANY ray_blocks — this pins down whether the gap is the
backward-pass structure, the optimizer, or the loss assembly, by jitting
the EXACT blocked training loss (parallel/train.make_blocked_loss) three
ways at the same geometry.
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
        leaf = jax.tree_util.tree_leaves(out)[0]
        jax.block_until_ready(leaf)
        np.asarray(jax.device_get(leaf.ravel()[0]))

    t0 = time.perf_counter()
    sync(fn(*args))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times), compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=736)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--ray-blocks", type=int, default=16)
    args = ap.parse_args()

    from boostmvsnerfs_tpu.models.boost_enerf import BoostENeRF
    from boostmvsnerfs_tpu.models.enerf import CascadeConfig
    from boostmvsnerfs_tpu.parallel.train import (
        create_train_state,
        make_blocked_loss,
        make_blocked_train_step,
    )
    from boostmvsnerfs_tpu.train.schedule import make_optimizer
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

    fwd_only = jax.jit(
        lambda p, bs, b: loss(p, bs, b)[0]
    )
    dt, cs = _t(fwd_only, variables["params"], variables["batch_stats"],
                batch, iters=args.iters)
    print(json.dumps({"stage": "blocked_loss_forward_only",
                      "seconds": round(dt, 3),
                      "compile_s": round(cs, 1)}), flush=True)

    vag = jax.jit(
        lambda p, bs, b: jax.value_and_grad(
            lambda q: loss(q, bs, b)[0]
        )(p)[0]
    )
    dt, cs = _t(vag, variables["params"], variables["batch_stats"], batch,
                iters=args.iters)
    print(json.dumps({"stage": "blocked_loss_fwd_bwd",
                      "seconds": round(dt, 3),
                      "compile_s": round(cs, 1)}), flush=True)

    # with the aux outputs (updated BN stats + scalar stats) kept alive
    vag_aux = jax.jit(
        lambda p, bs, b: jax.value_and_grad(
            lambda q: loss(q, bs, b), has_aux=True
        )(p)[0][0]
    )
    dt, cs = _t(vag_aux, variables["params"], variables["batch_stats"],
                batch, iters=args.iters)
    print(json.dumps({"stage": "blocked_loss_fwd_bwd_aux",
                      "seconds": round(dt, 3),
                      "compile_s": round(cs, 1)}), flush=True)

    tx = make_optimizer({"lr": 5e-5, "optim": "adam", "eps": 1e-8},
                        ep_iter=500)

    # fwd+bwd+aux+optimizer, WITHOUT the TrainState plumbing
    import optax

    opt_state0 = tx.init(variables["params"])

    @jax.jit
    def vag_opt(p, bs, b, opt):
        (l, _), g = jax.value_and_grad(
            lambda q: loss(q, bs, b), has_aux=True
        )(p)
        updates, new_opt = tx.update(g, opt, p)
        return l, optax.apply_updates(p, updates), new_opt

    dt, cs = _t(vag_opt, variables["params"], variables["batch_stats"],
                batch, opt_state0, iters=args.iters)
    print(json.dumps({"stage": "blocked_loss_fwd_bwd_aux_adam",
                      "seconds": round(dt, 3),
                      "compile_s": round(cs, 1)}), flush=True)

    state = create_train_state(model, tx, batch, variables=variables)
    step = make_blocked_train_step(model, tx, args.ray_blocks)
    dt, cs = _t(lambda s, b: step(s, b)[1]["loss"], state, batch,
                iters=args.iters)
    print(json.dumps({"stage": "full_step_with_adam",
                      "seconds": round(dt, 3),
                      "compile_s": round(cs, 1)}), flush=True)


if __name__ == "__main__":
    main()
