"""Per-piece timing of the volume stages at Free eval geometry (TPU).

Replicates build_level_volume's dataflow piecewise (each piece jitted
separately) to locate the slow component: depth-hypothesis schedule,
fused Pallas warp-variance, 3D cost-reg U-Net, depth regression.
"""

import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from boostmvsnerfs_tpu.models.cost_reg_net import CostRegNet, MinCostRegNet
from boostmvsnerfs_tpu.ops import cost_volume, render
from boostmvsnerfs_tpu.ops.pallas.warp_variance import fused_warp_variance

REPEAT = int(os.environ.get("BENCH_REPEAT", 10))


def sync(o):
    for leaf in jax.tree_util.tree_leaves(o):
        np.asarray(jax.device_get(leaf.ravel()[0]))
    return o


def timeit(name, fn, *a):
    out = sync(fn(*a))
    t0 = time.perf_counter()
    sync(out)
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(REPEAT):
        out = fn(*a)
    sync(out)
    print(f"{name:36s} {(time.perf_counter()-t0-rtt)/REPEAT*1e3:8.2f}ms",
          flush=True)
    return out


def level(name, BK, S, Hf, Wf, C, D, Hv, Wv, window_h, reg_cls, inv):
    rng = np.random.default_rng(0)
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    feats = f32(BK, S, Hf, Wf, C)
    pm = jnp.tile(jnp.eye(4)[:3][None, None], (BK, S, 1, 1)).astype(jnp.float32)
    near_far = jnp.tile(jnp.asarray([[2.0, 6.0]], jnp.float32), (BK, 1))

    dv = timeit(
        f"{name} initial_depth_values",
        jax.jit(partial(cost_volume.initial_depth_values, D=D, H=Hv, W=Wv,
                        inverse=inv)),
        near_far,
    )
    vol = timeit(
        f"{name} fused_warp_variance",
        partial(fused_warp_variance, window_h=window_h,
                compute_dtype=jnp.bfloat16),
        feats, pm, dv,
    )
    reg = reg_cls()
    rv = reg.init(jax.random.PRNGKey(0), vol[:, :, :16, :16], False)
    fv, logits = timeit(
        f"{name} cost_reg",
        jax.jit(lambda v, x: reg.apply(v, x, False)),
        rv, vol,
    )
    timeit(
        f"{name} depth_regression",
        jax.jit(partial(render.depth_regression, inverse=inv)),
        logits, dv,
    )
    if name == "L0":
        # cascade refinement for the next level
        depth = jnp.abs(f32(BK, Hv, Wv)) + 2.0
        std = jnp.abs(f32(BK, Hv, Wv)) * 0.1
        nf_map = cost_volume.depth_values_near_far(dv, inv)
        timeit(
            "L0->L1 refined_depth_values",
            jax.jit(partial(cost_volume.refined_depth_values, D=8,
                            H=Hv * 2, W=Wv * 2, prev_inverse=inv,
                            inverse=False)),
            depth, std, nf_map,
        )


def main():
    BK, S = 4, 3
    H, W = 480, 736
    # level 0: feats 1/4 (120x184x32), volume D=64 at 1/8 (60x92)
    level("L0", BK, S, H // 4, W // 4, 32, 64, H // 8, W // 8, 8,
          MinCostRegNet, True)
    # level 1: feats 1/2 (240x368x16), volume D=8 at 1/2 (240x368)
    level("L1", BK, S, H // 2, W // 2, 16, 8, H // 2, W // 2, 8,
          CostRegNet, False)


if __name__ == "__main__":
    main()
