"""Benchmark gather-based vs windowed-matmul plane-sweep warp on TPU."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from boostmvsnerfs_tpu.ops import cost_volume


def sync(out):
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(jax.device_get(leaf.ravel()[0]))
    return out


def bench(name, fn, *args, iters=3):
    t0 = time.perf_counter()
    sync(fn(*args))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args))
        times.append(time.perf_counter() - t0)
    print(f"{name:44s} compile {compile_s:7.1f}s  exec {min(times)*1e3:9.2f}ms",
          flush=True)


def main():
    rng = np.random.default_rng(0)
    BK, S = 4, 3

    # level-0 geometry at 480x736: volume 60x92 D=64, feats 120x184@32
    # wait: im_feat_scale=0.25 -> feats 120x184; volume_scale=0.125 -> 60x92
    cases = [
        ("L0 480p", 64, 60, 92, 120, 184, 32, 24, 128),
        ("L1 480p", 8, 240, 368, 240, 368, 16, 16, 416),
    ]
    for name, D, Ht, Wt, Hs, Ws, C, WH, WW in cases:
        feats = jnp.asarray(rng.standard_normal((BK, S, Hs, Ws, C)), jnp.float32)
        pm = []
        for _ in range(BK * S):
            # realistic-ish projection: near-identity + small offset
            m = np.eye(3, 4, dtype=np.float32)
            m[:2, :2] += rng.normal(0, 0.05, (2, 2))
            m[0, 3] = rng.normal(0, 20)
            m[1, 3] = rng.normal(0, 20)
            m[2, 3] = rng.normal(1, 0.1)
            m[:2] *= Ws / Wt / 2 + 0.5
            pm.append(m)
        pm = jnp.asarray(np.stack(pm).reshape(BK, S, 3, 4))
        dv = jnp.asarray(
            np.broadcast_to(np.linspace(2, 8, D)[None, :, None, None],
                            (BK, D, Ht, Wt)), jnp.float32)

        gather = jax.jit(jax.vmap(cost_volume.variance_volume))
        bench(f"{name} gather   D={D} {Ht}x{Wt}", gather, feats, pm, dv)

        win = jax.jit(
            jax.vmap(lambda f, p, d: cost_volume.variance_volume_windowed(
                f, p, d, WH, WW))
        )
        bench(f"{name} windowed D={D} {Ht}x{Wt} w={WH}x{WW}", win, feats, pm, dv)


if __name__ == "__main__":
    main()
