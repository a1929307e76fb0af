"""Microbenchmarks of the hot sampling formulations on the real TPU.

Compares, at the Free-eval L1 render geometry (480x736, Ns=2, 12 view-folds)
and the L0 plane-sweep geometry, the windowed interpolation-matmul variants
(row-window vs column-tiled, f32 vs bf16, tiles_per_step) and the XLA gather
path, to locate the actual bottleneck (MXU vs serial lax.map vs gather).
"""

import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from boostmvsnerfs_tpu.ops import cost_volume, sampling

REPEAT = int(os.environ.get("BENCH_REPEAT", 10))


def sync(out):
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(jax.device_get(leaf.ravel()[0]))
    return out


def timeit(name, fn, *args):
    out = sync(fn(*args))
    t0 = time.perf_counter()
    sync(out)
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(REPEAT):
        out = fn(*args)
    sync(out)
    per = (time.perf_counter() - t0 - rtt) / REPEAT
    print(f"{name:44s} {per*1e3:8.2f}ms", flush=True)
    return out


def bench_render_sampler():
    """L1 image-feature sampling: 12 (view,K) folds, 480x736 rays, Ns=2."""
    H_r, W_r, Ns, C = 480, 736, 2, 11
    V = 12  # 3 views x K=4 folded
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((V, H_r, W_r, C)), jnp.float32)
    # smooth raster-projected coords with mild parallax
    yy, xx = np.mgrid[0:H_r, 0:W_r].astype(np.float32)
    coords = []
    for v in range(V):
        dx = 30 * np.sin(yy / 91 + v) + 12 * (xx / W_r)
        dy = 9 * np.cos(xx / 83 + v)
        for s in range(Ns):
            coords.append(np.stack([xx + dx + 3 * s, yy + dy + 2 * s], -1))
    xy = np.stack(coords, 0).reshape(V, Ns, H_r, W_r, 2)
    xy = np.moveaxis(xy, 1, 3)  # (V, H_r, W_r, Ns, 2)
    xy = jnp.asarray(xy.reshape(V, H_r * W_r * Ns, 2))

    def rows(img, xy, cdt):
        tiles = xy.reshape(V, H_r, W_r * Ns, 2)
        return jax.vmap(
            lambda im, c: sampling.windowed_sample_rows(
                im, c, 32, "border", compute_dtype=cdt)
        )(img, tiles)

    def tiles(img, xy, cdt, nx, ww, step):
        t = xy.reshape(V, H_r * nx, (W_r // nx) * Ns, 2)
        return jax.vmap(
            lambda im, c: sampling.windowed_sample_tiles(
                im, c, 32, ww, "border", compute_dtype=cdt,
                tiles_per_step=step)
        )(img, t)

    def gather(img, xy):
        return jax.vmap(
            lambda im, c: sampling.grid_sample_2d(im, c, "border")
        )(img, xy)

    timeit("render: rows f32", jax.jit(partial(rows, cdt=None)), img, xy)
    timeit("render: rows bf16", jax.jit(partial(rows, cdt=jnp.bfloat16)),
           img, xy)
    for nx, ww, step in [(8, 192, 8), (8, 192, 32), (16, 128, 16),
                         (16, 128, 64), (8, 128, 8)]:
        timeit(
            f"render: tiles nx={nx} ww={ww} step={step} bf16",
            jax.jit(partial(tiles, cdt=jnp.bfloat16, nx=nx, ww=ww, step=step)),
            img, xy,
        )
    timeit("render: gather", jax.jit(gather), img, xy)


def bench_warp():
    """L0 plane-sweep warp: 12 (view,K) folds, D=64 planes, 60x92 target."""
    D, Ht, Wt = 64, 60, 92
    Hs, Ws, C = 120, 184, 32
    V = 12
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((V, Hs, Ws, C)), jnp.float32)
    pm = np.tile(np.array([[2.0, 0.02, 3.0, 40.0],
                           [0.01, 2.0, 2.0, 25.0],
                           [0.0, 0.0, 1.0, 0.1]], np.float32), (V, 1, 1))
    pm = jnp.asarray(pm)
    dv = jnp.broadcast_to(
        jnp.linspace(2.0, 6.0, D)[:, None, None], (D, Ht, Wt)
    )
    dvs = jnp.broadcast_to(dv, (V, D, Ht, Wt))

    def var_win(feats, pms, dvs, cdt, cols, ww, wh, rpt):
        return jax.vmap(
            lambda f, p, d: cost_volume.warp_src_view_windowed(
                f, p, d, wh, ww, rows_per_tile=rpt, compute_dtype=cdt,
                cols_per_tile=cols)
        )(feats, pms, dvs)

    def var_gather(feats, pms, dvs):
        return jax.vmap(cost_volume.warp_src_view)(feats, pms, dvs)

    timeit("warp: rows4 full-x f32",
           jax.jit(partial(var_win, cdt=None, cols=0, ww=184, wh=48, rpt=4)),
           feats, pm, dvs)
    timeit("warp: rows4 full-x bf16",
           jax.jit(partial(var_win, cdt=jnp.bfloat16, cols=0, ww=184, wh=48,
                           rpt=4)),
           feats, pm, dvs)
    for cols, ww, wh, rpt in [(23, 96, 48, 4), (23, 96, 24, 2),
                              (46, 128, 24, 2)]:
        timeit(
            f"warp: cols={cols} ww={ww} wh={wh} rows={rpt} bf16",
            jax.jit(partial(var_win, cdt=jnp.bfloat16, cols=cols, ww=ww,
                            wh=wh, rpt=rpt)),
            feats, pm, dvs,
        )
    timeit("warp: gather", jax.jit(var_gather), feats, pm, dvs)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "render"):
        bench_render_sampler()
    if which in ("all", "warp"):
        bench_warp()
