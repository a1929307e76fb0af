"""Profile INSIDE one BoostMVSNeRF render block: which op owns the ~40ms?

The block (28 rows × K=4) runs: NDC + projections (XLA), the fused
trilinear volume sampler, 3 per-view fused image samplers, positional
encoding, and the fused renderer MLP. This times each piece as its own
jit on the block's real coordinates/shapes (one-element syncs).
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


def _t(fn, *args, iters=3):
    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[-1]
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
    ap.add_argument("--height", type=int, default=224)
    ap.add_argument("--width", type=int, default=352)
    ap.add_argument("--rows", type=int, default=28)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from boostmvsnerfs_tpu.models.mvsnerf import (
        MVSNeRFConfig,
        ndc_coords,
        positional_encoding,
    )
    from boostmvsnerfs_tpu.ops import geometry
    from boostmvsnerfs_tpu.ops.pallas.img_sample import fused_row_sample
    from boostmvsnerfs_tpu.ops.pallas.mlp import fused_renderer_mlp
    from boostmvsnerfs_tpu.ops.pallas.tri_sample import fused_tri_sample
    from boostmvsnerfs_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    H, W = args.height, args.width
    BK, V, D, pad = 4, 3, 32, 24
    cfg = MVSNeRFConfig(num_samples=D)
    h, w = H // 4, W // 4
    hp, wp = h + 2 * pad, w + 2 * pad
    rows = args.rows
    N = rows * W  # rays per block
    rng = np.random.default_rng(0)

    volume = jnp.asarray(
        rng.standard_normal((BK, D, hp, wp, 8)).astype(np.float32)
    )
    imgs = jnp.asarray(
        rng.standard_normal((BK * V, H, W, 3)).astype(np.float32)
    )
    # plausible in-volume coordinates, rows ordered (h, d, w)
    R = rows * D
    vx = jnp.asarray(rng.uniform(0, wp - 1, (BK, R, W)).astype(np.float32))
    vy = jnp.asarray(
        (rng.uniform(0, 1, (BK, R, 1)) * (hp - 10)
         + rng.uniform(0, 8, (BK, R, W))).astype(np.float32)
    )
    vz = jnp.asarray(
        (rng.uniform(0, 1, (BK, R, 1)) * (D - 3)
         + rng.uniform(0, 2, (BK, R, W))).astype(np.float32)
    )
    sx = jnp.asarray(
        rng.uniform(0, W - 1, (BK * V, R, W)).astype(np.float32)
    )
    sy = jnp.asarray(
        (rng.uniform(0, 1, (BK * V, R, 1)) * (H - 10)
         + rng.uniform(0, 8, (BK * V, R, W))).astype(np.float32)
    )

    tri = jax.jit(lambda v, x, y, z: fused_tri_sample(
        v, x, y, z, window_h=9, window_z=4
    ))
    dt = _t(tri, volume, vx, vy, vz, iters=args.iters)
    print(json.dumps({"op": "tri_sample", "ms": round(dt * 1e3, 2)}))

    img = jax.jit(lambda im, x, y: fused_row_sample(
        im, x, y, window_h=9, padding_mode="border"
    ))
    dt = _t(img, imgs, sx, sy, iters=args.iters)
    print(json.dumps({"op": "img_sample_3views", "ms": round(dt * 1e3, 2)}))

    # positional encoding + MLP on the block's samples
    uvd = jnp.asarray(
        rng.uniform(0, 1, (BK, N * D, 3)).astype(np.float32)
    )
    feat = jnp.asarray(
        rng.standard_normal((BK, N * D, 8 + 4 * V)).astype(np.float32)
    )
    dirs = jnp.asarray(
        rng.standard_normal((BK, N * D, 3)).astype(np.float32)
    )

    pe = jax.jit(lambda u: positional_encoding(u, cfg.pos_freqs))
    dt = _t(pe, uvd, iters=args.iters)
    print(json.dumps({"op": "pos_enc", "ms": round(dt * 1e3, 2)}))

    pts_enc = pe(uvd)

    from boostmvsnerfs_tpu.models.mvsnerf import MVSNeRF, RendererMLP

    mlp = RendererMLP(cfg)
    variables = mlp.init(
        jax.random.PRNGKey(0), pts_enc[:, :256], feat[:, :256],
        dirs[:, :256], use_pallas=False,
    )

    mlp_pallas = jax.jit(lambda v, p, f, d: mlp.apply(
        v, p, f, d, use_pallas=True
    ))
    dt = _t(mlp_pallas, variables, pts_enc, feat, dirs, iters=args.iters)
    print(json.dumps({"op": "mlp_fused", "ms": round(dt * 1e3, 2)}))

    mlp_xla = jax.jit(lambda v, p, f, d: mlp.apply(
        v, p, f, d, use_pallas=False
    ))
    dt = _t(mlp_xla, variables, pts_enc, feat, dirs, iters=args.iters)
    print(json.dumps({"op": "mlp_xla", "ms": round(dt * 1e3, 2)}))

    # projections: V views x BK volumes on the block's points
    pts = jnp.asarray(
        rng.standard_normal((BK, N * D, 3)).astype(np.float32)
    )
    ext = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (BK, 1, 1)))
    ixt = jnp.asarray(
        np.tile(np.diag([W * 0.5, W * 0.5, 1]).astype(np.float32),
                (BK, 1, 1))
    )

    def proj(p, e, i):
        outs = []
        for _ in range(V):
            xy, dpt = geometry.project_points(p, e, i)
            outs.append(xy)
        return outs

    dt = _t(jax.jit(proj), pts, ext, ixt, iters=args.iters)
    print(json.dumps({"op": "projections_3views", "ms": round(dt * 1e3, 2)}))


if __name__ == "__main__":
    main()
