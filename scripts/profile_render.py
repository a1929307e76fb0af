"""Per-piece timing of the level-1 render stage at Free eval geometry.

Replicates ENeRF.render_level's dataflow piecewise (each piece jitted
separately) to locate the slow component on the real TPU.
"""

import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from boostmvsnerfs_tpu.models.nerf_head import NeRFHead
from boostmvsnerfs_tpu.ops import geometry, render, sampling
from boostmvsnerfs_tpu.ops.pallas.img_sample import fused_row_sample

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


def main():
    B, S, K = 1, 3, 4
    BK = B * K
    H = W = None
    H_r, W_r, Ns = 480, 736, 2
    N = H_r * W_r
    Dv, Hv, Wv, Cv = 8, 240, 368, 8
    Cf = 8  # level-2 im feat channels
    rng = np.random.default_rng(0)

    f32 = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    feat_vol = f32(BK, Dv, Hv, Wv, Cv)
    depth = jnp.abs(f32(BK, Hv, Wv)) + 2.0
    std = jnp.abs(f32(BK, Hv, Wv)) * 0.1
    nf_map = jnp.stack([jnp.full((BK, Hv, Wv), 2.0),
                        jnp.full((BK, Hv, Wv), 6.0)], 1)
    src_inps = f32(BK, S, H_r, W_r, 3)
    im_feat = f32(BK, S, H_r, W_r, Cf)
    src_exts = jnp.tile(jnp.eye(4)[None, None], (BK, S, 1, 1)).astype(jnp.float32)
    src_ixts = jnp.tile(jnp.asarray(
        [[500.0, 0, W_r / 2], [0, 500.0, H_r / 2], [0, 0, 1]], jnp.float32
    )[None, None], (BK, S, 1, 1))
    tar_ext = jnp.tile(jnp.eye(4)[None], (BK, 1, 1)).astype(jnp.float32)
    tar_ixt = src_ixts[:, 0]
    ray_idx = jnp.tile(jnp.arange(N, dtype=jnp.int32)[None], (BK, 1))

    bounds_map = timeit(
        "ray_bounds_maps",
        jax.jit(lambda d, s, nf: render.ray_bounds_maps(d, s, nf, H_r, W_r, False)),
        depth, std, nf_map,
    )
    bounds = timeit(
        "bounds gather",
        jax.jit(lambda bm, ri: jnp.take_along_axis(
            bm.reshape(BK, N, 4), ri[..., None], axis=1)),
        bounds_map, ray_idx,
    )
    xy = geometry.flat_idx_to_xy(ray_idx, W_r)
    ray_o, ray_d = geometry.rays_from_pixels(tar_ixt, tar_ext, xy)

    sw = timeit(
        "sample_along_depth",
        jax.jit(lambda ro, rd, b, x: render.sample_along_depth(ro, rd, b, x, Ns, False)),
        ray_o, ray_d, bounds, xy,
    )
    world_xyz, uvd, z_vals = sw

    d_coord = uvd[..., 2] * (Dv - 1)
    vox = timeit(
        "vox plane_resample_z",
        jax.jit(lambda fv, z: jax.vmap(sampling.plane_resample_z)(
            fv, z.reshape(BK, H_r, W_r, Ns))),
        feat_vol, d_coord,
    )

    img_feat_rgb = timeit(
        "unpreprocess+concat",
        jax.jit(lambda im, si: jnp.concatenate(
            [im, si * 0.5 + 0.5], axis=-1)),
        im_feat, src_inps,
    )

    pts = world_xyz.reshape(BK, N * Ns, 3)

    def proj_coords(pts, exts, ixts):
        xs, ys = [], []
        for s in range(S):
            xy_s, _ = geometry.project_points(pts, exts[:, s], ixts[:, s])
            xs.append(xy_s[..., 0])
            ys.append(xy_s[..., 1])
        T = W_r * Ns
        return (jnp.stack(xs, 1).reshape(BK * S, H_r, T),
                jnp.stack(ys, 1).reshape(BK * S, H_r, T))

    x_all, y_all = timeit("project coords", jax.jit(proj_coords), pts,
                          src_exts, src_ixts)

    sampled = timeit(
        "fused_row_sample (pallas)",
        partial(fused_row_sample, window_h=16, padding_mode="border"),
        img_feat_rgb.reshape(BK * S, H_r, W_r, -1), x_all, y_all,
    )

    def ray_dirs(pts, exts, text):
        per = []
        tar_c = geometry.cam_center(text)
        for s in range(S):
            src_c = geometry.cam_center(exts[:, s])
            td = pts - tar_c[:, None]
            sd = pts - src_c[:, None]
            td = td / (jnp.linalg.norm(td, axis=-1, keepdims=True) + 1e-6)
            sd = sd / (jnp.linalg.norm(sd, axis=-1, keepdims=True) + 1e-6)
            rd = td - sd
            rn = jnp.linalg.norm(rd, axis=-1, keepdims=True)
            dd = jnp.sum(td * sd, axis=-1, keepdims=True)
            per.append(jnp.concatenate([rd / jnp.maximum(rn, 1e-6), dd], -1))
        return jnp.stack(per, -2)

    dirs = timeit("ray-diff features", jax.jit(ray_dirs), pts, src_exts,
                  tar_ext)

    feats_dir = jnp.concatenate(
        [jnp.moveaxis(sampled.reshape(B, K * S if False else BK, S, N * Ns, -1)
                      if False else sampled.reshape(BK, S, N * Ns, -1), 1, 2),
         dirs], -1
    ).reshape(BK, N, Ns, S, -1)

    head = NeRFHead(feat_ch=Cv + 3, viewdir_agg=True)
    vox_r = vox.reshape(BK, N, Ns, Cv)
    hv = head.init(jax.random.PRNGKey(0), vox_r[:, :64], feats_dir[:, :64])
    raw = timeit(
        "nerf head MLP",
        jax.jit(lambda v, vf, fd: head.apply(v, vf, fd)),
        hv, vox_r, feats_dir,
    )

    mask = timeit(
        "mask_viewport",
        jax.jit(lambda w, e, i: render.mask_viewport(
            w, e, i, jnp.asarray([[W_r - 1.0, H_r - 1.0]] * BK))),
        world_xyz, src_exts, src_ixts,
    )

    raws = raw.reshape(B, K, N, Ns, 4)
    masks = mask.reshape(B, K, N, Ns)
    zs = z_vals.reshape(B, K, N, Ns)
    timeit(
        "normalize+composite_blend",
        jax.jit(lambda r, m, z: render.composite_blend(
            r, render.normalize_blend_masks(m), z)),
        raws, masks, zs,
    )


if __name__ == "__main__":
    main()
