"""Plane-sweep cost volumes and cascade depth-hypothesis schedules.

TPU-native re-design of the reference hot loop #1 (plane-sweep warp with
online variance, reference lib/networks/enerf/utils.py:324-351
``build_feature_volume`` + :57-95 ``homo_warp`` + :98-153 ``get_depth_values``).

Depth/disparity space convention (matches the reference exactly):
* With ``depth_inv=True`` the D hypotheses are uniform in disparity
  (1/depth); ``depth_values`` holds metric depth; the regressed ``depth``,
  ``std`` and the returned ``near_far`` bounds live in *disparity* space.
* With ``depth_inv=False`` everything is metric.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from boostmvsnerfs_tpu.ops import geometry, sampling


def initial_depth_values(
    near_far: jnp.ndarray,  # (B, 2) scene-level [near, far]
    D: int,
    H: int,
    W: int,
    inverse: bool,
) -> jnp.ndarray:
    """(B, D, H, W) depth hypotheses for the first cascade level.

    Reference lib/networks/enerf/utils.py:103-111.
    """
    B = near_far.shape[0]
    t = jnp.linspace(0.0, 1.0, D, dtype=jnp.float32)[None]  # (1, D)
    near = near_far[:, :1]
    far = near_far[:, 1:]
    if inverse:
        disp = 1.0 / near + t * (1.0 / far - 1.0 / near)
        depth_values = 1.0 / disp
    else:
        depth_values = near + t * (far - near)
    return jnp.broadcast_to(depth_values[:, :, None, None], (B, D, H, W))


def refined_depth_values(
    depth: jnp.ndarray,  # (B, h, w) regressed value from the previous level
    std: jnp.ndarray,  # (B, h, w)
    near_far: jnp.ndarray,  # (B, 2, h, w) previous-level bounds map
    D: int,
    H: int,
    W: int,
    prev_inverse: bool,
    inverse: bool,
) -> jnp.ndarray:
    """(B, D, H, W) hypotheses narrowed to [depth - std, depth + std].

    Reference lib/networks/enerf/utils.py:112-149: depth/std/bounds are
    upsampled with align-corners bilinear to the new volume scale, the band
    is clamped to the previous level's bounds, and (for the ENeRF recipe:
    prev_inverse=True, inverse=False) the band is converted from disparity to
    metric depth and sampled uniformly in metric space.
    """
    depth = sampling.resize_bilinear_2d(depth, H, W)
    std = sampling.resize_bilinear_2d(std, H, W)
    # near_far is (B, 2, h, w): resize the trailing spatial dims
    near_far = sampling.resize_bilinear(
        jnp.moveaxis(near_far, 1, -1), H, W
    )  # (B, H, W, 2)

    if prev_inverse:
        # disparity space: channel 0 = 1/near (large), channel 1 = 1/far (small)
        hi = jnp.minimum(depth + std, near_far[..., 0])
        lo = jnp.maximum(depth - std, near_far[..., 1])
        band = jnp.stack([1.0 / hi, 1.0 / lo], axis=-1)  # metric [near', far']
    else:
        lo = jnp.maximum(depth - std, near_far[..., 0])
        hi = jnp.minimum(depth + std, near_far[..., 1])
        band = jnp.stack([lo, hi], axis=-1)

    t = jnp.linspace(0.0, 1.0, D, dtype=jnp.float32)  # (D,)
    if inverse:
        disp = 1.0 / band[..., :1] + t * (1.0 / band[..., 1:] - 1.0 / band[..., :1])
        dv = 1.0 / disp  # (B, H, W, D)
    else:
        dv = band[..., :1] + t * (band[..., 1:] - band[..., :1])
    return jnp.moveaxis(dv, -1, 1)  # (B, D, H, W)


def depth_values_near_far(depth_values: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    """(B, 2, H, W) bounds map from hypotheses (reference utils.py:150-153).

    In disparity space when ``inverse`` (channel 0 = 1/first-plane = 1/near).
    """
    nf = depth_values[:, jnp.array([0, -1])]
    if inverse:
        nf = 1.0 / jnp.maximum(nf, 1e-6)
    return jax.lax.stop_gradient(nf)


def warp_src_view(
    src_feat: jnp.ndarray,  # (Hs, Ws, C) one source view's feature map
    proj_mat: jnp.ndarray,  # (3, 4) target-pixel+depth -> source-pixel
    depth_values: jnp.ndarray,  # (D, Ht, Wt)
) -> jnp.ndarray:
    """Plane-sweep warp of one source view: (D, Ht, Wt, C).

    Reference lib/networks/enerf/utils.py:57-95 ``homo_warp``: source
    coordinates are ``R @ [x, y, 1] + T / depth`` followed by perspective
    division (clamped at 1e-6) and a zeros-padded bilinear gather.
    """
    D, Ht, Wt = depth_values.shape
    R = proj_mat[:, :3]  # (3, 3)
    T = proj_mat[:, 3]  # (3,)
    grid = geometry.pixel_grid(Ht, Wt)  # (Ht, Wt, 2)
    ones = jnp.ones_like(grid[..., :1])
    g = jnp.concatenate([grid, ones], axis=-1)  # (Ht, Wt, 3)
    base = g @ R.T  # (Ht, Wt, 3) — depth-independent part
    src = base[None] + T[None, None, None] / depth_values[..., None]  # (D,Ht,Wt,3)
    xy = src[..., :2] / jnp.maximum(src[..., 2:3], 1e-6)
    return sampling.grid_sample_2d(
        src_feat, xy.reshape(-1, 2), padding_mode="zeros"
    ).reshape(D, Ht, Wt, src_feat.shape[-1])


def _window_origin(coord_min: jnp.ndarray, size: int, limit: int) -> jnp.ndarray:
    """Clamped int window start so the window stays inside [0, limit)."""
    start = jnp.floor(coord_min).astype(jnp.int32) - 1
    return jnp.clip(start, 0, max(limit - size, 0))


def warp_src_view_windowed(
    src_feat: jnp.ndarray,  # (Hs, Ws, C)
    proj_mat: jnp.ndarray,  # (3, 4)
    depth_values: jnp.ndarray,  # (D, Ht, Wt)
    window_h: int,
    window_w: int,
    rows_per_tile: int = 1,
    compute_dtype=None,
    cols_per_tile: int = 0,
) -> jnp.ndarray:
    """Plane-sweep warp as windowed interpolation matmuls (no gathers).

    TPU re-design of the ``homo_warp`` gather: for every (depth plane, tile
    of target rows x cols) the needed source pixels lie in a narrow band, so
    the bilinear gather becomes (1) a dynamic-slice of a (window_h, window_w,
    C) source window and (2) two triangle-weight contractions — the wide one
    on the MXU. Triangle weights relu(1 - |x - j|) over absolute coordinates
    reproduce grid_sample's zeros-padding exactly; correctness requires only
    that in-image taps fall inside the window (use
    ``warp_window_coverage`` to validate window sizes for a camera setup;
    tests verify equality with the gather path). 9x faster than the XLA
    gather lowering at the fine cascade level on TPU v5e.

    ``cols_per_tile`` > 0 additionally tiles target columns so ``window_w``
    can shrink below the full source width, cutting the x-contraction cost
    proportionally.
    """
    D, Ht, Wt = depth_values.shape
    C = src_feat.shape[-1]
    R_tile = rows_per_tile
    while Ht % R_tile:
        R_tile -= 1
    C_tile = cols_per_tile if cols_per_tile else Wt
    while Wt % C_tile:
        C_tile -= 1
    ny, nx = Ht // R_tile, Wt // C_tile
    T = R_tile * C_tile  # samples per tile

    x, y = _warp_coords(src_feat.shape, proj_mat, depth_values)

    def tile_view(a):  # (D, Ht, Wt) -> (D, ny*nx, T)
        a = a.reshape(D, ny, R_tile, nx, C_tile)
        return a.transpose(0, 1, 3, 2, 4).reshape(D, ny * nx, T)

    out = windowed_warp_from_coords(
        src_feat, tile_view(x), tile_view(y), window_h, window_w,
        compute_dtype,
    )
    out = out.reshape(D, ny, nx, R_tile, C_tile, C)
    return out.transpose(0, 1, 3, 2, 4, 5).reshape(D, Ht, Wt, C)


def windowed_warp_from_coords(
    src_feat: jnp.ndarray,  # (Hs, Ws, C)
    x: jnp.ndarray,  # (n_outer, n_tiles, T) source x coords per tile
    y: jnp.ndarray,  # (n_outer, n_tiles, T)
    window_h: int,
    window_w: int,
    compute_dtype=None,
) -> jnp.ndarray:
    """Core of the windowed warp: bilinear sampling with zeros padding as
    dynamic-sliced windows + triangle-weight contractions. Returns
    (n_outer, n_tiles, T, C); the outer axis runs sequentially to bound
    live window memory, tiles vectorize into batched MXU matmuls.

    ``compute_dtype=jnp.bfloat16`` runs the two contractions on the bf16 MXU
    path (~4x the f32 rate) with float32 accumulation; interpolation-weight
    rounding error is ~2^-9 of the feature magnitude.
    """
    Hs, Ws, C = src_feat.shape
    window_h = min(window_h, Hs)
    window_w = min(window_w, Ws)
    cdt = compute_dtype or src_feat.dtype

    x0 = _window_origin(jnp.min(x, axis=-1), window_w, Ws)
    y0 = _window_origin(jnp.min(y, axis=-1), window_h, Hs)

    jx = jnp.arange(window_w, dtype=jnp.float32)
    jy = jnp.arange(window_h, dtype=jnp.float32)

    def tile_warp(args):
        x_r, y_r, x0_r, y0_r = args  # (T,), (T,), (), ()
        win = jax.lax.dynamic_slice(
            src_feat, (y0_r, x0_r, 0), (window_h, window_w, C)
        )
        ax = jnp.maximum(
            0.0, 1.0 - jnp.abs(x_r[:, None] - x0_r - jx[None, :])
        )  # (T, window_w)
        ay = jnp.maximum(
            0.0, 1.0 - jnp.abs(y_r[:, None] - y0_r - jy[None, :])
        )  # (T, window_h)
        tmp = jnp.einsum(
            "tx,yxc->tyc", ax.astype(cdt), win.astype(cdt),
            preferred_element_type=jnp.float32,
        )
        return jnp.einsum(
            "ty,tyc->tc", ay.astype(cdt), tmp.astype(cdt),
            preferred_element_type=jnp.float32,
        )

    def plane_warp(args):
        return jax.vmap(tile_warp)(args)

    return jax.lax.map(plane_warp, (x, y, x0, y0))


def _warp_coords(src_shape, proj_mat, depth_values):
    """Source-pixel coordinates of the plane sweep, ((D,Ht,Wt) x, y)."""
    D, Ht, Wt = depth_values.shape
    R = proj_mat[:, :3]
    T = proj_mat[:, 3]
    grid = geometry.pixel_grid(Ht, Wt)
    g = jnp.concatenate([grid, jnp.ones_like(grid[..., :1])], axis=-1)
    base = g @ R.T  # (Ht, Wt, 3)
    src = base[None] + T[None, None, None] / depth_values[..., None]
    xy = src[..., :2] / jnp.maximum(src[..., 2:3], 1e-6)
    return xy[..., 0], xy[..., 1]


def warp_window_coverage(
    src_shape, proj_mat, depth_values, window_h, window_w, rows_per_tile=1,
    cols_per_tile=0,
):
    """Diagnostic: fraction of in-image taps that a window config would
    miss (0.0 = windowed warp exact for this geometry)."""
    Hs, Ws = src_shape[:2]
    D, Ht, Wt = depth_values.shape
    window_h = min(window_h, Hs)
    window_w = min(window_w, Ws)
    R_tile = rows_per_tile
    while Ht % R_tile:
        R_tile -= 1
    C_tile = cols_per_tile if cols_per_tile else Wt
    while Wt % C_tile:
        C_tile -= 1
    ny, nx = Ht // R_tile, Wt // C_tile
    x, y = _warp_coords(src_shape, proj_mat, depth_values)

    def tile_view(a):
        a = a.reshape(D, ny, R_tile, nx, C_tile)
        return a.transpose(0, 1, 3, 2, 4).reshape(D, ny * nx, R_tile * C_tile)

    x, y = tile_view(x), tile_view(y)
    x0 = _window_origin(jnp.min(x, axis=-1), window_w, Ws)[..., None]
    y0 = _window_origin(jnp.min(y, axis=-1), window_h, Hs)[..., None]
    return sampling.tap_miss_fraction(x, y, x0, y0, window_h, window_w, Hs, Ws)


def variance_volume_windowed(
    src_feats: jnp.ndarray,  # (S, Hs, Ws, C)
    proj_mats: jnp.ndarray,  # (S, 3, 4)
    depth_values: jnp.ndarray,  # (D, Ht, Wt)
    window_h: int,
    window_w: int,
    rows_per_tile: int = 1,
    compute_dtype=None,
    cols_per_tile: int = 0,
) -> jnp.ndarray:
    """variance_volume built on the windowed matmul warp."""
    S = src_feats.shape[0]
    vol_sum = 0.0
    vol_sq = 0.0
    for s in range(S):
        w = warp_src_view_windowed(
            src_feats[s], proj_mats[s], depth_values, window_h, window_w,
            rows_per_tile, compute_dtype, cols_per_tile,
        )
        vol_sum = vol_sum + w
        vol_sq = vol_sq + w * w
    mean = vol_sum / S
    return vol_sq / S - mean * mean


def variance_volume(
    src_feats: jnp.ndarray,  # (S, Hs, Ws, C)
    proj_mats: jnp.ndarray,  # (S, 3, 4)
    depth_values: jnp.ndarray,  # (D, Ht, Wt)
) -> jnp.ndarray:
    """Variance cost volume over S warped source views: (D, Ht, Wt, C).

    Matches reference lib/networks/enerf/utils.py:330-351: population variance
    E[x^2] - E[x]^2 over views, out-of-view taps contributing zeros.
    The S loop unrolls under jit so XLA fuses the warps with the online
    moment accumulation (no S-sized volume is materialized).
    """
    S = src_feats.shape[0]
    vol_sum = 0.0
    vol_sq = 0.0
    for s in range(S):
        w = warp_src_view(src_feats[s], proj_mats[s], depth_values)
        vol_sum = vol_sum + w
        vol_sq = vol_sq + w * w
    mean = vol_sum / S
    return vol_sq / S - mean * mean
