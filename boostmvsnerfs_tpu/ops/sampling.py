"""Resampling ops: bilinear/trilinear gathers and align-corners resize.

TPU-native replacements for the reference's CUDA ``F.grid_sample`` calls
(2D: lib/networks/enerf/utils.py:88-90, :770; 3D: :459) and
``F.interpolate(..., align_corners=True)`` (:396-398, :115-117).

All functions use align_corners=True semantics (pixel centers at integer
coordinates 0..size-1) and take **pixel-unit** coordinates — the reference
normalizes to [-1, 1] only because torch's grid_sample API demands it; we skip
the round trip.

The resize is expressed as two separable interpolation matmuls so it runs on
the MXU instead of as a gather. The gathers in grid-sample are expressed as
flat ``jnp.take`` which XLA lowers to TPU dynamic-gather; the fused
warp+variance Pallas kernel (ops/pallas/) supersedes the 2D path in the hot
plane-sweep loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _gather_hw(img_flat: jnp.ndarray, iy, ix, W: int) -> jnp.ndarray:
    """Gather (N,...) rows from (H*W, C) by (y, x) integer indices."""
    idx = iy * W + ix
    return jnp.take(img_flat, idx, axis=0)


def grid_sample_2d(
    img: jnp.ndarray,  # (H, W, C)
    xy: jnp.ndarray,  # (N, 2) pixel coords (x, y), align-corners
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Bilinear sample, returns (N, C).

    ``zeros``: out-of-range taps contribute 0 (torch grid_sample default,
    used by the plane-sweep warp, reference lib/networks/enerf/utils.py:88-90).
    ``border``: coordinates clamped to the image rectangle (used by per-view
    image-feature sampling, reference :770).
    """
    H, W, C = img.shape
    x = xy[..., 0]
    y = xy[..., 1]

    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    tx = x - x0f
    ty = y - y0f

    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    if padding_mode == "zeros":
        # validity of each tap before clamping for the gather
        vx0 = (x0 >= 0) & (x0 <= W - 1)
        vx1 = (x1 >= 0) & (x1 <= W - 1)
        vy0 = (y0 >= 0) & (y0 <= H - 1)
        vy1 = (y1 >= 0) & (y1 <= H - 1)
    x0c = jnp.clip(x0, 0, W - 1)
    x1c = jnp.clip(x1, 0, W - 1)
    y0c = jnp.clip(y0, 0, H - 1)
    y1c = jnp.clip(y1, 0, H - 1)

    flat = img.reshape(H * W, C)
    v00 = _gather_hw(flat, y0c, x0c, W)
    v01 = _gather_hw(flat, y0c, x1c, W)
    v10 = _gather_hw(flat, y1c, x0c, W)
    v11 = _gather_hw(flat, y1c, x1c, W)

    w00 = (1 - ty) * (1 - tx)
    w01 = (1 - ty) * tx
    w10 = ty * (1 - tx)
    w11 = ty * tx
    if padding_mode == "zeros":
        w00 = jnp.where(vy0 & vx0, w00, 0.0)
        w01 = jnp.where(vy0 & vx1, w01, 0.0)
        w10 = jnp.where(vy1 & vx0, w10, 0.0)
        w11 = jnp.where(vy1 & vx1, w11, 0.0)

    return (
        v00 * w00[..., None]
        + v01 * w01[..., None]
        + v10 * w10[..., None]
        + v11 * w11[..., None]
    )


def grid_sample_3d(
    vol: jnp.ndarray,  # (D, H, W, C)
    xyz: jnp.ndarray,  # (N, 3) pixel coords (x->W, y->H, z->D), align-corners
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Trilinear sample, returns (N, C).

    Matches torch 5D grid_sample with align_corners=True (reference
    lib/networks/enerf/utils.py:458-460 ``get_vox_feat`` and
    lib/networks/mvsnerf/utils.py:357-383 ``index_point_feature``).
    """
    D, H, W, C = vol.shape
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)
        z = jnp.clip(z, 0.0, D - 1)

    x0f, y0f, z0f = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    tx, ty, tz = x - x0f, y - y0f, z - z0f
    x0, y0, z0 = x0f.astype(jnp.int32), y0f.astype(jnp.int32), z0f.astype(jnp.int32)

    flat = vol.reshape(D * H * W, C)
    out = jnp.zeros(xyz.shape[:-1] + (C,), vol.dtype)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                xi, yi, zi = x0 + dx, y0 + dy, z0 + dz
                w = (
                    (tx if dx else 1 - tx)
                    * (ty if dy else 1 - ty)
                    * (tz if dz else 1 - tz)
                )
                if padding_mode == "zeros":
                    valid = (
                        (xi >= 0)
                        & (xi <= W - 1)
                        & (yi >= 0)
                        & (yi <= H - 1)
                        & (zi >= 0)
                        & (zi <= D - 1)
                    )
                    w = jnp.where(valid, w, 0.0)
                xi = jnp.clip(xi, 0, W - 1)
                yi = jnp.clip(yi, 0, H - 1)
                zi = jnp.clip(zi, 0, D - 1)
                idx = (zi * H + yi) * W + xi
                out = out + jnp.take(flat, idx, axis=0) * w[..., None]
    return out


# ---------------------------------------------------------------------------
# Align-corners bilinear resize as separable MXU matmuls.
# ---------------------------------------------------------------------------

def _interp_matrix(n_out: int, n_in: int, dtype=jnp.float32) -> jnp.ndarray:
    """(n_out, n_in) row-stochastic linear-interp matrix, align-corners.

    Closed-form triangle weights max(0, 1 - |pos_i - j|) — pure elementwise
    (a scatter-built construction made XLA constant folding pathologically
    slow on large resizes)."""
    if n_in == 1:
        return jnp.ones((n_out, 1), dtype)
    pos = jnp.linspace(0.0, n_in - 1, n_out, dtype=dtype)
    j = jnp.arange(n_in, dtype=dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, None] - j[None, :]))


@partial(jax.jit, static_argnums=(1, 2))
def resize_bilinear(img: jnp.ndarray, H_out: int, W_out: int) -> jnp.ndarray:
    """Align-corners bilinear resize of (..., H, W, C) to (..., H_out, W_out, C).

    Equivalent to torch ``F.interpolate(mode='bilinear', align_corners=True)``
    (reference lib/networks/enerf/utils.py:396-398). Two dense matmuls ->
    MXU-friendly, no gathers.
    """
    H, W = img.shape[-3], img.shape[-2]
    if H == H_out and W == W_out:
        return img
    my = _interp_matrix(H_out, H, img.dtype)  # (H_out, H)
    mx = _interp_matrix(W_out, W, img.dtype)  # (W_out, W)
    out = jnp.einsum("oh,...hwc->...owc", my, img)
    out = jnp.einsum("ow,...hwc->...hoc", mx, out)
    return out


def resize_bilinear_2d(x: jnp.ndarray, H_out: int, W_out: int) -> jnp.ndarray:
    """Resize a (..., H, W) map (no channel axis)."""
    return resize_bilinear(x[..., None], H_out, W_out)[..., 0]


@partial(jax.jit, static_argnums=(1, 2, 3))
def resize_trilinear(
    vol: jnp.ndarray, D_out: int, H_out: int, W_out: int
) -> jnp.ndarray:
    """Align-corners trilinear resize of (..., D, H, W, C) — torch
    ``F.interpolate(mode='trilinear', align_corners=True)`` equivalent
    (reference lib/networks/enerf/cost_reg_net_.py:83-85), as three
    separable MXU matmuls."""
    D, H, W = vol.shape[-4], vol.shape[-3], vol.shape[-2]
    out = resize_bilinear(vol, H_out, W_out)
    if D != D_out:
        md = _interp_matrix(D_out, D, vol.dtype)  # (D_out, D)
        out = jnp.einsum("od,...dhwc->...ohwc", md, out)
    return out


# ---------------------------------------------------------------------------
# Structured (gather-free) sampling for smooth coordinate fields.
# ---------------------------------------------------------------------------

def windowed_sample_rows(
    img: jnp.ndarray,  # (H, W, C)
    xy: jnp.ndarray,  # (n_tiles, T, 2) pixel coords; smooth within a tile
    window_h: int,
    padding_mode: str = "zeros",
    compute_dtype=None,
) -> jnp.ndarray:
    """Exact bilinear sampling via row-band windows + triangle-weight matmuls.

    For coordinate fields that vary smoothly within each tile (raster-order
    rays, plane-sweep rows), the y-range per tile is narrow: slice a
    (window_h, W) band and contract with triangle interpolation weights on
    the MXU instead of issuing per-sample gathers (the TPU-slow path of
    torch grid_sample, reference lib/networks/enerf/utils.py:770).

    Exact when each tile's in-image taps fall within its band; ``border``
    clamps coordinates first (matching grid_sample padding_mode='border').
    """
    H, W, C = img.shape
    n_tiles, T, _ = xy.shape
    window_h = min(window_h, H)
    cdt = compute_dtype or img.dtype
    x = xy[..., 0]
    y = xy[..., 1]
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)

    y0 = jnp.clip(
        jnp.floor(jnp.min(y, axis=-1)).astype(jnp.int32) - 1, 0, H - window_h
    )  # (n_tiles,)
    jx = jnp.arange(W, dtype=jnp.float32)
    jy = jnp.arange(window_h, dtype=jnp.float32)

    def tile(args):
        x_t, y_t, y0_t = args
        win = jax.lax.dynamic_slice(img, (y0_t, 0, 0), (window_h, W, C))
        ax = jnp.maximum(0.0, 1.0 - jnp.abs(x_t[:, None] - jx[None, :]))
        ay = jnp.maximum(
            0.0, 1.0 - jnp.abs(y_t[:, None] - y0_t - jy[None, :])
        )
        tmp = jnp.einsum("tx,yxc->tyc", ax.astype(cdt), win.astype(cdt),
                         preferred_element_type=jnp.float32)
        return jnp.einsum("ty,tyc->tc", ay.astype(cdt), tmp.astype(cdt),
                          preferred_element_type=jnp.float32)

    return jax.lax.map(tile, (x, y, y0))


def windowed_sample_tiles(
    img: jnp.ndarray,  # (H, W, C)
    xy: jnp.ndarray,  # (n_tiles, T, 2) pixel coords; smooth within a tile
    window_h: int,
    window_w: int,
    padding_mode: str = "zeros",
    compute_dtype=None,
    tiles_per_step: int = 1,
) -> jnp.ndarray:
    """Exact bilinear sampling via 2-axis windows + triangle-weight matmuls.

    Generalizes ``windowed_sample_rows`` with a window in x as well: each
    tile dynamic-slices a (window_h, window_w, C) patch, so the x contraction
    shrinks from the full image width to ``window_w`` — for raster-ray
    rendering (column-tiled rows) this cuts the interpolation FLOPs by
    W/window_w on top of the bf16 MXU rate. Exact when every in-image tap of
    a tile falls inside its window (see ``sample_window_coverage``).

    ``tiles_per_step`` batches that many tiles per sequential step (vmap
    inside lax.map) to keep the MXU fed when tiles are small.
    """
    H, W, C = img.shape
    n_tiles, T, _ = xy.shape
    window_h = min(window_h, H)
    window_w = min(window_w, W)
    cdt = compute_dtype or img.dtype
    x = xy[..., 0]
    y = xy[..., 1]
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)

    x0 = jnp.clip(
        jnp.floor(jnp.min(x, axis=-1)).astype(jnp.int32) - 1, 0, W - window_w
    )
    y0 = jnp.clip(
        jnp.floor(jnp.min(y, axis=-1)).astype(jnp.int32) - 1, 0, H - window_h
    )
    jx = jnp.arange(window_w, dtype=jnp.float32)
    jy = jnp.arange(window_h, dtype=jnp.float32)

    def tile(args):
        x_t, y_t, x0_t, y0_t = args
        win = jax.lax.dynamic_slice(
            img, (y0_t, x0_t, 0), (window_h, window_w, C)
        )
        ax = jnp.maximum(0.0, 1.0 - jnp.abs(x_t[:, None] - x0_t - jx[None, :]))
        ay = jnp.maximum(0.0, 1.0 - jnp.abs(y_t[:, None] - y0_t - jy[None, :]))
        tmp = jnp.einsum("tx,yxc->tyc", ax.astype(cdt), win.astype(cdt),
                         preferred_element_type=jnp.float32)
        return jnp.einsum("ty,tyc->tc", ay.astype(cdt), tmp.astype(cdt),
                          preferred_element_type=jnp.float32)

    step = tiles_per_step
    while n_tiles % step:
        step -= 1
    if step > 1:
        args = jax.tree_util.tree_map(
            lambda a: a.reshape(n_tiles // step, step, *a.shape[1:]),
            (x, y, x0, y0),
        )
        out = jax.lax.map(lambda a: jax.vmap(tile)(a), args)
        return out.reshape(n_tiles, T, C)
    return jax.lax.map(tile, (x, y, x0, y0))


def sample_window_coverage(
    img_shape, xy, window_h: int, window_w: int, padding_mode: str = "zeros"
):
    """Fraction of in-image (or, for border mode, clamped) taps that the
    window configuration would miss. 0.0 = windowed sampling exact."""
    H, W = img_shape[:2]
    window_h = min(window_h, H)
    window_w = min(window_w, W)
    x = xy[..., 0]
    y = xy[..., 1]
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)
    x0 = jnp.clip(
        jnp.floor(jnp.min(x, axis=-1)).astype(jnp.int32) - 1, 0, W - window_w
    )[..., None]
    y0 = jnp.clip(
        jnp.floor(jnp.min(y, axis=-1)).astype(jnp.int32) - 1, 0, H - window_h
    )[..., None]
    return tap_miss_fraction(x, y, x0, y0, window_h, window_w, H, W)


def tap_miss_fraction(x, y, x0, y0, window_h, window_w, H, W):
    """Fraction of valid (in-image, nonzero-weight) bilinear taps that fall
    outside their tile's window — the exactness condition of the windowed
    interpolation-matmul samplers."""
    total = jnp.zeros((), jnp.float32)
    missed = jnp.zeros((), jnp.float32)
    xf = jnp.floor(x).astype(jnp.int32)
    yf = jnp.floor(y).astype(jnp.int32)
    for dx in (0, 1):
        for dy in (0, 1):
            tx, ty = xf + dx, yf + dy
            valid = (tx >= 0) & (tx <= W - 1) & (ty >= 0) & (ty <= H - 1)
            out = (
                (tx < x0)
                | (tx > x0 + window_w - 1)
                | (ty < y0)
                | (ty > y0 + window_h - 1)
            )
            total = total + jnp.sum(valid)
            missed = missed + jnp.sum(valid & out)
    return missed / jnp.maximum(total, 1)


def plane_resample_z(
    vol: jnp.ndarray,  # (D, Hv, Wv, C)
    z: jnp.ndarray,  # (H_out, W_out, S) per-pixel z coords in [0, D-1]
    full_h: int | None = None,  # raster height when z is a row block of it
    row0: jnp.ndarray | None = None,  # first raster row of the block
) -> jnp.ndarray:
    """Trilinear volume lookup for a full-raster sample grid, gather-free.

    When samples lie exactly on the align-corners resize grid in (y, x) —
    which holds for full-image rendering where u = x/(W_out-1)*(Wv-1) —
    trilinear interpolation factorizes into a separable (y, x) resize of each
    z-plane (two MXU matmuls) followed by a per-pixel lerp along z.
    Replaces the 3D grid_sample of reference lib/networks/enerf/utils.py:458-460.
    Returns (H_out, W_out, S, C).

    With ``full_h``/``row0``, ``z`` covers only the raster rows
    ``[row0, row0 + H_out)`` of a ``full_h``-row frame: the y-interp matrix
    of the FULL-frame align-corners resize is row-sliced (a dynamic slice —
    exact, and its backward is a pad, not a scatter), so a blocked
    full-image train step (parallel/train.make_blocked_loss) computes only
    its block's rows while matching the full-frame resample bit for bit.
    """
    D, Hv, Wv, C = vol.shape
    H_out, W_out, S = z.shape
    if full_h is not None and (full_h != H_out or row0 is not None):
        my = _interp_matrix(full_h, Hv, vol.dtype)  # full-frame y weights
        my = jax.lax.dynamic_slice_in_dim(
            my, jnp.asarray(row0, jnp.int32), H_out, 0
        )
        mx = _interp_matrix(W_out, Wv, vol.dtype)
        planes = jnp.einsum("oh,dhwc->dowc", my, vol)
        planes = jnp.einsum("ow,dhwc->dhoc", mx, planes)
    else:
        planes = resize_bilinear(vol, H_out, W_out)  # (D, H_out, W_out, C)
    # floor-based lerp weights over the (small) z axis: plane d receives
    # (1-frac) as the floor tap and frac as the ceil tap; out-of-range z
    # contributes zeros (= zeros padding). Forward-equal to triangle weights
    # relu(1-|z-d|), but the *subgradient at exact-integer z* matches the
    # floor-based grid_sample_3d / torch grid_sample backward (d/dz = -v[D-1]
    # at z = D-1, where the ceil tap is out of bounds) — full-image training
    # places samples exactly on the boundary planes, so this convention is
    # load-bearing for gradient parity (tests/test_enerf_structured.py).
    # Unrolled elementwise accumulation — the per-pixel (S, D) x (D, C)
    # einsum lowers to tiny matmuls that crawl on the TPU VPU.
    z0 = jnp.floor(z)
    tz = z - z0
    out = jnp.zeros((H_out, W_out, S, C), vol.dtype)
    for d in range(D):
        w = jnp.where(z0 == d, 1.0 - tz, 0.0) + jnp.where(
            z0 == d - 1, tz, 0.0
        )  # (H, W, S)
        out = out + w[..., None] * planes[d][:, :, None, :]
    return out


def plane_resample_z_rows(
    vol: jnp.ndarray,  # (D, Hv, Wv, C)
    z: jnp.ndarray,  # (H_out, W_out, S) per-pixel z coords in [0, D-1]
) -> jnp.ndarray:
    """``plane_resample_z`` emitting the TPU-friendly rows layout
    (H_out, C, W_out*S) — channels in sublanes, the (pixel, sample) axis in
    lanes. A trailing C < 128 pads up to 16x in TPU HBM tiling, so this is
    the layout the fused NeRF head (ops/pallas/enerf_head.py) consumes;
    numerics (incl. the floor-based z-lerp subgradient convention) are
    identical to plane_resample_z."""
    D, Hv, Wv, C = vol.shape
    H_out, W_out, S = z.shape
    # resize each (d, c) plane with channels ahead of the spatial dims so no
    # intermediate carries a tiny trailing dim
    planes = resize_bilinear_2d(
        jnp.moveaxis(vol, 3, 1).reshape(D * C, Hv, Wv), H_out, W_out
    ).reshape(D, C, H_out, W_out)
    planes = jnp.moveaxis(planes, 2, 1)  # (D, H, C, W)
    z0 = jnp.floor(z)
    tz = z - z0
    # lane order: pixel-major, sample-minor (matches T = W_r * Ns)
    z0r = z0.reshape(H_out, 1, W_out * S)
    tzr = tz.reshape(H_out, 1, W_out * S)
    out = jnp.zeros((H_out, C, W_out * S), vol.dtype)
    for d in range(D):
        w = jnp.where(z0r == d, 1.0 - tzr, 0.0) + jnp.where(
            z0r == d - 1, tzr, 0.0
        )  # (H, 1, W*S)
        out = out + w * jnp.repeat(planes[d], S, axis=-1)
    return out
