"""Fused plane-sweep warp + variance cost volume as a Pallas TPU kernel.

TPU-native re-design of the reference hot loop #1 (``build_feature_volume``:
per-source-view homography warp with online variance, reference
lib/networks/enerf/utils.py:324-351 + :57-95). The XLA windowed-matmul
formulation (ops/cost_volume.py) materializes the T x W triangle-weight
matrices in HBM, which dominates its runtime; here everything stays in VMEM:

* Source features are held per batch grid step as ``(Hs*C, Ws)`` — (y, c)
  packed in sublanes, x in lanes — so a per-row y-window is a cheap sublane
  slice and both contractions are natural MXU matmuls (no transposes
  anywhere in the kernel).
* For each (depth plane, target row) the source coordinates come from the
  projection matrix on the VPU; triangle weights relu(1 - |x - j|) over
  absolute coordinates reproduce grid_sample's zeros padding exactly (valid
  taps carry their bilinear weight, out-of-image taps carry zero weight).
* The y-interpolation weights fuse into a masked multiply; the channel
  reduction is a constant selection matmul.
* The S source views accumulate sum / sum-of-squares on the fly; only the
  variance volume is written (layout (B, D, Ht, C, Wt), channels before
  width — one XLA moveaxis puts it NDHWC for the 3D U-Net).

Exactness condition (same as the windowed XLA path): every valid bilinear
tap of a row must fall inside its ``window_h`` y-band — validate per camera
geometry with ``warp_variance_coverage``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _warp_kernel(
    proj_ref,  # SMEM (1, S, 3, 4) f32
    feats_ref,  # VMEM (1, S, Hs*C, Ws) compute dtype
    depth_ref,  # VMEM (1, 1, RB, Wt) f32
    out_ref,  # VMEM (1, 1, RB, C, Wt) f32
    *,
    S: int,
    Hs: int,
    Ws: int,
    C: int,
    Wt: int,
    RB: int,
    window_h: int,
    align: int,
    cdt,
):
    whC = window_h * C
    # constant channel-selection matrix: sel[c, y*C + c'] = (c == c')
    chan = jax.lax.broadcasted_iota(jnp.int32, (C, whC), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (C, whC), 1)
    sel = (lane % C == chan).astype(cdt)  # (C, whC)
    # sublane index -> y-offset of the window row
    yoff = (
        jax.lax.broadcasted_iota(jnp.int32, (whC, Wt), 0) // C
    ).astype(jnp.float32)
    jx = jax.lax.broadcasted_iota(jnp.int32, (Ws, Wt), 0).astype(
        jnp.float32
    )  # tap x index
    u = jax.lax.broadcasted_iota(jnp.int32, (1, Wt), 1).astype(
        jnp.float32
    )  # target column

    rb = pl.program_id(2)
    base_v = rb * RB
    inv_hi = ((Hs - window_h) // align) * align

    def row_body(r, _):
        depth_row = depth_ref[0, 0, pl.ds(r, 1), :]  # (1, Wt)
        inv_d = 1.0 / depth_row
        vf = (base_v + r).astype(jnp.float32)
        acc = jnp.zeros((C, Wt), jnp.float32)
        acc_sq = jnp.zeros((C, Wt), jnp.float32)
        for s in range(S):
            p = [[proj_ref[0, s, i, j] for j in range(4)] for i in range(3)]
            sx = p[0][0] * u + p[0][1] * vf + p[0][2] + p[0][3] * inv_d
            sy = p[1][0] * u + p[1][1] * vf + p[1][2] + p[1][3] * inv_d
            sz = p[2][0] * u + p[2][1] * vf + p[2][2] + p[2][3] * inv_d
            sz = jnp.maximum(sz, 1e-6)
            # clamp to a narrow out-of-range band: taps beyond +-1 of any
            # pixel already carry zero triangle weight, and the clamp keeps
            # the float->int32 conversion of behind-camera projections
            # (~1e10 after the z-clamp) well-defined
            x = jnp.clip(sx / sz, -2.0, Ws + 1.0)  # (1, Wt)
            y = jnp.clip(sy / sz, -2.0, Hs + 1.0)
            y0 = jnp.floor(jnp.min(y)).astype(jnp.int32) - 1
            y0 = jnp.clip((y0 // align) * align, 0, max(inv_hi, 0))
            win = feats_ref[
                0, s, pl.ds(pl.multiple_of(y0 * C, align * C), whC), :
            ]  # (whC, Ws)
            ax = jnp.maximum(0.0, 1.0 - jnp.abs(jx - x))  # (Ws, Wt)
            # TPU MXU default precision is bf16 even for f32 operands;
            # request true-f32 (multi-pass) math in float32 mode
            prec = (
                jax.lax.Precision.HIGHEST
                if cdt == jnp.float32
                else jax.lax.Precision.DEFAULT
            )
            tmp = jnp.dot(
                win, ax.astype(cdt), preferred_element_type=jnp.float32,
                precision=prec,
            )  # (whC, Wt)
            ay = jnp.maximum(
                0.0, 1.0 - jnp.abs(y - y0.astype(jnp.float32) - yoff)
            )  # (whC, Wt)
            w = jnp.dot(
                sel, (tmp * ay).astype(cdt),
                preferred_element_type=jnp.float32,
                precision=prec,
            )  # (C, Wt)
            acc = acc + w
            acc_sq = acc_sq + w * w
        mean = acc / S
        var = acc_sq / S - mean * mean
        out_ref[0, 0, pl.ds(r, 1)] = var[None]
        return _

    jax.lax.fori_loop(0, RB, row_body, 0)


def warp_variance_fits(
    S: int, Hs: int, Ws: int, C: int, compute_dtype=jnp.bfloat16
) -> bool:
    """Whether the full (S, Hs*C, Ws) source-feature stack fits the kernel's
    resident-VMEM budget. Unlike img_sample's resident/DMA split this kernel
    has no HBM band mode, so callers must route oversized geometries to the
    XLA windowed path instead of failing to compile."""
    feats_bytes = (
        S * Hs * C * (-(-Ws // 128) * 128) * jnp.dtype(compute_dtype).itemsize
    )
    # ~12MB VMEM budget minus double-buffered out/depth blocks + temp slack
    return feats_bytes <= 9 * 2**20


@functools.partial(
    jax.jit,
    static_argnames=("window_h", "row_block", "compute_dtype", "interpret"),
)
def fused_warp_variance(
    src_feats: jnp.ndarray,  # (B, S, Hs, Ws, C) float32
    proj_mats: jnp.ndarray,  # (B, S, 3, 4)
    depth_values: jnp.ndarray,  # (B, D, Ht, Wt) metric depth
    window_h: int = 32,
    row_block: int = 0,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Variance cost volume over S plane-sweep-warped views: (B, D, Ht, Wt, C).

    Matches ops/cost_volume.variance_volume (population variance over views,
    zeros padding) when every row's valid taps fit its y-window; numerics
    differ only by the ``compute_dtype`` of the two interpolation matmuls.
    """
    B, S, Hs, Ws, C = src_feats.shape
    _, D, Ht, Wt = depth_values.shape
    cdt = jnp.dtype(compute_dtype)
    # sublane tiling of the window slice: y0*C must be a multiple of the
    # dtype's sublane tile (16 for bf16)
    align = max(16 // C, 1)
    window_h = max(min(window_h, Hs), align)

    # Mosaic block rule: the depth block's second-minor dim (RB) must be a
    # multiple of 8 or the full Ht. Auto-shrink so the double-buffered
    # output + depth blocks fit VMEM next to the resident feature planes.
    cands = [Ht] + [r for r in range(8, Ht, 8) if Ht % r == 0]
    Wt_pad = -(-Wt // 128) * 128
    feats_bytes = S * Hs * C * (-(-Ws // 128) * 128) * cdt.itemsize

    def blocks_bytes(r):
        return 2 * r * (C * Wt_pad * 4 + Wt_pad * 4)

    budget = 12 * 2**20 - feats_bytes - 2 * 2**20  # ~2MB temp slack
    fitting = [r for r in cands if blocks_bytes(r) <= max(budget, 2**20)]
    RB = max(fitting) if fitting else min(cands)
    if row_block and row_block < RB:
        smaller = [r for r in fitting if r <= row_block] or [min(cands)]
        RB = max(smaller)

    # (B, S, Hs*C, Ws): (y, c) in sublanes, x in lanes
    feats_t = jnp.swapaxes(src_feats, 3, 4).reshape(B, S, Hs * C, Ws)
    feats_t = feats_t.astype(cdt)

    kernel = functools.partial(
        _warp_kernel,
        S=S, Hs=Hs, Ws=Ws, C=C, Wt=Wt, RB=RB,
        window_h=window_h, align=align, cdt=cdt,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, D, Ht // RB),
        in_specs=[
            pl.BlockSpec(
                (1, S, 3, 4),
                lambda b, d, rb: (b, 0, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, S, Hs * C, Ws),
                lambda b, d, rb: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
                # constant across (d, rb): a single buffer halves the VMEM
                # footprint of the resident feature planes
                pipeline_mode=pl.Buffered(buffer_count=1),
            ),
            pl.BlockSpec(
                (1, 1, RB, Wt),
                lambda b, d, rb: (b, d, rb, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, RB, C, Wt),
            lambda b, d, rb: (b, d, rb, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, D, Ht, C, Wt), jnp.float32),
        interpret=interpret,
    )(proj_mats.astype(jnp.float32), feats_t, depth_values)
    return jnp.moveaxis(out, 3, -1)  # (B, D, Ht, Wt, C)


def warp_variance_coverage(
    src_shape, proj_mat, depth_values, window_h: int
) -> jnp.ndarray:
    """Fraction of valid bilinear taps outside the kernel's y-windows
    (0.0 = fused kernel exact for this geometry). Mirrors the kernel's
    aligned per-row window-origin computation."""
    from boostmvsnerfs_tpu.ops import cost_volume, sampling

    Hs, Ws, C = src_shape[0], src_shape[1], src_shape[2]
    align = max(16 // C, 1)
    D, Ht, Wt = depth_values.shape
    window_h = max(min(window_h, Hs), align)
    x, y = cost_volume._warp_coords(src_shape, proj_mat, depth_values)
    x = x.reshape(D * Ht, Wt)
    y = y.reshape(D * Ht, Wt)
    y0 = jnp.floor(jnp.min(y, axis=-1)).astype(jnp.int32) - 1
    hi = ((Hs - window_h) // align) * align
    y0 = jnp.clip((y0 // align) * align, 0, max(hi, 0))[:, None]
    x0 = jnp.zeros_like(y0)
    return sampling.tap_miss_fraction(x, y, x0, y0, window_h, Ws, Hs, Ws)
