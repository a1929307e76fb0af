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
    *maybe_sum_ref,  # with emit_sum: VMEM (1, 1, RB, C, Wt) f32
    S: int,
    Hs: int,
    Ws: int,
    C: int,
    Wt: int,
    RB: int,
    window_h: int,
    align: int,
    cdt,
    emit_sum: bool = False,
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
        if emit_sum:
            maybe_sum_ref[0][0, 0, pl.ds(r, 1)] = acc[None]
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
    static_argnames=(
        "window_h", "row_block", "compute_dtype", "interpret", "with_sum",
    ),
)
def fused_warp_variance(
    src_feats: jnp.ndarray,  # (B, S, Hs, Ws, C) float32
    proj_mats: jnp.ndarray,  # (B, S, 3, 4)
    depth_values: jnp.ndarray,  # (B, D, Ht, Wt) metric depth
    window_h: int = 32,
    row_block: int = 0,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    with_sum: bool = False,
):
    """Variance cost volume over S plane-sweep-warped views: (B, D, Ht, Wt, C).

    Matches ops/cost_volume.variance_volume (population variance over views,
    zeros padding) when every row's valid taps fit its y-window; numerics
    differ only by the ``compute_dtype`` of the two interpolation matmuls.

    With ``with_sum`` also returns the per-view *sum* volume in kernel layout
    (B, D, Ht, C, Wt) — the residual the custom VJP needs to reconstruct the
    per-view variance cotangents without an S-sized volume.
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
        n_vol = 2 if with_sum else 1
        return 2 * r * (n_vol * C * Wt_pad * 4 + Wt_pad * 4)

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
        window_h=window_h, align=align, cdt=cdt, emit_sum=with_sum,
    )
    vol_spec = pl.BlockSpec(
        (1, 1, RB, C, Wt),
        lambda b, d, rb: (b, d, rb, 0, 0),
        memory_space=pltpu.VMEM,
    )
    vol_shape = jax.ShapeDtypeStruct((B, D, Ht, C, Wt), jnp.float32)
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
        out_specs=(vol_spec, vol_spec) if with_sum else vol_spec,
        out_shape=(vol_shape, vol_shape) if with_sum else vol_shape,
        interpret=interpret,
    )(proj_mats.astype(jnp.float32), feats_t, depth_values)
    if with_sum:
        var, vsum = out
        return jnp.moveaxis(var, 3, -1), vsum
    return jnp.moveaxis(out, 3, -1)  # (B, D, Ht, Wt, C)


def _warp_bwd_kernel(
    proj_ref,  # SMEM (1, S, 3, 4) f32
    feats_ref,  # VMEM (1, 1, Hs*C, Ws) f32 — view ``s`` only
    depth_ref,  # VMEM (1, 1, RB, Wt) f32
    sum_ref,  # VMEM (1, 1, RB, C, Wt) f32 — per-view sum volume (residual)
    g_ref,  # VMEM (1, 1, RB, C, Wt) f32 — variance cotangent
    dfeats_ref,  # VMEM (1, Hs*C, Ws) f32 — accumulated over (d, rb)
    ddepth_ref,  # VMEM (1, 1, RB, Wt) f32 — this view's depth cotangent
    *,
    s: int,
    S: int,
    Hs: int,
    Ws: int,
    C: int,
    Wt: int,
    RB: int,
    window_h: int,
    align: int,
):
    """Backward of the fused warp-variance for source view ``s``.

    Recomputes the view's warped row (float32, HIGHEST precision — identical
    to the training forward), turns the variance cotangent into the per-view
    cotangent g_s = g * (2/S)(w_s - mean), and emits:

    * d_feats via the transposed interpolation matmuls, accumulated into a
      VMEM-resident block (constant index map over the (d, rb) grid axes);
    * d_depth via the triangle-weight derivatives chained through the
      projective coordinates (d ax/dx, d ay/dy -> dx/d inv_depth ->
      d inv_depth/d depth). Window origins (floor/min) are piecewise
      constant and carry no gradient — exactly like the XLA windowed path.
    """
    whC = window_h * C
    chan = jax.lax.broadcasted_iota(jnp.int32, (C, whC), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (C, whC), 1)
    sel = (lane % C == chan).astype(jnp.float32)  # (C, whC)
    yoff = (
        jax.lax.broadcasted_iota(jnp.int32, (whC, Wt), 0) // C
    ).astype(jnp.float32)
    jx = jax.lax.broadcasted_iota(jnp.int32, (Ws, Wt), 0).astype(jnp.float32)
    u = jax.lax.broadcasted_iota(jnp.int32, (1, Wt), 1).astype(jnp.float32)

    rb = pl.program_id(2)
    base_v = rb * RB
    inv_hi = ((Hs - window_h) // align) * align
    prec = jax.lax.Precision.HIGHEST

    @pl.when((pl.program_id(1) == 0) & (rb == 0))
    def _init():
        dfeats_ref[0] = jnp.zeros((Hs * C, Ws), jnp.float32)

    p = [[proj_ref[0, s, i, j] for j in range(4)] for i in range(3)]

    def mm(a, b, dims):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(dims, ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    def row_body(r, _):
        depth_row = depth_ref[0, 0, pl.ds(r, 1), :]  # (1, Wt)
        inv_d = 1.0 / depth_row
        vf = (base_v + r).astype(jnp.float32)
        sx = p[0][0] * u + p[0][1] * vf + p[0][2] + p[0][3] * inv_d
        sy = p[1][0] * u + p[1][1] * vf + p[1][2] + p[1][3] * inv_d
        sz_raw = p[2][0] * u + p[2][1] * vf + p[2][2] + p[2][3] * inv_d
        sz = jnp.maximum(sz_raw, 1e-6)
        xu = sx / sz
        yu = sy / sz
        x = jnp.clip(xu, -2.0, Ws + 1.0)
        y = jnp.clip(yu, -2.0, Hs + 1.0)
        y0 = jnp.floor(jnp.min(y)).astype(jnp.int32) - 1
        y0 = jnp.clip((y0 // align) * align, 0, max(inv_hi, 0))
        y0c = pl.multiple_of(y0 * C, align * C)
        y0f = y0.astype(jnp.float32)

        # --- recompute this view's warped row (matches the f32 forward) ---
        win = feats_ref[0, 0, pl.ds(y0c, whC), :]  # (whC, Ws)
        ax = jnp.maximum(0.0, 1.0 - jnp.abs(jx - x))  # (Ws, Wt)
        tmp = mm(win, ax, (((1,), (0,))))  # (whC, Wt)
        ay = jnp.maximum(0.0, 1.0 - jnp.abs(y - y0f - yoff))  # (whC, Wt)
        w = mm(sel, tmp * ay, (((1,), (0,))))  # (C, Wt)

        # --- per-view cotangent: d var / d w_s = (2/S)(w_s - mean) ---
        sum_row = sum_ref[0, 0, pl.ds(r, 1)][0]  # (C, Wt)
        g_row = g_ref[0, 0, pl.ds(r, 1)][0]  # (C, Wt)
        gs = g_row * (2.0 / S) * (w - sum_row / S)  # (C, Wt)

        # --- feature gradient: transposed interpolation matmuls ---
        d_tmp_ay = mm(sel, gs, (((0,), (0,))))  # (whC, Wt)
        d_tmp = d_tmp_ay * ay
        d_win = mm(d_tmp, ax, (((1,), (1,))))  # (whC, Ws)
        cur = dfeats_ref[0, pl.ds(y0c, whC), :]
        dfeats_ref[0, pl.ds(y0c, whC), :] = cur + d_win

        # --- coordinate gradients through the triangle weights ---
        d_ax = mm(win, d_tmp, (((0,), (0,))))  # (Ws, Wt)
        dax_dx = jnp.where(jnp.abs(jx - x) < 1.0, jnp.sign(jx - x), 0.0)
        g_x = jnp.sum(d_ax * dax_dx, axis=0, keepdims=True)  # (1, Wt)
        d_ay = d_tmp_ay * tmp
        ydist = y - y0f - yoff
        day_dy = jnp.where(jnp.abs(ydist) < 1.0, -jnp.sign(ydist), 0.0)
        g_y = jnp.sum(d_ay * day_dy, axis=0, keepdims=True)  # (1, Wt)

        # --- chain to depth: x = sx/max(sz,eps), sx/sz linear in 1/depth ---
        live = (sz_raw > 1e-6).astype(jnp.float32)
        mask_x = ((xu >= -2.0) & (xu <= Ws + 1.0)).astype(jnp.float32)
        mask_y = ((yu >= -2.0) & (yu <= Hs + 1.0)).astype(jnp.float32)
        dx_dinvd = (p[0][3] - xu * p[2][3] * live) / sz
        dy_dinvd = (p[1][3] - yu * p[2][3] * live) / sz
        g_invd = g_x * dx_dinvd * mask_x + g_y * dy_dinvd * mask_y
        ddepth_ref[0, 0, pl.ds(r, 1), :] = g_invd * (-inv_d * inv_d)
        return _

    jax.lax.fori_loop(0, RB, row_body, 0)


def warp_variance_bwd_fits(S: int, Hs: int, Ws: int, C: int) -> bool:
    """Whether the per-view backward kernel fits VMEM: one view's float32
    feature planes plus its float32 gradient accumulator must both stay
    resident. Route oversized geometries through the XLA windowed path's
    autodiff instead."""
    per_view = Hs * C * (-(-Ws // 128) * 128) * 4
    return 2 * per_view <= 9 * 2**20


@functools.partial(jax.jit, static_argnames=("window_h", "interpret"))
def _warp_variance_bwd(
    src_feats, proj_mats, depth_values, vol_sum, g, window_h, interpret
):
    """(d src_feats, d depth_values) for the fused warp-variance.

    One pallas_call per source view: the view's packed feature planes and its
    float32 gradient accumulator stay VMEM-resident across the (D, row-band)
    grid; per-view depth cotangents are summed in XLA.
    """
    B, S, Hs, Ws, C = src_feats.shape
    _, D, Ht, Wt = depth_values.shape
    align = max(16 // C, 1)
    window_h = max(min(window_h, Hs), align)

    per_view = Hs * C * (-(-Ws // 128) * 128) * 4
    Wt_pad = -(-Wt // 128) * 128
    cands = [Ht] + [r for r in range(8, Ht, 8) if Ht % r == 0]

    def blocks_bytes(r):
        # double-buffered depth + sum + g inputs and the ddepth output
        return 2 * r * Wt_pad * 4 * (2 + 2 * C)

    budget = 12 * 2**20 - 2 * per_view - 2 * 2**20
    fitting = [r for r in cands if blocks_bytes(r) <= max(budget, 2**20)]
    RB = max(fitting) if fitting else min(cands)

    feats_t = (
        jnp.swapaxes(src_feats, 3, 4)
        .reshape(B, S, Hs * C, Ws)
        .astype(jnp.float32)
    )
    g_k = jnp.moveaxis(g, -1, 3)  # (B, D, Ht, C, Wt) kernel layout
    proj = proj_mats.astype(jnp.float32)
    depth_values = depth_values.astype(jnp.float32)

    dfeats = []
    ddepth = jnp.zeros((B, D, Ht, Wt), jnp.float32)
    for s in range(S):
        kernel = functools.partial(
            _warp_bwd_kernel,
            s=s, S=S, Hs=Hs, Ws=Ws, C=C, Wt=Wt, RB=RB,
            window_h=window_h, align=align,
        )
        vol_spec = pl.BlockSpec(
            (1, 1, RB, C, Wt),
            lambda b, d, rb: (b, d, rb, 0, 0),
            memory_space=pltpu.VMEM,
        )
        df_s, dd_s = pl.pallas_call(
            kernel,
            grid=(B, D, Ht // RB),
            in_specs=[
                pl.BlockSpec(
                    (1, S, 3, 4),
                    lambda b, d, rb: (b, 0, 0, 0),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(
                    (1, 1, Hs * C, Ws),
                    lambda b, d, rb, s=s: (b, s, 0, 0),
                    memory_space=pltpu.VMEM,
                    pipeline_mode=pl.Buffered(buffer_count=1),
                ),
                pl.BlockSpec(
                    (1, 1, RB, Wt),
                    lambda b, d, rb: (b, d, rb, 0),
                    memory_space=pltpu.VMEM,
                ),
                vol_spec,
                vol_spec,
            ],
            out_specs=(
                pl.BlockSpec(
                    (1, Hs * C, Ws),
                    lambda b, d, rb: (b, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, RB, Wt),
                    lambda b, d, rb: (b, d, rb, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((B, Hs * C, Ws), jnp.float32),
                jax.ShapeDtypeStruct((B, D, Ht, Wt), jnp.float32),
            ),
            interpret=interpret,
        )(proj, feats_t, depth_values, vol_sum, g_k)
        dfeats.append(df_s)
        ddepth = ddepth + dd_s

    df = jnp.stack(dfeats, axis=1)  # (B, S, Hs*C, Ws)
    df = jnp.swapaxes(df.reshape(B, S, Hs, C, Ws), 3, 4)  # (B,S,Hs,Ws,C)
    return df.astype(src_feats.dtype), ddepth.astype(depth_values.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_warp_variance_diff(
    src_feats,
    proj_mats,
    depth_values,
    window_h: int = 32,
    compute_dtype=jnp.float32,
    interpret: bool = False,
):
    """Differentiable fused warp-variance (training path).

    Forward is the Pallas kernel; backward is a matching Pallas kernel
    (see ``_warp_bwd_kernel``), so fine-tuning keeps the fused hot loop.
    Gradients flow to ``src_feats`` and ``depth_values`` exactly like the
    XLA windowed path (and the torch reference, where only near_far is
    detached — lib/networks/enerf/utils.py:150). Callers must check
    ``warp_variance_bwd_fits`` first. ``compute_dtype`` should stay float32
    for training (the backward recomputes the forward in float32; a bf16
    forward would make the per-view cotangents slightly inconsistent).
    """
    return fused_warp_variance(
        src_feats, proj_mats, depth_values,
        window_h=window_h, compute_dtype=compute_dtype, interpret=interpret,
    )


def _fwvd_fwd(src_feats, proj_mats, depth_values, window_h, compute_dtype,
              interpret):
    var, vsum = fused_warp_variance(
        src_feats, proj_mats, depth_values,
        window_h=window_h, compute_dtype=compute_dtype, interpret=interpret,
        with_sum=True,
    )
    return var, (src_feats, proj_mats, depth_values, vsum)


def _fwvd_bwd(window_h, compute_dtype, interpret, res, g):
    src_feats, proj_mats, depth_values, vsum = res
    d_feats, d_depth = _warp_variance_bwd(
        src_feats, proj_mats, depth_values, vsum, g, window_h, interpret
    )
    return d_feats, jnp.zeros_like(proj_mats), d_depth


fused_warp_variance_diff.defvjp(_fwvd_fwd, _fwvd_bwd)


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
