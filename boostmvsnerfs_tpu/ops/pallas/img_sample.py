"""Fused row-band bilinear image sampling as a Pallas TPU kernel.

TPU-native re-design of the reference hot loop #2 (``get_img_feat``:
project every ray sample into each source view and bilinear-sample
feature+RGB maps, reference lib/networks/enerf/utils.py:753-786). For
full-raster eval rays the projected coordinates of one target row form a
smooth curve, so sampling factorizes into a per-row y-band times triangle
interpolation weights. The XLA windowed formulation
(ops/sampling.windowed_sample_rows) pays for materializing the (T, W)
weight matrices in HBM; here weights live only in VMEM:

* Images are stored ``(H*Cp, W)`` — (y, c) packed in sublanes (channels
  zero-padded to Cp so a y-window is a 16-aligned sublane slice), x in
  lanes. Small images stay resident in VMEM for the whole grid step; large
  ones stay in HBM and each row's y-band is DMA'd into a VMEM scratch
  (double-buffered against the previous row's compute).
* Per target row: the x contraction is a full-K MXU matmul against triangle
  weights built on the VPU; the y interpolation is a fused mask followed by
  a constant channel-selection matmul. Long rows are processed in static
  column chunks to bound live VMEM temporaries.
* ``border`` clamps coordinates (torch grid_sample padding_mode='border');
  ``zeros`` relies on absolute-coordinate triangle weights (out-of-image
  taps carry zero weight).

Exactness condition: every valid tap of a row-chunk must fall inside its
y-band — ops/sampling.sample_window_coverage semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pack_geometry(C: int, window_h: int, H: int):
    """(Cp, align, window_k): channel padding + window-origin alignment.

    Channels pad to a multiple of 4 and window origins align to
    ``16 / gcd(Cp, 16)`` rows so every ``y0 * Cp`` sublane offset and every
    ``window_k * Cp`` slice length stays a multiple of the 16-sublane tile
    — far less padding waste than rounding C to 16 (the 16feat+3rgb render
    maps pay 20/19 instead of 32/19 on the big interpolation matmul). The
    aligned window widens to cover the worst-case origin rounding, so the
    caller's ``window_h`` coverage semantics are unchanged. Falls back to
    C-to-16 padding when the image is shorter than the widened window."""
    import math

    Cp = -(-C // 4) * 4
    align = 16 // math.gcd(Cp, 16)
    window_k = -(-(min(window_h, H) + align - 1) // align) * align
    if window_k > H:  # whole-image band: keep slice lengths tile-aligned
        Cp = -(-C // 16) * 16
        return Cp, 1, min(window_h, H)
    return Cp, align, window_k


def _sample_kernel(
    imgs_ref,  # VMEM (1, H*Cp, W) resident | ANY (V, H*Cp, W) for DMA mode
    x_ref,  # VMEM (1, RB, T) f32
    y_ref,  # VMEM (1, RB, T) f32
    out_ref,  # VMEM (1, RB, Cp, T) f32
    *scratch,  # DMA mode: (band_scratch (2, whC, W), band_sem (2,))
    H: int,
    W: int,
    Cp: int,
    T: int,
    RB: int,
    window_h: int,
    padding_mode: str,
    cdt,
    col_chunk: int,
    resident: bool,
    w_clip: int,
):
    align = window_h[1]
    window_k = window_h[2]
    window_h = window_h[0]
    whC = window_k * Cp
    # chunk boundaries must be 128-aligned lane offsets (T is pre-padded to
    # a multiple of 128 by the wrapper)
    mults = [d for d in range(128, T + 1, 128) if T % d == 0] or [T]
    cap = max(col_chunk, 128) if col_chunk else T
    Tc = max([d for d in mults if d <= cap] or [min(mults)])
    n_chunks = T // Tc
    chan = jax.lax.broadcasted_iota(jnp.int32, (Cp, whC), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Cp, whC), 1)
    sel = (lane % Cp == chan).astype(cdt)  # (Cp, whC)
    yoff = (
        jax.lax.broadcasted_iota(jnp.int32, (whC, Tc), 0) // Cp
    ).astype(jnp.float32)
    jx = jax.lax.broadcasted_iota(jnp.int32, (W, Tc), 0).astype(jnp.float32)
    y_hi = ((H - window_k) // align) * align
    prec = (
        jax.lax.Precision.HIGHEST
        if cdt == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    v = pl.program_id(0)

    def _clip_xy(x, y):
        if padding_mode == "border":
            return jnp.clip(x, 0.0, w_clip - 1), jnp.clip(y, 0.0, H - 1)
        # zeros mode: clamp to a narrow out-of-range band so the
        # float->int32 window-origin conversion stays well-defined for
        # behind-camera projections; taps beyond +-1 of any pixel carry
        # zero triangle weight either way
        return (
            jnp.clip(x, -2.0, w_clip + 1.0),
            jnp.clip(y, -2.0, H + 1.0),
        )

    def chunk_coords(r, c):
        # full-lane row loads with a dynamic sublane index are the only
        # dynamic access pattern Mosaic lowers here; chunking happens on the
        # loaded array with static offsets (and clipping after the slice —
        # Mosaic rejects broadcasting a sliced-after-elementwise layout)
        x = x_ref[0, pl.ds(r, 1), :][:, c * Tc:(c + 1) * Tc]  # (1, Tc)
        y = y_ref[0, pl.ds(r, 1), :][:, c * Tc:(c + 1) * Tc]
        x, y = _clip_xy(x, y)
        y0 = jnp.floor(jnp.min(y)).astype(jnp.int32) - 1
        y0 = jnp.clip((y0 // align) * align, 0, max(y_hi, 0))
        return x, y, y0

    def row_origin(r):
        # one y-band per ROW (the wrapper's documented exactness condition
        # is row-level coverage): HBM mode DMAs the band once per row
        # instead of once per column chunk — 1/n_chunks the HBM traffic
        _, y = _clip_xy(*(
            (x_ref[0, pl.ds(r, 1), :], y_ref[0, pl.ds(r, 1), :])
        ))
        y0 = jnp.floor(jnp.min(y)).astype(jnp.int32) - 1
        return jnp.clip((y0 // align) * align, 0, max(y_hi, 0))

    def interp(win, x, y, y0):
        ax = jnp.maximum(0.0, 1.0 - jnp.abs(jx - x))  # (W, Tc)
        tmp = jnp.dot(
            win, ax.astype(cdt), preferred_element_type=jnp.float32,
            precision=prec,
        )  # (whC, Tc)
        ay = jnp.maximum(0.0, 1.0 - jnp.abs(y - y0.astype(jnp.float32) - yoff))
        return jnp.dot(
            sel, (tmp * ay).astype(cdt),
            preferred_element_type=jnp.float32, precision=prec,
        )  # (Cp, Tc)

    if resident:

        def row_body(r, _):
            outs = []
            for c in range(n_chunks):
                x, y, y0 = chunk_coords(r, c)
                win = imgs_ref[
                    0, pl.ds(pl.multiple_of(y0 * Cp, align * Cp), whC), :
                ]
                outs.append(interp(win, x, y, y0))
            row = outs[0] if n_chunks == 1 else jnp.concatenate(outs, axis=1)
            out_ref[0, pl.ds(r, 1), :, :] = row[None]
            return _

        jax.lax.fori_loop(0, RB, row_body, 0)
        return

    band_scratch, band_sem = scratch

    def band_dma(slot, r):
        y0 = row_origin(r)
        return pltpu.make_async_copy(
            imgs_ref.at[
                pl.ds(v, 1), pl.ds(pl.multiple_of(y0 * Cp, align * Cp), whC), :
            ],
            band_scratch.at[pl.ds(slot, 1)],
            band_sem.at[slot % 2 if isinstance(slot, int) else slot],
        )

    band_dma(0, 0).start()

    def row_body(r, carry):
        slot = r % 2
        # prefetch the next row's band while this row computes
        @pl.when(r + 1 < RB)
        def _prefetch():
            band_dma((slot + 1) % 2, r + 1).start()

        band_dma(slot, r).wait()
        band = band_scratch[pl.ds(slot, 1), :, :].reshape(whC, W)
        y0 = row_origin(r)
        outs = []
        for c in range(n_chunks):
            x, y, _ = chunk_coords(r, c)
            outs.append(interp(band, x, y, y0))
        row = outs[0] if n_chunks == 1 else jnp.concatenate(outs, axis=1)
        out_ref[0, pl.ds(r, 1), :, :] = row[None]
        return carry

    jax.lax.fori_loop(0, RB, row_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "window_h", "padding_mode", "row_block", "compute_dtype", "interpret",
    ),
)
def fused_row_sample(
    imgs: jnp.ndarray,  # (V, H, W, C) float32 source maps
    x: jnp.ndarray,  # (V, R, T) source x coords per output row
    y: jnp.ndarray,  # (V, R, T)
    window_h: int = 16,
    padding_mode: str = "border",
    row_block: int = 0,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Bilinear-sample ``imgs`` at per-row smooth coordinate curves.

    Returns (V, R, T, C). Matches ops/sampling.grid_sample_2d per sample when
    each row-chunk's valid taps fit its y-band.
    """
    V, H, W, C = imgs.shape
    _, R, T = x.shape
    cdt = jnp.dtype(compute_dtype)
    # pad the sample axis to a multiple of 128 so in-kernel column chunks
    # land on aligned lane offsets (padded outputs are sliced away)
    T_in = T
    T_k = -(-T // 128) * 128
    if T_k != T:
        pad = ((0, 0), (0, 0), (0, T_k - T))
        # edge padding keeps each chunk's coordinate min/max inside the
        # real range so window origins are unaffected
        x = jnp.pad(x, pad, mode="edge")
        y = jnp.pad(y, pad, mode="edge")
        T = T_k
    Cp, align, window_k = _pack_geometry(C, window_h, H)
    if Cp != C:
        imgs = jnp.pad(imgs, ((0, 0), (0, 0), (0, 0), (0, Cp - C)))
    # pad width to the lane tile so HBM band-DMA slices are 128-aligned
    # (zero columns only ever contribute zero-weight or zero-value taps)
    W_clip = W
    W_pad = -(-W // 128) * 128
    if W_pad != W:
        imgs = jnp.pad(imgs, ((0, 0), (0, 0), (0, W_pad - W), (0, 0)))
        W = W_pad
    window_h = min(window_h, H)
    whC = window_k * Cp

    # column chunk so the (whC, Tc) temporaries stay ~<=1MB of VMEM
    col_chunk = max(2**20 // (whC * 4), 128)

    imgs_bytes = H * Cp * W_pad * cdt.itemsize
    resident = imgs_bytes <= 6 * 2**20
    fixed = imgs_bytes if resident else 2 * whC * W_pad * cdt.itemsize
    temps = 6 * whC * min(col_chunk, T) * 4

    # auto row block: double-buffered out + coord blocks must fit VMEM next
    # to the resident image (or the DMA band scratch)
    T_pad = -(-T // 128) * 128
    budget = 12 * 2**20 - fixed - temps
    cands = [R] + [r for r in range(8, R, 8) if R % r == 0]
    fitting = [
        r for r in cands
        if 2 * r * (Cp * T_pad * 4 + 2 * T_pad * 4) <= max(budget, 2**19)
    ]
    RB = max(fitting) if fitting else min(cands)
    if row_block and row_block < RB:
        smaller = [r for r in fitting if r <= row_block] or [min(cands)]
        RB = max(smaller)

    imgs_t = jnp.swapaxes(imgs, 2, 3).reshape(V, H * Cp, W).astype(cdt)

    kernel = functools.partial(
        _sample_kernel,
        H=H, W=W, Cp=Cp, T=T, RB=RB,
        window_h=(window_h, align, window_k),
        padding_mode=padding_mode, cdt=cdt,
        col_chunk=col_chunk, resident=resident, w_clip=W_clip,
    )
    if resident:
        img_spec = pl.BlockSpec(
            (1, H * Cp, W), lambda v, rb: (v, 0, 0),
            memory_space=pltpu.VMEM,
            # constant across rb: single-buffer the resident image
            pipeline_mode=pl.Buffered(buffer_count=1),
        )
        scratch_shapes = []
    else:
        img_spec = pl.BlockSpec(memory_space=pltpu.HBM)
        scratch_shapes = [
            pltpu.VMEM((2, whC, W), cdt),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    out = pl.pallas_call(
        kernel,
        grid=(V, R // RB),
        in_specs=[
            img_spec,
            pl.BlockSpec(
                (1, RB, T), lambda v, rb: (v, rb, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, RB, T), lambda v, rb: (v, rb, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, RB, Cp, T), lambda v, rb: (v, rb, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((V, R, Cp, T), jnp.float32),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(imgs_t, x.astype(jnp.float32), y.astype(jnp.float32))
    return jnp.moveaxis(out[:, :, :, :T_in], 2, -1)[..., :C]  # (V, R, T, C)
