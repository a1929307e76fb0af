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
  lanes. Three source-access modes: small images stay RESIDENT in VMEM
  for the whole grid step (per-chunk window origins); large ones stay in
  HBM with one y-BAND DMA per row (row-level y origin), double-buffered
  against the previous row's compute; with ``chunk_bands`` + an x-window,
  a (window_k*Cp, Wx) band is DMA'd per (row, chunk) at per-chunk y/x
  origins — tighter windows, more DMAs (the autotuner costs both).
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


def _col_chunk_size(T: int, col_chunk: int) -> int:
    """In-kernel column chunk: the largest 128-multiple divisor of T at most
    ``col_chunk`` (T is pre-padded to a multiple of 128 by the wrapper, so
    chunk boundaries land on aligned lane offsets)."""
    mults = [d for d in range(128, T + 1, 128) if T % d == 0] or [T]
    cap = max(col_chunk, 128) if col_chunk else T
    return max([d for d in mults if d <= cap] or [min(mults)])


def _divisor_chunk(tc_parent: int, cap: int) -> int:
    """Largest 128-multiple divisor of ``tc_parent`` at most ``cap``.

    Keeping every finer chunking a DIVISOR of the canonical one makes each
    finer chunk a sub-range of exactly one canonical chunk, so its min-x /
    min-y window origins are >= the canonical chunk's and its windows cover
    every tap a canonical-chunk (coverage-validated) window covered."""
    divs = [d for d in range(128, tc_parent + 1, 128) if tc_parent % d == 0]
    return max([d for d in divs if d <= cap] or [128])


def _chunk_geometry(
    T: int, whC: int, resident: bool, Wx: int, chunk_bands: bool
):
    """(Tc, chunked): the forward kernel's actual column chunk and whether
    the chunked-band DMA mode is active.

    Canonical chunk Tc_std bounds the (whC, Tc) temporaries to ~1MB. The
    chunked-band mode (``chunk_bands`` opted in, non-resident image, an
    x-window set) re-chunks to a DIVISOR of Tc_std under a quarter budget:
    smaller chunks give tighter per-chunk y/x window origins — the point
    of the mode — and each is a sub-range of one canonical chunk, so
    canonical-chunk coverage remains a conservative exactness check (see
    ``_divisor_chunk``). It is opt-in because it re-fetches a band per
    chunk: profitable only when the resulting y-window shrink beats the
    extra HBM traffic (the autotuner costs both modes)."""
    tc_std = _col_chunk_size(T, max(2**20 // (whC * 4), 128))
    chunked = chunk_bands and (not resident) and Wx > 0
    if chunked:
        return _divisor_chunk(tc_std, max(2**18 // (whC * 4), 128)), True
    return tc_std, False


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
    Wx: int,  # x-window width (128-multiple) or 0 = full source width
    chunked: bool = False,  # per-(row, chunk) band DMA mode
):
    align = window_h[1]
    window_k = window_h[2]
    window_h = window_h[0]
    whC = window_k * Cp
    Tc = _col_chunk_size(T, col_chunk)
    n_chunks = T // Tc
    Wk = Wx or W  # x extent of the interpolation contraction
    chan = jax.lax.broadcasted_iota(jnp.int32, (Cp, whC), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Cp, whC), 1)
    sel = (lane % Cp == chan).astype(cdt)  # (Cp, whC)
    yoff = (
        jax.lax.broadcasted_iota(jnp.int32, (whC, Tc), 0) // Cp
    ).astype(jnp.float32)
    jx = jax.lax.broadcasted_iota(jnp.int32, (Wk, Tc), 0).astype(jnp.float32)
    y_hi = ((H - window_k) // align) * align
    x_hi = max(W - Wk, 0)
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
        if Wx:
            # per-chunk x-window origin, 128-lane aligned (the x contraction
            # then spans Wx instead of the full source width)
            x0 = jnp.floor(jnp.min(x)).astype(jnp.int32) - 1
            x0 = jnp.clip((x0 // 128) * 128, 0, x_hi)
        else:
            x0 = jnp.zeros((), jnp.int32)
        return x, y, y0, x0

    def row_origin(r):
        # one y-band per ROW (the wrapper's documented exactness condition
        # is row-level coverage): HBM mode DMAs the band once per row
        # instead of once per column chunk — 1/n_chunks the HBM traffic
        _, y = _clip_xy(*(
            (x_ref[0, pl.ds(r, 1), :], y_ref[0, pl.ds(r, 1), :])
        ))
        y0 = jnp.floor(jnp.min(y)).astype(jnp.int32) - 1
        return jnp.clip((y0 // align) * align, 0, max(y_hi, 0))

    def interp(win, x, y, y0, x0):
        # win is the (whC, Wk) slice starting at lane x0 (x0 = 0 when Wx off)
        ax = jnp.maximum(
            0.0, 1.0 - jnp.abs(jx + x0.astype(jnp.float32) - x)
        )  # (Wk, Tc)
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
                x, y, y0, x0 = chunk_coords(r, c)
                ysl = pl.ds(pl.multiple_of(y0 * Cp, align * Cp), whC)
                if Wx:
                    win = imgs_ref[0, ysl, pl.ds(pl.multiple_of(x0, 128), Wx)]
                else:
                    win = imgs_ref[0, ysl, :]
                outs.append(interp(win, x, y, y0, x0))
            row = outs[0] if n_chunks == 1 else jnp.concatenate(outs, axis=1)
            out_ref[0, pl.ds(r, 1), :, :] = row[None]
            return _

        jax.lax.fori_loop(0, RB, row_body, 0)
        return

    band_scratch, band_sem = scratch

    if chunked:
        # per-(row, chunk) band DMA: each column chunk fetches only its own
        # (window_k*Cp, Wx) source window at per-chunk y/x origins — bands
        # are as tight as the resident mode's, so far smaller y-windows
        # validate than with one band per row (the row's whole y-span).
        # Double-buffered across the chunk sequence; every chunk is a
        # sub-range of a canonical chunk (see _chunk_geometry), so
        # canonical coverage implies no tap is dropped.
        def cband_dma(slot, y0, x0):
            return pltpu.make_async_copy(
                imgs_ref.at[
                    pl.ds(v, 1),
                    pl.ds(pl.multiple_of(y0 * Cp, align * Cp), whC),
                    pl.ds(pl.multiple_of(x0, 128), Wx),
                ],
                band_scratch.at[pl.ds(slot, 1)],
                band_sem.at[slot % 2 if isinstance(slot, int) else slot],
            )

        def origin(r, c):
            _, _, y0, x0 = chunk_coords(r, c)
            return y0, x0

        y00, x00 = origin(0, 0)
        cband_dma(0, y00, x00).start()

        def row_body(r, carry):
            outs = []
            for c in range(n_chunks):
                slot = (r * n_chunks + c) % 2
                nslot = (slot + 1) % 2
                if c + 1 < n_chunks:
                    y0n, x0n = origin(r, c + 1)
                    cband_dma(nslot, y0n, x0n).start()
                else:

                    @pl.when(r + 1 < RB)
                    def _prefetch():
                        y0n, x0n = origin(r + 1, 0)
                        cband_dma(nslot, y0n, x0n).start()

                x, y, y0, x0 = chunk_coords(r, c)
                cband_dma(slot, y0, x0).wait()
                win = band_scratch[pl.ds(slot, 1)].reshape(whC, Wx)
                outs.append(interp(win, x, y, y0, x0))
            row = outs[0] if n_chunks == 1 else jnp.concatenate(outs, axis=1)
            out_ref[0, pl.ds(r, 1), :, :] = row[None]
            return carry

        jax.lax.fori_loop(0, RB, row_body, 0)
        return

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
        y0 = row_origin(r)
        outs = []
        for c in range(n_chunks):
            x, y, _, x0 = chunk_coords(r, c)
            if Wx:
                band = band_scratch[
                    pl.ds(slot, 1), :, pl.ds(pl.multiple_of(x0, 128), Wx)
                ].reshape(whC, Wx)
            else:
                band = band_scratch[pl.ds(slot, 1), :, :].reshape(whC, W)
            outs.append(interp(band, x, y, y0, x0))
        row = outs[0] if n_chunks == 1 else jnp.concatenate(outs, axis=1)
        out_ref[0, pl.ds(r, 1), :, :] = row[None]
        return carry

    jax.lax.fori_loop(0, RB, row_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "window_h", "padding_mode", "row_block", "compute_dtype", "interpret",
        "window_w", "raw_layout", "chunk_bands",
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
    window_w: int = 0,
    raw_layout: bool = False,
    chunk_bands: bool = False,
) -> jnp.ndarray:
    """Bilinear-sample ``imgs`` at per-row smooth coordinate curves.

    Returns (V, R, T, C). Matches ops/sampling.grid_sample_2d per sample when
    each row-chunk's valid taps fit its y-band — and, with ``window_w`` > 0,
    its per-chunk x-window of that many source columns (rounded up to the
    128-lane tile; 0 = contract over the full source width). The x-window
    cuts the dominant interpolation matmul's contraction from W to
    ~window_w; validate per geometry with ``row_sample_coverage``.

    With ``raw_layout`` the kernel's native output is returned untouched:
    (V, R, Cp, T_pad) — channels (zero-padded to Cp) in sublanes, the
    (padded) sample axis in lanes. This is the TPU-friendly layout (a
    trailing C < 128 pads 16x in HBM) consumed directly by the fused NeRF
    head (ops/pallas/enerf_head.py); padding geometry via
    ``row_sample_packing``.
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
    # x-window: round up to the lane tile; keep off when it cannot shrink
    # the contraction below the (padded) source width
    Wx = -(-window_w // 128) * 128 if window_w else 0
    if Wx >= W or Wx >= -(-W // 128) * 128:
        Wx = 0

    imgs_bytes = H * Cp * W_pad * cdt.itemsize
    resident = imgs_bytes <= 6 * 2**20
    # canonical column chunk (bounds (whC, Tc) temporaries to ~1MB) or the
    # finer divisor chunk of the per-(row, chunk) band-DMA mode
    col_chunk, chunked = _chunk_geometry(T, whC, resident, Wx, chunk_bands)
    band_w = Wx if chunked else W_pad
    fixed = imgs_bytes if resident else 2 * whC * band_w * cdt.itemsize
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
        col_chunk=col_chunk, resident=resident, w_clip=W_clip, Wx=Wx,
        chunked=chunked,
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
            pltpu.VMEM((2, whC, band_w), cdt),
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
    if raw_layout:
        return out  # (V, R, Cp, T_pad)
    return jnp.moveaxis(out[:, :, :, :T_in], 2, -1)[..., :C]  # (V, R, T, C)


def _sample_bwd_kernel(
    imgs_ref,  # ANY (V, H*Cp, W) f32 — source maps (HBM)
    x_ref,  # VMEM (1, RB, T) f32
    y_ref,  # VMEM (1, RB, T) f32
    g_ref,  # VMEM (1, RB, Cp, T) f32 — output cotangent, kernel layout
    _alias_ref,  # ANY (V, H*Cp, W) f32 — aliased to dimgs_ref (zeros in)
    dimgs_ref,  # ANY (V, H*Cp, W) f32 — accumulated via band RMW
    dx_ref,  # VMEM (1, RB, T) f32
    dy_ref,  # VMEM (1, RB, T) f32
    ibuf,  # VMEM scratch (1, whC, W) f32 — source band
    dbuf,  # VMEM scratch (1, whC, W) f32 — gradient band
    sems,  # DMA semaphores (3,)
    *,
    H: int,
    W: int,
    Cp: int,
    T: int,
    RB: int,
    window_h,  # (window_h, align, window_k)
    padding_mode: str,
    col_chunk: int,
    w_clip: int,
    Wx: int,
    chunked: bool = False,  # per-(row, chunk) band RMW (mirrors the forward)
):
    """Backward of ``fused_row_sample`` (see the forward kernel above).

    Per target row: recompute the forward's triangle weights (float32,
    HIGHEST precision — identical to the training forward) and emit

    * d_imgs via the transposed interpolation matmuls, accumulated with a
      read-modify-write of the row's y-band in HBM (bands of consecutive
      rows overlap, and grid steps run sequentially on the core, so the
      serialized read -> add -> write per row is race-free at any image
      size — unlike a VMEM-resident accumulator, which caps H*Cp*W);
    * d_x / d_y via the triangle-weight derivatives (for the caller's chain
      into projected coordinates and through them into depth). Window
      origins (floor/min) are piecewise constant and carry no gradient —
      exactly like the XLA windowed path.
    """
    align = window_h[1]
    window_k = window_h[2]
    whC = window_k * Cp
    Tc = _col_chunk_size(T, col_chunk)
    n_chunks = T // Tc
    Wk = Wx or W
    chan = jax.lax.broadcasted_iota(jnp.int32, (Cp, whC), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Cp, whC), 1)
    sel = (lane % Cp == chan).astype(jnp.float32)  # (Cp, whC)
    yoff = (
        jax.lax.broadcasted_iota(jnp.int32, (whC, Tc), 0) // Cp
    ).astype(jnp.float32)
    jx = jax.lax.broadcasted_iota(jnp.int32, (Wk, Tc), 0).astype(jnp.float32)
    y_hi = ((H - window_k) // align) * align
    x_hi = max(W - Wk, 0)
    prec = jax.lax.Precision.HIGHEST
    v = pl.program_id(0)

    def _clip_xy(x, y):
        if padding_mode == "border":
            return jnp.clip(x, 0.0, w_clip - 1), jnp.clip(y, 0.0, H - 1)
        return (
            jnp.clip(x, -2.0, w_clip + 1.0),
            jnp.clip(y, -2.0, H + 1.0),
        )

    def mm(a, b, dims):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(dims, ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    def row_origin(r):
        _, y = _clip_xy(x_ref[0, pl.ds(r, 1), :], y_ref[0, pl.ds(r, 1), :])
        y0 = jnp.floor(jnp.min(y)).astype(jnp.int32) - 1
        return jnp.clip((y0 // align) * align, 0, max(y_hi, 0))

    def band_copy(src_ref, dst_ref, y0, sem, x0=None):
        ysl = pl.ds(pl.multiple_of(y0 * Cp, align * Cp), whC)
        if x0 is None:
            src = src_ref.at[pl.ds(v, 1), ysl, :]
        else:
            src = src_ref.at[pl.ds(v, 1), ysl, pl.ds(pl.multiple_of(x0, 128), Wx)]
        return pltpu.make_async_copy(src, dst_ref, sem)

    def band_write(y0, x0=None):
        ysl = pl.ds(pl.multiple_of(y0 * Cp, align * Cp), whC)
        if x0 is None:
            dst = dimgs_ref.at[pl.ds(v, 1), ysl, :]
        else:
            dst = dimgs_ref.at[pl.ds(v, 1), ysl, pl.ds(pl.multiple_of(x0, 128), Wx)]
        return pltpu.make_async_copy(dbuf.at[pl.ds(0, 1)], dst, sems.at[2])

    def row_body(r, _):
        if chunked:
            y0 = None  # per-chunk bands (mirrors the forward's chunked mode)
        else:
            y0 = row_origin(r)
            y0f = y0.astype(jnp.float32)
            # serialized band RMW: the write of row r-1 completed before
            # this read was issued, so overlapping bands accumulate
            # correctly
            band_copy(imgs_ref, ibuf.at[pl.ds(0, 1)], y0, sems.at[0]).start()
            band_copy(dimgs_ref, dbuf.at[pl.ds(0, 1)], y0, sems.at[1]).start()
            band_copy(imgs_ref, ibuf.at[pl.ds(0, 1)], y0, sems.at[0]).wait()
            band_copy(dimgs_ref, dbuf.at[pl.ds(0, 1)], y0, sems.at[1]).wait()

        gxs, gys = [], []
        for c in range(n_chunks):
            xr = x_ref[0, pl.ds(r, 1), :][:, c * Tc:(c + 1) * Tc]  # (1, Tc)
            yr = y_ref[0, pl.ds(r, 1), :][:, c * Tc:(c + 1) * Tc]
            x, y = _clip_xy(xr, yr)
            if chunked:
                # per-chunk y/x origins, identical to the chunked forward;
                # serialized per-chunk read -> add -> write keeps
                # overlapping bands race-free
                yc0 = jnp.floor(jnp.min(y)).astype(jnp.int32) - 1
                yc0 = jnp.clip((yc0 // align) * align, 0, max(y_hi, 0))
                y0f = yc0.astype(jnp.float32)
                x0 = jnp.floor(jnp.min(x)).astype(jnp.int32) - 1
                x0 = jnp.clip((x0 // 128) * 128, 0, x_hi)
                band_copy(
                    imgs_ref, ibuf.at[pl.ds(0, 1)], yc0, sems.at[0], x0
                ).start()
                band_copy(
                    dimgs_ref, dbuf.at[pl.ds(0, 1)], yc0, sems.at[1], x0
                ).start()
                band_copy(
                    imgs_ref, ibuf.at[pl.ds(0, 1)], yc0, sems.at[0], x0
                ).wait()
                band_copy(
                    dimgs_ref, dbuf.at[pl.ds(0, 1)], yc0, sems.at[1], x0
                ).wait()
                win = ibuf[0]
            elif Wx:
                x0 = jnp.floor(jnp.min(x)).astype(jnp.int32) - 1
                x0 = jnp.clip((x0 // 128) * 128, 0, x_hi)
                x0a = pl.multiple_of(x0, 128)
                win = ibuf[0, :, pl.ds(x0a, Wx)]
            else:
                x0 = jnp.zeros((), jnp.int32)
                win = ibuf[0]
            g = g_ref[0, pl.ds(r, 1), :, :][0][:, c * Tc:(c + 1) * Tc]

            # --- recompute the forward's weights (float32 HIGHEST) ---
            ax = jnp.maximum(
                0.0, 1.0 - jnp.abs(jx + x0.astype(jnp.float32) - x)
            )  # (Wk, Tc)
            tmp = mm(win, ax, ((1,), (0,)))  # (whC, Tc)
            ydist = y - y0f - yoff
            ay = jnp.maximum(0.0, 1.0 - jnp.abs(ydist))  # (whC, Tc)

            # --- transposed interpolation: feature gradient ---
            d_ta = mm(sel, g, ((0,), (0,)))  # (whC, Tc)
            d_tmp = d_ta * ay
            d_win = mm(d_tmp, ax, ((1,), (1,)))  # (whC, Wk)
            if chunked:
                dbuf[0] = dbuf[0] + d_win
                wr = band_write(yc0, x0)
                wr.start()
                wr.wait()  # completes before the next chunk's dbuf read
            elif Wx:
                cur = dbuf[0, :, pl.ds(x0a, Wx)]
                dbuf[0, :, pl.ds(x0a, Wx)] = cur + d_win
            else:
                dbuf[0] = dbuf[0] + d_win

            # --- coordinate gradients through the triangle weights ---
            d_ax = mm(win, d_tmp, ((0,), (0,)))  # (Wk, Tc)
            xdist = jx + x0.astype(jnp.float32) - x
            dax_dx = jnp.where(jnp.abs(xdist) < 1.0, jnp.sign(xdist), 0.0)
            g_x = jnp.sum(d_ax * dax_dx, axis=0, keepdims=True)  # (1, Tc)
            d_ay = d_ta * tmp
            day_dy = jnp.where(jnp.abs(ydist) < 1.0, -jnp.sign(ydist), 0.0)
            g_y = jnp.sum(d_ay * day_dy, axis=0, keepdims=True)  # (1, Tc)

            # clip chain: clipped coordinates carry no gradient
            if padding_mode == "border":
                mx = ((xr >= 0.0) & (xr <= w_clip - 1)).astype(jnp.float32)
                my = ((yr >= 0.0) & (yr <= H - 1)).astype(jnp.float32)
            else:
                mx = ((xr >= -2.0) & (xr <= w_clip + 1.0)).astype(jnp.float32)
                my = ((yr >= -2.0) & (yr <= H + 1.0)).astype(jnp.float32)
            gxs.append(g_x * mx)
            gys.append(g_y * my)

        if not chunked:
            wr = band_write(y0)
            wr.start()
            wr.wait()

        gx_row = gxs[0] if n_chunks == 1 else jnp.concatenate(gxs, axis=1)
        gy_row = gys[0] if n_chunks == 1 else jnp.concatenate(gys, axis=1)
        dx_ref[0, pl.ds(r, 1), :] = gx_row
        dy_ref[0, pl.ds(r, 1), :] = gy_row
        return _

    jax.lax.fori_loop(0, RB, row_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "window_h", "padding_mode", "interpret", "window_w", "chunk_bands",
    ),
)
def _row_sample_bwd_impl(
    imgs, x, y, g, window_h, padding_mode, interpret, window_w,
    chunk_bands=False,
):
    """(d_imgs, d_x, d_y) for ``fused_row_sample`` at float32 compute.

    Mirrors the forward wrapper's padding/window geometry exactly; the
    cotangent ``g`` arrives in the public (V, R, T, C) layout.
    """
    V, H, W, C = imgs.shape
    _, R, T = x.shape
    T_in = T
    T_k = -(-T // 128) * 128
    g_k = jnp.moveaxis(g, -1, 2)  # (V, R, C, T)
    if T_k != T:
        pad = ((0, 0), (0, 0), (0, T_k - T))
        x = jnp.pad(x, pad, mode="edge")
        y = jnp.pad(y, pad, mode="edge")
        g_k = jnp.pad(g_k, ((0, 0), (0, 0), (0, 0), (0, T_k - T)))
        T = T_k
    Cp, align, window_k = _pack_geometry(C, window_h, H)
    if Cp != C:
        imgs = jnp.pad(imgs, ((0, 0), (0, 0), (0, 0), (0, Cp - C)))
        g_k = jnp.pad(g_k, ((0, 0), (0, 0), (0, Cp - C), (0, 0)))
    W_clip = W
    W_pad = -(-W // 128) * 128
    if W_pad != W:
        imgs = jnp.pad(imgs, ((0, 0), (0, 0), (0, W_pad - W), (0, 0)))
        W = W_pad
    window_h = min(window_h, H)
    whC = window_k * Cp
    Wx = -(-window_w // 128) * 128 if window_w else 0
    if Wx >= W or Wx >= -(-W // 128) * 128:
        Wx = 0

    # the diff forward runs at float32 compute: recompute its residency /
    # chunked-band mode from the same geometry so the backward's bands and
    # per-chunk origins are identical
    resident = H * Cp * W_pad * 4 <= 6 * 2**20
    Tc_f, chunked = _chunk_geometry(T, whC, resident, Wx, chunk_bands)

    # the backward keeps ~10 (whC, Tc) temporaries live (recomputed weights
    # plus their cotangents), so it runs at half the forward's VMEM budget.
    # Its chunk MUST divide the forward's: each backward chunk is then a
    # sub-range of exactly one forward chunk, so its min-x/min-y window
    # origins are >= the forward chunk's and its windows cover every tap
    # the forward (coverage-validated) windows covered. An independent
    # smaller chunk can straddle a forward-chunk boundary and silently
    # drop valid taps when window_w is active.
    col_chunk = _divisor_chunk(Tc_f, max(2**19 // (whC * 4), 128))

    # fixed VMEM: source band + gradient band scratch + matmul temporaries
    T_pad = -(-T // 128) * 128
    band_w = Wx if chunked else W_pad
    fixed = 2 * whC * band_w * 4
    temps = 10 * whC * min(col_chunk, T) * 4
    budget = 10 * 2**20 - fixed - temps
    cands = [R] + [r for r in range(8, R, 8) if R % r == 0]
    fitting = [
        r for r in cands
        if 2 * r * T_pad * 4 * (Cp + 4) <= max(budget, 2**19)
    ]
    RB = max(fitting) if fitting else min(cands)

    imgs_t = (
        jnp.swapaxes(imgs, 2, 3).reshape(V, H * Cp, W).astype(jnp.float32)
    )

    kernel = functools.partial(
        _sample_bwd_kernel,
        H=H, W=W, Cp=Cp, T=T, RB=RB,
        window_h=(window_h, align, window_k),
        padding_mode=padding_mode, col_chunk=col_chunk,
        w_clip=W_clip, Wx=Wx, chunked=chunked,
    )
    coord_spec = pl.BlockSpec(
        (1, RB, T), lambda v, rb: (v, rb, 0), memory_space=pltpu.VMEM
    )
    dimgs, dx, dy = pl.pallas_call(
        kernel,
        grid=(V, R // RB),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            coord_spec,
            coord_spec,
            pl.BlockSpec(
                (1, RB, Cp, T), lambda v, rb: (v, rb, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            coord_spec,
            coord_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((V, H * Cp, W), jnp.float32),
            jax.ShapeDtypeStruct((V, R, T), jnp.float32),
            jax.ShapeDtypeStruct((V, R, T), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, whC, band_w), jnp.float32),
            pltpu.VMEM((1, whC, band_w), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        input_output_aliases={4: 0},
        # the recompute+transpose keeps ~2x the forward's live temporaries;
        # worst-case (L0: Cp=36, window_k=36) Mosaic's stack accounting
        # lands ~22MB — raise the scoped-VMEM cap above the 16MB default
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=40 * 2**20,
        ),
        interpret=interpret,
    )(
        imgs_t,
        x.astype(jnp.float32),
        y.astype(jnp.float32),
        g_k.astype(jnp.float32),
        jnp.zeros((V, H * Cp, W), jnp.float32),
    )
    d_imgs = jnp.swapaxes(dimgs.reshape(V, H, Cp, W), 2, 3)
    d_imgs = d_imgs[:, :, :W_clip, :C]
    return d_imgs, dx[:, :, :T_in], dy[:, :, :T_in]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def fused_row_sample_diff(
    imgs,
    x,
    y,
    window_h: int = 16,
    padding_mode: str = "border",
    interpret: bool = False,
    window_w: int = 0,
    chunk_bands: bool = False,
):
    """Differentiable fused row sampler (full-image training path).

    Forward is the Pallas kernel at float32 compute; backward is a matching
    Pallas kernel (``_sample_bwd_kernel``), so full-image fine-tuning keeps
    the fused hot loop for the render-stage image sampling too (reference
    hot loop lib/networks/enerf/utils.py:753-786). Gradients flow to
    ``imgs`` and to the projected coordinates ``x``/``y`` (and through the
    caller's projection into depth) exactly like the XLA windowed path.
    The same exactness condition as the forward applies
    (``row_sample_coverage`` == 0 for the scene's geometry).
    """
    return fused_row_sample(
        imgs, x, y, window_h=window_h, padding_mode=padding_mode,
        compute_dtype=jnp.float32, interpret=interpret, window_w=window_w,
        chunk_bands=chunk_bands,
    )


def _frsd_fwd(imgs, x, y, window_h, padding_mode, interpret, window_w,
              chunk_bands):
    out = fused_row_sample(
        imgs, x, y, window_h=window_h, padding_mode=padding_mode,
        compute_dtype=jnp.float32, interpret=interpret, window_w=window_w,
        chunk_bands=chunk_bands,
    )
    return out, (imgs, x, y)


def _frsd_bwd(window_h, padding_mode, interpret, window_w, chunk_bands,
              res, g):
    imgs, x, y = res
    d_imgs, dx, dy = _row_sample_bwd_impl(
        imgs, x, y, g, window_h, padding_mode, interpret, window_w,
        chunk_bands=chunk_bands,
    )
    return d_imgs.astype(imgs.dtype), dx.astype(x.dtype), dy.astype(y.dtype)


fused_row_sample_diff.defvjp(_frsd_fwd, _frsd_bwd)


def row_sample_packing(C: int, window_h: int, H: int, T: int):
    """(Cp, T_pad) of the kernel's raw output layout for given inputs."""
    Cp, _, _ = _pack_geometry(C, window_h, H)
    return Cp, -(-T // 128) * 128


def row_sample_coverage(
    img_shape,  # (H, W, C)
    x: jnp.ndarray,  # (..., R, T) source x coords per output row
    y: jnp.ndarray,  # (..., R, T)
    window_h: int,
    window_w: int = 0,
    padding_mode: str = "border",
    chunk_bands: bool = False,
) -> jnp.ndarray:
    """Fraction of valid bilinear taps outside the kernel's windows
    (0.0 = ``fused_row_sample`` exact for this geometry and window config).

    Mirrors the kernel's chunking and aligned window origins; the x check
    reproduces the per-chunk 128-lane-aligned origin exactly (align-down
    can end the window earlier than an unaligned one, so a simple check
    would not be conservative there). The y check uses unaligned origins
    (conservative — the kernel's aligned window_k band always covers the
    simple window_h band) at canonical-chunk granularity when EVERY
    compute-dtype mode of the kernel uses per-chunk y origins — i.e. when
    an x-window is set (resident and chunked-band modes are both
    per-chunk) or the image is VMEM-resident even at float32; otherwise
    at row level (the band-per-row DMA mode). Finer kernel chunks are
    divisors of the canonical chunk, so canonical-chunk coverage bounds
    them (see _divisor_chunk)."""
    from boostmvsnerfs_tpu.ops import sampling

    H, W, C = img_shape
    R, T = x.shape[-2], x.shape[-1]
    x = jnp.reshape(x, (-1, T))
    y = jnp.reshape(y, (-1, T))
    Cp, align, window_k = _pack_geometry(C, window_h, H)
    whC = window_k * Cp
    W_pad = -(-W // 128) * 128
    Wx = -(-window_w // 128) * 128 if window_w else 0
    if Wx >= W_pad:
        Wx = 0
    T_k = -(-T // 128) * 128
    if T_k != T:
        pad = ((0, 0), (0, T_k - T))
        x = jnp.pad(x, pad, mode="edge")
        y = jnp.pad(y, pad, mode="edge")
    resident_f32 = H * Cp * W_pad * 4 <= 6 * 2**20
    resident_bf16 = H * Cp * W_pad * 2 <= 6 * 2**20
    # per-chunk y origins hold for EVERY compute-dtype mode (f32 training
    # + bf16 eval) iff the f32 image is resident (implies bf16 resident)
    # or the chunked-band mode is opted in with an x-window (resident and
    # chunked modes are both per-chunk); otherwise some mode samples one
    # band per ROW and the y check must be row-level
    per_chunk_y = resident_f32 or (chunk_bands and Wx > 0)
    if Wx > 0:
        # check at the coarsest chunking any dtype mode uses: canonical
        # when the bf16 image is resident (the f32 chunked mode's finer
        # divisor chunks are then covered — _divisor_chunk), the fine
        # chunked-band chunk when no mode is resident
        Tc, _ = _chunk_geometry(T_k, whC, resident_bf16, Wx, chunk_bands)
    else:
        Tc = _col_chunk_size(T_k, max(2**20 // (whC * 4), 128))
    n_chunks = T_k // Tc

    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)
    else:
        x = jnp.clip(x, -2.0, W + 1.0)
        y = jnp.clip(y, -2.0, H + 1.0)

    window_hh = min(window_h, H)
    xc = x.reshape(-1, n_chunks, Tc)
    yc = y.reshape(-1, n_chunks, Tc)
    if per_chunk_y:
        y0c = jnp.clip(
            jnp.floor(jnp.min(yc, axis=-1)).astype(jnp.int32) - 1,
            0, H - window_hh,
        )[..., None]  # (rows, n_chunks, 1) per-chunk origins
    else:
        y0 = jnp.clip(
            jnp.floor(jnp.min(y, axis=-1)).astype(jnp.int32) - 1,
            0, H - window_hh,
        )[:, None]  # (rows, 1) row-level origin
        y0c = jnp.broadcast_to(y0, (y0.shape[0], n_chunks))[..., None]
    if Wx:
        x0 = jnp.floor(jnp.min(xc, axis=-1)).astype(jnp.int32) - 1
        x0 = jnp.clip((x0 // 128) * 128, 0, max(W_pad - Wx, 0))[..., None]
        win_w = Wx
    else:
        x0 = jnp.zeros((xc.shape[0], n_chunks, 1), jnp.int32)
        win_w = W_pad
    return sampling.tap_miss_fraction(
        xc, yc, x0, y0c, window_hh, win_w, H, W
    )
