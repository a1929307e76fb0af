"""Fused row-band trilinear volume sampling as a Pallas TPU kernel.

TPU-native replacement for the 3D ``F.grid_sample`` of the MVSNeRF render
path (reference lib/networks/mvsnerf/utils.py:357-383 ``index_point_feature``
— trilinear lookups of the neural encoding volume at every ray sample). XLA
lowers these to per-sample gathers that dominate MVSNeRF's runtime on TPU;
here each output row's samples read a (z-window x y-band) slab of the
volume fetched by ONE strided DMA into VMEM, and the three interpolations
fuse into two MXU matmuls plus a VPU mask:

* The volume is stored ``(Dp, Hp*C, Wp)`` — plane-major, (y, c) packed in
  sublanes, x in lanes. Per row-chunk a single ``[z0:z0+zw, y0*C:(y0+wh)*C,
  :]`` strided copy lands in a ``(zw, wh*C, Wp)`` scratch slab (double
  buffered against compute).
* The x contraction is a full-K matmul against triangle weights; the y and
  z interpolations fuse into one mask over the slab's sublanes; a constant
  channel-selection matmul reduces to C outputs.
* Zeros padding: out-of-volume taps carry zero triangle weight.

Rows must be ordered so coordinates vary smoothly within a row — for
MVSNeRF eval rays that is (target row, sample index) ordering, where a
row's z-span stays within a few planes. Exactness condition: every valid
tap of a row-chunk falls inside its (zw, wh) windows — validate with
``tri_window_coverage``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tri_kernel(
    vol_ref,  # HBM (B, Dp, Hp*C, Wp) compute dtype (full array; batch
    # indexed in-kernel — HBM refs cannot be blocked)
    x_ref,  # VMEM (1, RB, T) f32
    y_ref,  # VMEM (1, RB, T) f32
    z_ref,  # VMEM (1, RB, T) f32
    out_ref,  # VMEM (1, RB, C, T) f32
    band_scratch,  # VMEM (2, zw, wh*C, Wp)
    band_sem,  # DMA sems (2,)
    *,
    Dp: int,
    Hp: int,
    Wp: int,
    C: int,
    T: int,
    RB: int,
    window_h: int,
    window_z: int,
    align_y: int,
    cdt,
    col_chunk: int,
):
    wh, zw = window_h, window_z
    whC = wh * C
    M = zw * whC
    mults = [d for d in range(128, T + 1, 128) if T % d == 0] or [T]
    cap = max(col_chunk, 128) if col_chunk else T
    Tc = max([d for d in mults if d <= cap] or [min(mults)])
    n_chunks = T // Tc

    chan = jax.lax.broadcasted_iota(jnp.int32, (C, M), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (C, M), 1)
    sel = (lane % C == chan).astype(cdt)  # (C, M)
    sub = jax.lax.broadcasted_iota(jnp.int32, (M, Tc), 0)
    zoff = (sub // whC).astype(jnp.float32)
    yoff = ((sub % whC) // C).astype(jnp.float32)
    jx = jax.lax.broadcasted_iota(jnp.int32, (Wp, Tc), 0).astype(jnp.float32)
    y_hi = ((Hp - wh) // align_y) * align_y
    z_hi = Dp - zw
    prec = (
        jax.lax.Precision.HIGHEST
        if cdt == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    def chunk_coords(r, c):
        x = x_ref[0, pl.ds(r, 1), :][:, c * Tc:(c + 1) * Tc]  # (1, Tc)
        y = y_ref[0, pl.ds(r, 1), :][:, c * Tc:(c + 1) * Tc]
        z = z_ref[0, pl.ds(r, 1), :][:, c * Tc:(c + 1) * Tc]
        # zeros-padding-preserving clamp (any tap >= 1 pixel outside the
        # volume already has zero triangle weight); also normalizes the
        # chunk slices' vector layout so the mask broadcasts lower cleanly
        x = jnp.clip(x, -2.0, Wp + 1.0)
        y = jnp.clip(y, -2.0, Hp + 1.0)
        z = jnp.clip(z, -2.0, Dp + 1.0)
        y0 = jnp.floor(jnp.min(y)).astype(jnp.int32) - 1
        y0 = jnp.clip((y0 // align_y) * align_y, 0, max(y_hi, 0))
        z0 = jnp.floor(jnp.min(z)).astype(jnp.int32) - 1
        z0 = jnp.clip(z0, 0, max(z_hi, 0))
        return x, y, z, y0, z0

    b = pl.program_id(0)

    def band_dma(slot, r, c):
        _, _, _, y0, z0 = chunk_coords(r, c)
        return pltpu.make_async_copy(
            vol_ref.at[
                pl.ds(b, 1),
                pl.ds(z0, zw),
                pl.ds(pl.multiple_of(y0 * C, align_y * C), whC),
                :,
            ],
            band_scratch.at[pl.ds(slot, 1)],
            band_sem.at[slot % 2 if isinstance(slot, int) else slot],
        )

    band_dma(0, 0, 0).start()

    def row_body(r, carry):
        outs = []
        for c in range(n_chunks):
            slot = (r * n_chunks + c) % 2
            if c + 1 < n_chunks:
                band_dma((slot + 1) % 2, r, c + 1).start()
            else:

                @pl.when(r + 1 < RB)
                def _prefetch():
                    band_dma((slot + 1) % 2, r + 1, 0).start()

            band_dma(slot, r, c).wait()
            x, y, z, y0, z0 = chunk_coords(r, c)
            slab = band_scratch[pl.ds(slot, 1), :, :, :].reshape(M, Wp)
            ax = jnp.maximum(0.0, 1.0 - jnp.abs(jx - x))  # (Wp, Tc)
            tmp = jnp.dot(
                slab, ax.astype(cdt), preferred_element_type=jnp.float32,
                precision=prec,
            )  # (M, Tc)
            ay = jnp.maximum(
                0.0, 1.0 - jnp.abs(y - y0.astype(jnp.float32) - yoff)
            )
            az = jnp.maximum(
                0.0, 1.0 - jnp.abs(z - z0.astype(jnp.float32) - zoff)
            )
            outs.append(
                jnp.dot(
                    sel, (tmp * ay * az).astype(cdt),
                    preferred_element_type=jnp.float32, precision=prec,
                )
            )  # (C, Tc)
        row = outs[0] if n_chunks == 1 else jnp.concatenate(outs, axis=1)
        out_ref[0, pl.ds(r, 1), :, :] = row[None]
        return carry

    jax.lax.fori_loop(0, RB, row_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "window_h", "window_z", "row_block", "compute_dtype", "interpret",
        "raw_layout",
    ),
)
def fused_tri_sample(
    vol: jnp.ndarray,  # (B, Dp, Hp, Wp, C) float32
    x: jnp.ndarray,  # (B, R, T) volume x coords (align-corners pixel units)
    y: jnp.ndarray,  # (B, R, T)
    z: jnp.ndarray,  # (B, R, T) plane coordinate
    window_h: int = 16,
    window_z: int = 4,
    row_block: int = 0,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    raw_layout: bool = False,
) -> jnp.ndarray:
    """Trilinear-sample ``vol`` at per-row smooth coordinate curves.

    Returns (B, R, T, C), matching ops/sampling.grid_sample_3d with zeros
    padding when each row-chunk's valid taps fit its (window_z, window_h)
    windows. With ``raw_layout`` the kernel's native channels-in-sublanes
    output is returned untouched — (B, R, C, T) — for consumers that keep
    the rows pipeline (a trailing C < 128 pads 16x in HBM tiling; see
    ops/pallas/enerf_head.py's layout note).
    """
    B, Dp, Hp, Wp, C = vol.shape
    _, R, T = x.shape
    cdt = jnp.dtype(compute_dtype)
    T_in = T
    T_k = -(-T // 128) * 128
    if T_k != T:
        pad = ((0, 0), (0, 0), (0, T_k - T))
        x = jnp.pad(x, pad, mode="edge")
        y = jnp.pad(y, pad, mode="edge")
        z = jnp.pad(z, pad, mode="edge")
        T = T_k
    Wp_in = Wp
    Wp_k = -(-Wp // 128) * 128
    if Wp_k != Wp:
        vol = jnp.pad(vol, ((0, 0), (0, 0), (0, 0), (0, Wp_k - Wp), (0, 0)))
        Wp = Wp_k
    align_y = max(16 // C, 1)
    window_h = max(min(window_h, Hp), align_y)
    window_z = min(window_z, Dp)
    whC = window_h * C

    col_chunk = max(2**20 // (window_z * whC * 4), 128)

    T_pad = T
    slab = 2 * window_z * whC * Wp * cdt.itemsize
    temps = 6 * window_z * whC * min(col_chunk, T) * 4
    budget = 12 * 2**20 - slab - temps
    cands = [R] + [r for r in range(8, R, 8) if R % r == 0]
    fitting = [
        r for r in cands
        if 2 * r * (C * T_pad * 4 + 3 * T_pad * 4) <= max(budget, 2**19)
    ]
    RB = max(fitting) if fitting else min(cands)
    if row_block and row_block < RB:
        smaller = [r for r in fitting if r <= row_block] or [min(cands)]
        RB = max(smaller)

    # (B, Dp, Hp*C, Wp): plane-major, (y, c) sublanes, x lanes
    vol_t = jnp.swapaxes(vol, 3, 4).reshape(B, Dp, Hp * C, Wp).astype(cdt)

    kernel = functools.partial(
        _tri_kernel,
        Dp=Dp, Hp=Hp, Wp=Wp, C=C, T=T, RB=RB,
        window_h=window_h, window_z=window_z, align_y=align_y, cdt=cdt,
        col_chunk=col_chunk,
    )
    coord_spec = pl.BlockSpec(
        (1, RB, T), lambda b, rb: (b, rb, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, R // RB),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            coord_spec, coord_spec, coord_spec,
        ],
        out_specs=pl.BlockSpec(
            (1, RB, C, T), lambda b, rb: (b, rb, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, R, C, T), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, window_z, whC, Wp), cdt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(
        vol_t,
        x.astype(jnp.float32),
        y.astype(jnp.float32),
        z.astype(jnp.float32),
    )
    del Wp_in
    if raw_layout:
        return out[:, :, :, :T_in]  # (B, R, C, T)
    return jnp.moveaxis(out[:, :, :, :T_in], 2, -1)  # (B, R, T, C)


def tri_window_coverage(
    vol_shape, x, y, z, window_h: int, window_z: int, col_chunk: int = 0
):
    """Fraction of valid trilinear taps outside the kernel's windows
    (0.0 = fused kernel exact). Mirrors the kernel's per-chunk origins."""
    Dp, Hp, Wp, C = vol_shape[-4:]
    align_y = max(16 // C, 1)
    window_h = max(min(window_h, Hp), align_y)
    window_z = min(window_z, Dp)
    R, T = x.shape[-2:]
    x = x.reshape(-1, T)
    y = y.reshape(-1, T)
    z = z.reshape(-1, T)

    def origins(v, lo_align, hi):
        v0 = jnp.floor(jnp.min(v, axis=-1)).astype(jnp.int32) - 1
        v0 = jnp.clip((v0 // lo_align) * lo_align, 0, max(hi, 0))
        return v0[:, None]

    y0 = origins(y, align_y, ((Hp - window_h) // align_y) * align_y)
    z0 = origins(z, 1, Dp - window_z)
    total = jnp.zeros((), jnp.float32)
    missed = jnp.zeros((), jnp.float32)
    for tap, v0, win, size in (
        (y, y0, window_h, Hp),
        (z, z0, window_z, Dp),
    ):
        tf = jnp.floor(tap).astype(jnp.int32)
        for d in (0, 1):
            t = tf + d
            valid = (t >= 0) & (t <= size - 1)
            out = (t < v0) | (t > v0 + win - 1)
            total = total + jnp.sum(valid)
            missed = missed + jnp.sum(valid & out)
    return missed / jnp.maximum(total, 1)
