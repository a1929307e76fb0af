"""Fused MVSNeRF renderer MLP as a Pallas TPU kernel.

The XLA lowering of the per-sample MLP (reference
lib/networks/mvsnerf/network.py:152-229 ``Renderer_ours``) round-trips every
activation tensor (samples x width) through HBM between layers — at eval
scale (~10M samples) that is tens of GB of traffic. This kernel keeps all
weights and one block of activations resident in VMEM and runs the whole
trunk + heads per sample block.

Numerics: matmuls run in ``compute_dtype`` (bf16 by default) with float32
accumulation; nonlinearities in float32. Matches models.mvsnerf.RendererMLP
(same parameter pytree) within bf16 tolerance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# parameter order inside the kernel (matches RendererMLP's submodule names)
def _param_list(params, depth):
    names = ["pts_bias"] + [f"pts_{i}" for i in range(depth)] + [
        "alpha", "feature", "views_0", "rgb",
    ]
    leaves = []
    p = params["params"] if "params" in params else params
    for n in names:
        leaves.append(p[n]["kernel"])
        leaves.append(p[n]["bias"])
    return names, leaves


def _mlp_kernel(
    pts_ref,  # (NB, P) positional encoding | (NB, d) raw coords (encode_freqs)
    feat_ref,  # (NB, F)
    dirs_ref,  # (NB, 3pad)
    *wrefs,
    depth: int,
    skips: tuple,
    NB: int,
    cdt,
    encode_freqs: int = 0,
):
    out_ref = wrefs[-1]
    wrefs = wrefs[:-1]
    prec = (
        jax.lax.Precision.HIGHEST
        if cdt == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    def dense(x, i):
        k = wrefs[2 * i][...]
        b = wrefs[2 * i + 1][...]
        y = jnp.dot(
            x.astype(cdt), k.astype(cdt),
            preferred_element_type=jnp.float32, precision=prec,
        )
        return y + b[None].astype(jnp.float32)

    pts = pts_ref[...]
    if encode_freqs:
        # fold the positional encoding into the kernel: the (NB, 63)
        # encoding lives only in VMEM instead of round-tripping a
        # samples x 63 float32 tensor through HBM (models/mvsnerf.py
        # positional_encoding — identical [x, sin(2^k x), cos(2^k x)]
        # f-major layout, reference network.py:24-75). Built from WIDE
        # (NB, F*d) ops only: a per-frequency list of (NB, d) temporaries
        # lane-pads each to a full tile and blows Mosaic's scoped-VMEM
        # stack accounting (measured 102MB at NB=4096).
        Fq, dd = encode_freqs, pts.shape[-1]
        freqs = 2.0 ** (
            jax.lax.broadcasted_iota(jnp.int32, (1, Fq * dd), 1) // dd
        ).astype(jnp.float32)  # Mosaic iota must be integer-typed
        xt = jnp.tile(pts, (1, Fq)) * freqs
        pts = jnp.concatenate([pts, jnp.sin(xt), jnp.cos(xt)], axis=-1)
    bias = dense(feat_ref[...], 0)  # pts_bias
    h = pts
    for i in range(depth):
        h = jax.nn.relu(dense(h, 1 + i) * bias)
        if i in skips:
            h = jnp.concatenate([pts, h], axis=-1)
    alpha = jax.nn.relu(dense(h, 1 + depth))  # (NB, 1)
    feature = dense(h, 2 + depth)
    hv = jnp.concatenate([feature, dirs_ref[...]], axis=-1)
    hv = jax.nn.relu(dense(hv, 3 + depth))
    rgb = jax.nn.sigmoid(dense(hv, 4 + depth))  # (NB, 3)
    out_ref[...] = jnp.concatenate([rgb, alpha], axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "depth", "skips", "block", "compute_dtype", "interpret",
        "encode_freqs",
    ),
)
def fused_renderer_mlp(
    params,
    pts_enc: jnp.ndarray,  # (B, N, P) — raw (B, N, d) coords w/ encode_freqs
    feat: jnp.ndarray,  # (B, N, F)
    dirs: jnp.ndarray,  # (B, N, 3)
    depth: int = 6,
    skips: tuple = (4,),
    block: int = 4096,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    encode_freqs: int = 0,
) -> jnp.ndarray:
    """Apply the renderer MLP to every sample; returns (B, N, 4)."""
    B, N, P = pts_enc.shape
    F = feat.shape[-1]
    cdt = jnp.dtype(compute_dtype)
    names, leaves = _param_list(params, depth)

    x = pts_enc.reshape(B * N, P)
    f = feat.reshape(B * N, F)
    d = dirs.reshape(B * N, 3)
    total = B * N
    NB = min(block, total)
    padded = -(-total // NB) * NB
    if padded != total:
        x = jnp.pad(x, ((0, padded - total), (0, 0)))
        f = jnp.pad(f, ((0, padded - total), (0, 0)))
        d = jnp.pad(d, ((0, padded - total), (0, 0)))

    kernel = functools.partial(
        _mlp_kernel, depth=depth, skips=tuple(skips), NB=NB, cdt=cdt,
        encode_freqs=encode_freqs,
    )
    n_blocks = padded // NB

    def block_spec(dim):
        return pl.BlockSpec((NB, dim), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    weight_specs = [
        pl.BlockSpec(
            leaf.shape,
            lambda i, nd=len(leaf.shape): (0,) * nd,
            memory_space=pltpu.VMEM,
            pipeline_mode=pl.Buffered(buffer_count=1),
        )
        for leaf in leaves
    ]
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[block_spec(P), block_spec(F), block_spec(3)] + weight_specs,
        out_specs=pl.BlockSpec((NB, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded, 4), jnp.float32),
        # the 4096-sample block sits within ~512B of Mosaic's 16MB scoped
        # default at some grid sizes (double-buffered IO + ~3 live
        # (NB, 128) activations); give it headroom like the warp backward.
        # In-kernel encoding adds ~5 wide (NB, <=128) temporaries.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(40 if encode_freqs else 24) * 2**20,
        ),
        interpret=interpret,
    )(x, f, d, *leaves)
    return out[:total].reshape(B, N, 4)


def _mlp_rows_kernel(
    uvd_ref,  # VMEM (1, RB, du, T) raw reference-NDC coords
    vox_ref,  # VMEM (1, RB, Cv, T) neural-encoding-volume features
    col_ref,  # VMEM (1, V, RB, Cc, T) per-view rgb (3) + in-mask (1)
    dirs_ref,  # VMEM (1, RB, dd, T) viewdirs in the reference frame
    *wrefs,  # weight/bias refs, then out_ref (1, RB, 4, T)
    depth: int,
    skips: tuple,
    RB: int,
    V: int,
    cdt,
    encode_freqs: int,
):
    """Rows-layout MVSNeRF renderer: channels in SUBLANES, samples in
    LANES — the enerf_head.py layout (see its module docstring for why a
    trailing C < 128 is 16x-padded in HBM). Inputs arrive as the samplers
    emit them (tri_sample/img_sample ``raw_layout``), the 63ch positional
    encoding is built in VMEM from wide ops, and every dense layer is a
    ``(in, out) x (in, T)`` sublane contraction — the native lhsT MXU
    orientation with the wide sample axis keeping the MXU fed."""
    out_ref = wrefs[-1]
    wrefs = wrefs[:-1]
    prec = (
        jax.lax.Precision.HIGHEST
        if cdt == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    def dense(x, i):
        k = wrefs[2 * i][...]
        b = wrefs[2 * i + 1][...]
        y = jax.lax.dot_general(
            k.astype(cdt), x.astype(cdt),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        return y + b[:, None].astype(jnp.float32)

    T = out_ref.shape[-1]
    du = uvd_ref.shape[2]
    Fq = encode_freqs
    reps = 1 + 2 * Fq
    # wide-op positional encoding along sublanes: row j of the (du*reps, T)
    # block is x[j % du] * 2^((j - du) // du % Fq), passed through identity
    # / sin / cos by row range — matches models/mvsnerf.positional_encoding
    ridx = jax.lax.broadcasted_iota(jnp.int32, (du * reps, T), 0)
    fexp = jnp.where(ridx < du, 0, ((ridx - du) // du) % max(Fq, 1))
    fcol = 2.0 ** fexp.astype(jnp.float32)

    def row_body(r, carry):
        u = uvd_ref[0, r]  # (du, T)
        if Fq:
            xt = jnp.tile(u, (reps, 1)) * fcol
            enc = jnp.where(
                ridx < du, xt,
                jnp.where(ridx < du * (1 + Fq), jnp.sin(xt), jnp.cos(xt)),
            )
        else:
            enc = u
        feat = jnp.concatenate(
            [vox_ref[0, r]] + [col_ref[0, v, r] for v in range(V)], axis=0
        )  # (Cv + V*Cc, T)
        bias = dense(feat, 0)  # pts_bias -> (W, T)
        h = enc
        for i in range(depth):
            h = jax.nn.relu(dense(h, 1 + i) * bias)
            if i in skips:
                h = jnp.concatenate([enc, h], axis=0)
        alpha = jax.nn.relu(dense(h, 1 + depth))  # (1, T)
        feature = dense(h, 2 + depth)  # (W, T)
        hv = jnp.concatenate([feature, dirs_ref[0, r]], axis=0)
        hv = jax.nn.relu(dense(hv, 3 + depth))  # (W/2, T)
        rgb = jax.nn.sigmoid(dense(hv, 4 + depth))  # (3, T)
        out_ref[0, r] = jnp.concatenate([rgb, alpha], axis=0)
        return carry

    jax.lax.fori_loop(0, RB, row_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "depth", "skips", "compute_dtype", "interpret", "encode_freqs",
    ),
)
def fused_renderer_mlp_rows(
    params,
    uvd: jnp.ndarray,  # (B, R, du, T) raw coords (in-kernel encoding)
    vox: jnp.ndarray,  # (B, R, Cv, T)
    col: jnp.ndarray,  # (B, V, R, Cc, T) rgb+mask per view
    dirs: jnp.ndarray,  # (B, R, dd, T)
    depth: int = 6,
    skips: tuple = (4,),
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    encode_freqs: int = 10,
) -> jnp.ndarray:
    """Rows-layout renderer MLP; returns (B, R, 4, T) raw [rgb, alpha]."""
    B, R, du, T = uvd.shape
    V, Cc = col.shape[1], col.shape[3]
    Cv = vox.shape[2]
    dd = dirs.shape[2]
    cdt = jnp.dtype(compute_dtype)
    names, leaves = _param_list(params, depth)

    T_in = T
    T_k = -(-T // 128) * 128
    if T_k != T:  # zero-pad lanes; pad columns compute garbage, sliced off
        pad = ((0, 0), (0, 0), (0, 0), (0, T_k - T))
        uvd = jnp.pad(uvd, pad)
        vox = jnp.pad(vox, pad)
        col = jnp.pad(col, ((0, 0),) + pad)
        dirs = jnp.pad(dirs, pad)
        T = T_k

    # rows per grid step: bound the (RB, C, T) IO blocks to ~4MB
    per_row = (du + Cv + V * Cc + dd + 4) * T * 4
    cands = [r for r in range(1, R + 1) if R % r == 0]
    RB = max([r for r in cands if r * per_row <= 4 * 2**20] or [1])

    kernel = functools.partial(
        _mlp_rows_kernel, depth=depth, skips=tuple(skips), RB=RB, V=V,
        cdt=cdt, encode_freqs=encode_freqs,
    )

    def spec(c):
        return pl.BlockSpec(
            (1, RB, c, T), lambda b, rb: (b, rb, 0, 0),
            memory_space=pltpu.VMEM,
        )

    weight_specs = [
        pl.BlockSpec(
            leaf.shape,
            lambda b, rb, nd=len(leaf.shape): (0,) * nd,
            memory_space=pltpu.VMEM,
            pipeline_mode=pl.Buffered(buffer_count=1),
        )
        for leaf in leaves
    ]
    out = pl.pallas_call(
        kernel,
        grid=(B, R // RB),
        in_specs=[
            spec(du),
            spec(Cv),
            pl.BlockSpec(
                (1, V, RB, Cc, T), lambda b, rb: (b, 0, rb, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            spec(dd),
        ] + weight_specs,
        out_specs=spec(4),
        out_shape=jax.ShapeDtypeStruct((B, R, 4, T), jnp.float32),
        # ~8 live (192, T) f32 trunk activations per row plus the encoding
        # temporaries; Mosaic's stack accounting needs headroom over 16MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 2**20,
        ),
        interpret=interpret,
    )(uvd, vox, col, dirs, *leaves)
    return out[..., :T_in]
