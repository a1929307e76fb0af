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
