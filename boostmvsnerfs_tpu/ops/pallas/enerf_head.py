"""Fused ENeRF IBR head (Agg pooling + radiance MLP) as a Pallas TPU kernel.

The ENeRF NeRF head (reference lib/networks/enerf/nerf.py:6-89) is a chain
of ~15 tiny dense layers over (rays x samples x views) points. Per-layer
FLOPs are negligible, but under plain XLA every intermediate activation
tensor round-trips HBM — at flagship eval scale (K=4 volumes x 353k rays x
2 samples x 3 views) that is tens of activation tensors of ~0.3-1GB each,
making the head *bandwidth*-bound at ~30-50ms/frame while its roofline is
~1ms. This kernel runs the whole head (view conditioning, mean/var stats,
softmax view pooling, sigma + color-blend heads) for one target row at a
time entirely in VMEM: HBM traffic collapses to one read of the inputs and
one write of the raw radiance.

Layout — channels in SUBLANES, samples in LANES throughout. A trailing
channel dim < 128 pads 16x in TPU HBM tiling; the sample axis T = W_r * Ns
is the only large axis, so it owns the lanes:

* feat  (B, S, R, Cp, T) — the fused row sampler's raw output
  (ops/pallas/img_sample.py ``raw_layout``), no transpose in between.
* dirs  (B, S, R, 4, T) — ray-difference descriptors.
* vox   (B, R, Cv, T) — voxel features (ops/sampling.plane_resample_z_rows).
* out   (B, R, 4, T) — [rgb, sigma] per sample.

Every matmul contracts the (small) channel dim, which sits in sublanes of
both operands — the native lhsT MXU orientation — with the wide T axis in
lanes keeping the MXU fed.

Numerics: float32 activations; matmuls at the backend-default precision
(bf16 multipliers on TPU) with float32 accumulation — the same contraction
numerics as the flax path's nn.Dense on TPU. Parameters are the same
pytree leaves as models/nerf_head.NeRFHead (the flax module passes its own
params in), so checkpoint porting is unaffected.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _head_kernel(
    vox_ref,  # VMEM (1, RB, Cv, T) f32 (Cv=8, dummy Cv=1 if unused)
    feat_ref,  # VMEM (1, S, RB, Cp, T) f32 — per-view features incl. RGB
    dirs_ref,  # VMEM (1, S, RB, 4, T) f32 — ray-difference descriptors
    *wrefs,  # weight/bias refs, then out_ref (1, RB, 4, T)
    S: int,
    C: int,  # true per-view channels (<= Cp)
    hid_n: int,
    RB: int,
    T: int,
    viewdir_agg: bool,
    use_vox_feat: bool,
):
    out_ref = wrefs[-1]
    wrefs = list(wrefs[:-1])
    prec = jax.lax.Precision.DEFAULT

    def take():
        k = wrefs.pop(0)[...]
        b = wrefs.pop(0)[...]
        return k, b.astype(jnp.float32)[:, None]  # bias broadcast over lanes

    # ct(x (K, T), k (K, O)) -> (O, T): contract the channel dim (sublanes
    # of both operands — the native lhsT MXU orientation)
    def ct(x, k):
        return jax.lax.dot_general(
            k, x, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    if viewdir_agg:
        kv, bv = take()
    kg, bg = take()  # global_fc (3C, 32)
    ka, ba = take()  # agg_w_fc (32, 1)
    kf, bf = take()  # fc (32, 16)
    kl, bl = take()  # lr0 (24|16, 64)
    ks, bs = take()  # sigma (64, 1)
    kc, bc = take()  # color0 (Dx + C + 4, 64)
    kc1, bc1 = take()  # color1 (64, 1)

    # constant selection: rgb lanes C-3..C-1 -> output rows 0..2
    row4 = jax.lax.broadcasted_iota(jnp.int32, (4, C), 0)
    colC = jax.lax.broadcasted_iota(jnp.int32, (4, C), 1)
    sel_rgb = ((colC - (C - 3) == row4) & (row4 < 3)).astype(jnp.float32)

    Cp = feat_ref.shape[3]
    Cv = vox_ref.shape[2]

    def row_body(r, _):
        f0 = [
            feat_ref[0, s, pl.ds(r, 1)].reshape(Cp, T)[:C] for s in range(S)
        ]  # (C, T) original per-view features
        ds = [
            dirs_ref[0, s, pl.ds(r, 1)].reshape(4, T) for s in range(S)
        ]  # (4, T)

        # --- Agg: view conditioning + mean/var stats + softmax pooling ---
        if viewdir_agg:
            fs = [f + jax.nn.relu(ct(d, kv) + bv) for f, d in zip(f0, ds)]
        else:
            fs = f0
        ssum = fs[0]
        ssq = fs[0] * fs[0]
        for f in fs[1:]:
            ssum = ssum + f
            ssq = ssq + f * f
        avg = ssum * (1.0 / S)
        var = ssq * (1.0 / S) - avg * avg
        stat = ct(var, kg[C:2 * C]) + ct(avg, kg[2 * C:]) + bg  # (32, T)
        gs = [jax.nn.relu(ct(f, kg[:C]) + stat) for f in fs]
        ws = [jax.nn.relu(ct(g, ka) + ba) for g in gs]  # (1, T)
        m = ws[0]
        for w in ws[1:]:
            m = jnp.maximum(m, w)
        es = [jnp.exp(w - m) for w in ws]
        z = es[0]
        for e in es[1:]:
            z = z + e
        inv_z = 1.0 / z
        im = gs[0] * (es[0] * inv_z)
        for g, e in zip(gs[1:], es[1:]):
            im = im + g * (e * inv_z)
        aggf = jax.nn.relu(ct(im, kf) + bf)  # (16, T)

        # --- trunk + sigma (lr0 kernel split over [vox, agg]) ---
        if use_vox_feat:
            vox = vox_ref[0, pl.ds(r, 1)].reshape(Cv, T)[:8]  # (8, T)
            x = jax.nn.relu(ct(vox, kl[:8]) + ct(aggf, kl[8:]) + bl)
        else:
            x = jax.nn.relu(ct(aggf, kl) + bl)  # (64, T)
        sigma = jax.nn.softplus(ct(x, ks) + bs)  # (1, T)

        # --- color: softmax blend over source-view RGB ---
        # color0 kernel rows: [x(hid), vox(8)?, agg(16), feat(C), dir(4)]
        off = hid_n
        base = ct(x, kc[:off]) + bc
        if use_vox_feat:
            base = base + ct(vox, kc[off:off + 8])
            off += 8
        base = base + ct(aggf, kc[off:off + 16])
        off += 16
        cs = [
            jax.nn.relu(
                ct(
                    jax.nn.relu(
                        base + ct(f, kc[off:off + C]) + ct(d, kc[off + C:])
                    ),
                    kc1,
                )
                + bc1
            )
            for f, d in zip(f0, ds)
        ]  # (1, T) each
        m = cs[0]
        for c in cs[1:]:
            m = jnp.maximum(m, c)
        es = [jnp.exp(c - m) for c in cs]
        z = es[0]
        for e in es[1:]:
            z = z + e
        inv_z = 1.0 / z
        rgb_acc = f0[0] * (es[0] * inv_z)
        for f, e in zip(f0[1:], es[1:]):
            rgb_acc = rgb_acc + f * (e * inv_z)  # (C, T)

        out = ct(rgb_acc, jnp.swapaxes(sel_rgb, 0, 1))  # (4, T) rgb rows
        out = out + sigma * (
            jax.lax.broadcasted_iota(jnp.int32, (4, 1), 0) == 3
        ).astype(jnp.float32)
        out_ref[0, pl.ds(r, 1)] = out[None]
        return _

    jax.lax.fori_loop(0, RB, row_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "C", "viewdir_agg", "use_vox_feat", "hid_n", "row_block", "interpret",
    ),
)
def fused_nerf_head(
    leaves,  # flat tuple: (kernel, bias) per layer (view_fc first if used)
    vox: jnp.ndarray | None,  # (B, R, 8, T) or None
    feat: jnp.ndarray,  # (B, S, R, Cp, T) channels-in-sublanes (raw_layout)
    dirs: jnp.ndarray,  # (B, S, R, 4, T)
    C: int,  # true per-view channels (feat may be zero-padded to Cp)
    viewdir_agg: bool = True,
    use_vox_feat: bool = True,
    hid_n: int = 64,
    row_block: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Raw radiance (B, R, 4, T) for every sample. Matches
    models/nerf_head.NeRFHead within TPU matmul-precision tolerance."""
    B, S, R, Cp, T = feat.shape
    RB = min(row_block, R)
    while R % RB:
        RB -= 1
    if vox is None or not use_vox_feat:
        vox = jnp.zeros((B, R, 1, T), jnp.float32)

    kernel = functools.partial(
        _head_kernel,
        S=S, C=C, hid_n=hid_n, RB=RB, T=T,
        viewdir_agg=viewdir_agg, use_vox_feat=use_vox_feat,
    )
    weight_specs = [
        pl.BlockSpec(
            leaf.shape,
            lambda b, i, nd=len(leaf.shape): (0,) * nd,
            memory_space=pltpu.VMEM,
            pipeline_mode=pl.Buffered(buffer_count=1),
        )
        for leaf in leaves
    ]
    out = pl.pallas_call(
        kernel,
        grid=(B, R // RB),
        in_specs=[
            pl.BlockSpec((1, RB, vox.shape[2], T), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, RB, Cp, T), lambda b, i: (b, 0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, RB, 4, T), lambda b, i: (b, 0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + weight_specs,
        out_specs=pl.BlockSpec((1, RB, 4, T), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, R, 4, T), jnp.float32),
        interpret=interpret,
    )(vox.astype(jnp.float32), feat.astype(jnp.float32),
      dirs.astype(jnp.float32), *leaves)
    return out
