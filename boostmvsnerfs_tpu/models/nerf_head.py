"""IBR NeRF heads: per-sample radiance from voxel + multi-view image features.

Re-design of reference lib/networks/enerf/nerf.py. Every layer is a small
dense matmul over (rays x samples) points — flattened so the MXU sees one
large batched GEMM per layer. Layers that the reference feeds with
broadcast-and-concatenate inputs (per-sample features repeated across the S
views) are applied as split kernels instead: the per-sample part is computed
once and broadcast-added, which removes the dominant HBM traffic of
materializing (N*Ns*S, C) concatenations. Parameters are identical to the
concatenated nn.Dense (same names/shapes — the kernel is sliced at apply
time), so checkpoint porting is unaffected.

Two execution paths share one parameter tree:

* ``__call__`` — plain flax/XLA math (training + non-TPU backends).
* ``fused`` — the whole head as a single Pallas VMEM kernel
  (ops/pallas/enerf_head.py), taking the per-view features S-major as the
  fused row sampler produces them; under XLA the head is HBM-bound on its
  activation round-trips (~50x its roofline at flagship eval scale).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

kaiming = nn.initializers.kaiming_normal()


class _DenseParams(nn.Module):
    """Parameter container with nn.Dense's exact variable names/shapes."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", kaiming, (self.in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


def _dense(x, k, b):
    return x @ k + b


class Agg(nn.Module):
    """View-aggregation MLP (reference lib/networks/enerf/nerf.py:45-89):
    optional viewdir conditioning, per-view stats (mean/var across views),
    softmax-weighted pooling to a 16-dim feature."""

    feat_ch: int
    viewdir_agg: bool = True

    def setup(self):
        if self.viewdir_agg:
            self.view_fc = _DenseParams(self.feat_ch, 4)
        self.global_fc = _DenseParams(32, 3 * self.feat_ch)
        self.agg_w_fc = _DenseParams(1, 32)
        self.fc = _DenseParams(16, 32)

    def param_leaves(self):
        layers = ([self.view_fc] if self.viewdir_agg else []) + [
            self.global_fc, self.agg_w_fc, self.fc,
        ]
        leaves = []
        for layer in layers:
            leaves.extend(layer())
        return leaves

    def __call__(self, img_feat_rgb_dir: jnp.ndarray) -> jnp.ndarray:
        # (..., S, feat_ch + 4) -> (..., 16)
        if self.viewdir_agg:
            kv, bv = self.view_fc()
            view_feat = nn.relu(_dense(img_feat_rgb_dir[..., -4:], kv, bv))
            img_feat_rgb = img_feat_rgb_dir[..., :-4] + view_feat
        else:
            img_feat_rgb = img_feat_rgb_dir[..., :-4]

        C = self.feat_ch
        var_feat = jnp.var(img_feat_rgb, axis=-2, keepdims=True)
        avg_feat = jnp.mean(img_feat_rgb, axis=-2, keepdims=True)

        # global_fc over concat([img, var, avg]) with the kernel split: the
        # (var, avg) part is per-sample and broadcast-added across views
        k, b = self.global_fc()
        stat = var_feat @ k[C:2 * C] + avg_feat @ k[2 * C:] + b  # (.., 1, 32)
        global_feat = nn.relu(img_feat_rgb @ k[:C] + stat)  # (.., S, 32)

        ka, ba = self.agg_w_fc()
        agg_w = jax.nn.softmax(nn.relu(_dense(global_feat, ka, ba)), axis=-2)
        im_feat = jnp.sum(global_feat * agg_w, axis=-2)
        kf, bf = self.fc()
        return nn.relu(_dense(im_feat, kf, bf))


class NeRFHead(nn.Module):
    """ENeRF radiance head (reference lib/networks/enerf/nerf.py:6-43).

    Color is a softmax blend over the *source-view RGB* samples (indices
    [-7:-4] of the per-view feature vector); sigma comes from a softplus head
    on the voxel+aggregated-image feature.
    """

    feat_ch: int  # per-view feature channels incl. RGB (e.g. 32+3 or 8+3)
    hid_n: int = 64
    viewdir_agg: bool = True
    # False = the older image-feature-only head used by the composite
    # layered variant (reference lib/networks/enerf/nerf_.py:13,33-34:
    # lr0 takes the 16-dim aggregated image feature, vox_feat is ignored)
    use_vox_feat: bool = True

    def setup(self):
        self.agg = Agg(self.feat_ch, self.viewdir_agg)
        in_lr0 = 8 + 16 if self.use_vox_feat else 16
        self.lr0 = _DenseParams(self.hid_n, in_lr0)
        self.sigma = _DenseParams(1, self.hid_n)
        self.color0 = _DenseParams(
            self.hid_n, self.hid_n + in_lr0 + self.feat_ch + 4
        )
        self.color1 = _DenseParams(1, self.hid_n)

    def __call__(self, vox_feat: jnp.ndarray, img_feat_rgb_dir: jnp.ndarray):
        """vox_feat (..., 8), img_feat_rgb_dir (..., S, feat_ch+4) -> (..., 4)."""
        img_feat = self.agg(img_feat_rgb_dir)
        if self.use_vox_feat:
            vox_img_feat = jnp.concatenate(
                [vox_feat, img_feat], axis=-1
            )  # (..., 24)
        else:
            vox_img_feat = img_feat  # (..., 16)
        kl, bl = self.lr0()
        x = nn.relu(_dense(vox_img_feat, kl, bl))
        ks, bs = self.sigma()
        sigma = nn.softplus(_dense(x, ks, bs))

        # color0 over concat([x, vox_img_feat] broadcast to S, per-view
        # features) with the kernel split: the per-sample part runs once
        xi = jnp.concatenate([x, vox_img_feat], axis=-1)  # (..., hid+24)
        Dx = xi.shape[-1]
        k, b = self.color0()
        base = xi @ k[:Dx] + b  # (..., hid)
        w = nn.relu(base[..., None, :] + img_feat_rgb_dir @ k[Dx:])
        kc1, bc1 = self.color1()
        w = nn.relu(_dense(w, kc1, bc1))
        color_weight = jax.nn.softmax(w, axis=-2)
        color = jnp.sum(img_feat_rgb_dir[..., -7:-4] * color_weight, axis=-2)
        return jnp.concatenate([color, sigma], axis=-1)

    def fused(
        self,
        vox_rows: jnp.ndarray | None,  # (B, R, 8, T) or None
        feat_rows: jnp.ndarray,  # (B, S, R, Cp, T) channels-in-sublanes;
        # true channels = feat_ch, zero-padded to Cp (the fused row
        # sampler's raw_layout output — no transpose in between)
        dirs_rows: jnp.ndarray,  # (B, S, R, 4, T)
        interpret: bool = False,
        row_block: int = 8,
    ) -> jnp.ndarray:
        """Same head as one fused Pallas kernel; returns (B, R, 4, T)."""
        from boostmvsnerfs_tpu.ops.pallas.enerf_head import fused_nerf_head

        leaves = self.agg.param_leaves()
        for layer in (self.lr0, self.sigma, self.color0, self.color1):
            leaves.extend(layer())
        return fused_nerf_head(
            tuple(leaves),
            vox_rows if self.use_vox_feat else None,
            feat_rows,
            dirs_rows,
            C=self.feat_ch,
            viewdir_agg=self.viewdir_agg,
            use_vox_feat=self.use_vox_feat,
            hid_n=self.hid_n,
            row_block=row_block,
            interpret=interpret,
        )
