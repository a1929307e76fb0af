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


class Agg(nn.Module):
    """View-aggregation MLP (reference lib/networks/enerf/nerf.py:45-89):
    optional viewdir conditioning, per-view stats (mean/var across views),
    softmax-weighted pooling to a 16-dim feature."""

    feat_ch: int
    viewdir_agg: bool = True

    @nn.compact
    def __call__(self, img_feat_rgb_dir: jnp.ndarray) -> jnp.ndarray:
        # (..., S, feat_ch + 4) -> (..., 16)
        if self.viewdir_agg:
            view_feat = nn.relu(
                nn.Dense(self.feat_ch, kernel_init=kaiming, name="view_fc")(
                    img_feat_rgb_dir[..., -4:]
                )
            )
            img_feat_rgb = img_feat_rgb_dir[..., :-4] + view_feat
        else:
            img_feat_rgb = img_feat_rgb_dir[..., :-4]

        C = self.feat_ch
        var_feat = jnp.var(img_feat_rgb, axis=-2, keepdims=True)
        avg_feat = jnp.mean(img_feat_rgb, axis=-2, keepdims=True)

        # global_fc over concat([img, var, avg]) with the kernel split: the
        # (var, avg) part is per-sample and broadcast-added across views
        k, b = _DenseParams(32, 3 * C, name="global_fc")()
        stat = var_feat @ k[C:2 * C] + avg_feat @ k[2 * C:] + b  # (.., 1, 32)
        global_feat = nn.relu(img_feat_rgb @ k[:C] + stat)  # (.., S, 32)

        agg_w = jax.nn.softmax(
            nn.relu(nn.Dense(1, kernel_init=kaiming, name="agg_w_fc")(global_feat)),
            axis=-2,
        )
        im_feat = jnp.sum(global_feat * agg_w, axis=-2)
        return nn.relu(nn.Dense(16, kernel_init=kaiming, name="fc")(im_feat))


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

    @nn.compact
    def __call__(self, vox_feat: jnp.ndarray, img_feat_rgb_dir: jnp.ndarray):
        """vox_feat (..., 8), img_feat_rgb_dir (..., S, feat_ch+4) -> (..., 4)."""
        img_feat = Agg(self.feat_ch, self.viewdir_agg, name="agg")(img_feat_rgb_dir)
        if self.use_vox_feat:
            vox_img_feat = jnp.concatenate(
                [vox_feat, img_feat], axis=-1
            )  # (..., 24)
        else:
            vox_img_feat = img_feat  # (..., 16)
        x = nn.relu(nn.Dense(self.hid_n, kernel_init=kaiming, name="lr0")(vox_img_feat))
        sigma = nn.softplus(nn.Dense(1, kernel_init=kaiming, name="sigma")(x))

        # color0 over concat([x, vox_img_feat] broadcast to S, per-view
        # features) with the kernel split: the per-sample part runs once
        xi = jnp.concatenate([x, vox_img_feat], axis=-1)  # (..., hid+24)
        Dx = xi.shape[-1]
        Dv = img_feat_rgb_dir.shape[-1]
        k, b = _DenseParams(self.hid_n, Dx + Dv, name="color0")()
        base = xi @ k[:Dx] + b  # (..., hid)
        w = nn.relu(base[..., None, :] + img_feat_rgb_dir @ k[Dx:])
        w = nn.relu(nn.Dense(1, kernel_init=kaiming, name="color1")(w))
        color_weight = jax.nn.softmax(w, axis=-2)
        color = jnp.sum(img_feat_rgb_dir[..., -7:-4] * color_weight, axis=-2)
        return jnp.concatenate([color, sigma], axis=-1)
