"""BoostMVSNeRF: multi cost-volume fusion on the MVSNeRF backbone.

TPU-native re-design of reference lib/networks/boost_mvsnerf/network.py:
K padded cost volumes built from the selected 3-view combinations, each with
its own near/far from the selected views' depth ranges (:178-190), rendered
jointly and blended with normalized viewport-visibility masks through one
transmittance integral (:149-158 + enerf raw2outputs_blend).

As in BoostENeRF, the K volumes fold into the batch axis (one traced
pipeline; the reference loops K sequential pipelines :179-205).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from boostmvsnerfs_tpu.models.boost_enerf import _take_views
from boostmvsnerfs_tpu.models.mvsnerf import MVSNeRF, mvs_proj_mats
from boostmvsnerfs_tpu.ops import geometry, render


class BoostMVSNeRF(MVSNeRF):
    # ------------------------------------------------------------------
    # view-selection masks (pure geometry — reference boost_mvsnerf
    # calc_mask :23-45 needs no network outputs)
    # ------------------------------------------------------------------

    def combo_coverage_mask(self, batch: dict, combo: jnp.ndarray) -> jnp.ndarray:
        B, V, H, W, _ = batch["all_src_inps"].shape
        exts = jnp.take(batch["all_src_exts"], combo, axis=1)
        ixts = jnp.take(batch["all_src_ixts"], combo, axis=1)

        ray_idx = batch["ray_idx_0"]
        xy = geometry.flat_idx_to_xy(ray_idx, W)
        ray_o, ray_d = geometry.rays_from_pixels(
            batch["tar_ixt"], batch["tar_ext"], xy
        )
        near = batch["near_far"][:, 0].reshape(B, 1, 1)
        far = batch["near_far"][:, 1].reshape(B, 1, 1)
        Ns = 128
        t = jnp.linspace(0.0, 1.0, Ns)
        z_vals = near * (1 - t) + far * t
        z_vals = jnp.broadcast_to(z_vals, (B, xy.shape[1], Ns))
        world = ray_o[..., None, :] + ray_d[..., None, :] * z_vals[..., None]

        inv_scale = jnp.broadcast_to(
            jnp.asarray([W - 1, H - 1], jnp.float32)[None], (B, 2)
        )
        m = render.mask_viewport(world, exts, ixts, inv_scale) / Ns
        pseudo = jnp.broadcast_to(m[..., None], m.shape + (4,))
        out = render.composite(pseudo, None)
        return jnp.mean(out["rgb"], axis=-1).reshape(B, H, W)

    def forward_view_selection(self, batch: dict, combos: jnp.ndarray) -> jnp.ndarray:
        masks = []
        for c in range(combos.shape[0]):
            masks.append(self.combo_coverage_mask(batch, combos[c]))
        return jnp.stack(masks, axis=0)

    # ------------------------------------------------------------------
    # fused forward
    # ------------------------------------------------------------------

    def __call__(self, batch: dict, train: bool = False) -> dict:
        cfg = self.cfg
        K = cfg.k_best
        B = batch["all_src_inps"].shape[0]
        combos = batch["combos"]
        sel = jnp.take(combos, batch["k_best"], axis=0)  # (B, K, I)
        I = sel.shape[-1]

        feats_all = self.extract_features(batch["all_src_inps"], train)

        def fold(x):
            g = _take_views(x, sel.reshape(B, K * I))
            return g.reshape(B * K, I, *x.shape[2:])

        def rep(x):
            return jnp.repeat(x, K, axis=0)

        sub = {
            "src_inps": fold(batch["all_src_inps"]),
            "src_exts": fold(batch["all_src_exts"]),
            "src_ixts": fold(batch["all_src_ixts"]),
            "tar_ext": rep(batch["tar_ext"]),
            "tar_ixt": rep(batch["tar_ixt"]),
        }
        feats = fold(feats_all)
        dr = fold(batch["depth_ranges"])  # (B*K, I, 2)

        near = jnp.min(dr[..., 0], axis=1) * cfg.near_far_scale[0]  # (B*K,)
        far = jnp.max(dr[..., 1], axis=1) * cfg.near_far_scale[1]
        t = jnp.linspace(0.0, 1.0, cfg.num_samples)
        depth_values = near[:, None] * (1 - t) + far[:, None] * t

        pm = mvs_proj_mats(sub["src_ixts"], sub["src_exts"])
        volume = self.build_volume(sub["src_inps"], feats, pm, depth_values, train)
        raw_out = self.render_volume(
            sub, volume, rep(batch["ray_idx_0"]), near, far, train, with_mask=True
        )

        raws = raw_out["net_output"].reshape(B, K, *raw_out["net_output"].shape[1:])
        masks = render.normalize_blend_masks(
            raw_out["mask"].reshape(B, K, *raw_out["mask"].shape[1:])
        )
        z = raw_out["z_vals"].reshape(B, K, *raw_out["z_vals"].shape[1:])
        out = render.composite_blend(raws, masks, z)
        return {f"{k}_level0": v for k, v in out.items()}
