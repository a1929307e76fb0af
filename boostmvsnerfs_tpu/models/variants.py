"""Auxiliary ENeRF network variants (layered composite + human).

TPU-native re-designs of the reference aux networks:

* ``CompositeENeRF`` — fg/bg layered rendering
  (reference lib/networks/enerf/network_composite.py): per foreground layer
  a bbox-restricted cascade (MinCostRegNet at every level + the older
  image-feature-only NeRF head, nerf_.py), plus a full-frame background
  cascade from a second feature net; all layers merge into ONE
  transmittance integral with the fg samples z-sorted
  (utils.raw2outputs_composite, lib/networks/enerf/utils.py:953-1006).

  The reference crops cost volumes with dynamic python slicing
  (homo_warp_composite, utils.py:290-322) — shapes change per batch, which
  cannot compile under jit. Here each fg layer renders through a **virtual
  crop camera**: a static crop size (``fg_hw``) with the target principal
  point dynamically shifted by the bbox origin. The whole cascade then runs
  unchanged at the crop resolution with static shapes, and the layer's raw
  samples are scattered back into the full raster with
  ``lax.dynamic_update_slice``.

* ``HumanENeRF`` — the ZJU-MoCap-style masked variant
  (reference lib/networks/enerf/network_human.py): the standard cascade,
  with the final-level radiance restricted to ``mask_at_box`` at eval. The
  reference gathers the in-mask rays (dynamic shape) and scatters rgb back;
  here the full static raster renders and the mask multiplies the output —
  identical result, jit-stable shapes.

Batch extras used by these variants:
  bbox          (B, L, 2|4) int  per-layer crop origins (x, y) at full res;
                origins should be multiples of 1/min(volume_scale) so crop
                rasters align to integer volume/render pixels
  near_far      (B, L+1, 2)      per-layer depth ranges, last row = bg
  bg_src_inps   (B, S, H, W, 3)  optional clean plates for the bg render
  mask_at_box   (B, H, W)        human variant foreground mask
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from boostmvsnerfs_tpu.models.enerf import CascadeConfig, ENeRF


def _shift_ppoint(ixt: jnp.ndarray, x0, y0) -> jnp.ndarray:
    """Virtual-crop camera: move the principal point so crop pixel (0, 0)
    images the same ray as full-frame pixel (x0, y0)."""
    return ixt.at[:, 0, 2].add(-x0).at[:, 1, 2].add(-y0)


def _scatter_full(update: jnp.ndarray, y0, x0, H: int, W: int) -> jnp.ndarray:
    """Place per-layer crop tensors (B, h, w, ...) into zeros (B, H, W, ...)
    at dynamic origins (reference parse_layer, enerf/utils.py:939-952)."""

    def one(up, y, x):
        full = jnp.zeros((H, W) + up.shape[2:], up.dtype)
        return jax.lax.dynamic_update_slice(
            full, up, (y, x) + (0,) * (up.ndim - 2)
        )

    return jax.vmap(one)(update, y0, x0)


def composite_outputs(
    fg_layers: list,  # [{'net_output': (B,n,Ns,4), 'z_vals': (B,n,Ns)}]
    bg_layer: dict,
    origins_r,  # (B, L, 2) int render-scale (x, y) origins
    crop_hw: tuple,  # (h_r, w_r) render-scale crop size
    full_hw: tuple,  # (H_r, W_r)
    white_bkgd: bool = False,
) -> dict:
    """Merge fg layers + bg into one volume-rendering integral (reference
    raw2outputs_composite, lib/networks/enerf/utils.py:953-1006): fg layer
    samples scattered to the full raster and z-sorted across layers, bg
    samples appended last, plain (unnormalized) depth expectation."""
    H, W = full_hw
    h, w = crop_hw
    raws, zs = [], []
    for li, lay in enumerate(fg_layers):
        B, n, Ns, _ = lay["net_output"].shape
        raw = lay["net_output"].reshape(B, h, w, Ns, 4)
        z = lay["z_vals"].reshape(B, h, w, Ns)
        y0, x0 = origins_r[:, li, 1], origins_r[:, li, 0]
        raws.append(_scatter_full(raw, y0, x0, H, W).reshape(B, H * W, Ns, 4))
        zs.append(_scatter_full(z, y0, x0, H, W).reshape(B, H * W, Ns))
    net = jnp.concatenate(raws, axis=-2)
    z = jnp.concatenate(zs, axis=-1)
    if len(fg_layers) > 1:
        order = jnp.argsort(z, axis=-1)
        z = jnp.take_along_axis(z, order, axis=-1)
        net = jnp.take_along_axis(net, order[..., None], axis=-2)
    net = jnp.concatenate([net, bg_layer["net_output"]], axis=-2)
    z = jnp.concatenate([z, bg_layer["z_vals"]], axis=-1)

    alpha = 1.0 - jnp.exp(-net[..., 3])
    T = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    T = jnp.concatenate([jnp.ones_like(T[..., :1]), T[..., :-1]], axis=-1)
    weights = alpha * T
    rgb = jnp.sum(weights[..., None] * net[..., :3], axis=-2)
    depth = jnp.sum(weights * jax.lax.stop_gradient(z), axis=-1)
    if white_bkgd:
        acc = jnp.sum(weights, axis=-1)
        rgb = rgb + (1.0 - acc[..., None])
    return {"rgb": rgb, "depth": depth, "weights": weights}


class CompositeENeRF(nn.Module):
    """Layered fg/bg cascade (reference network_composite.py)."""

    cas: CascadeConfig = CascadeConfig()
    num_fg_layers: int = 1
    # static full-res crop size per fg layer; must keep the crop's volume
    # grid U-Net-divisible: multiples of 4 / min(volume_scale) (= 32 for the
    # default 0.125 coarse scale)
    fg_hw: tuple = (64, 64)
    bg_planes: tuple = (16, 4)  # reference network_composite.py:121 D=[16,4]
    white_bkgd: bool = False
    bn_axis_name: str | None = None

    def setup(self):
        fg_cas = dataclasses.replace(
            self.cas, min_cost_reg_all=True, use_vox_feat=False
        )
        # each engine owns its per-layer cost_regs / nerf heads; only
        # engine 0's feature net is ever called (one shared fg FPN, as in
        # the reference's single self.feature_net)
        self.fg = [
            ENeRF(fg_cas, self.bn_axis_name) for _ in range(self.num_fg_layers)
        ]
        # the bg cascade also regularizes with MinCostRegNet at every level
        # (reference network_composite.py:22-25) but keeps the standard
        # voxel-feature head
        bg_cas = dataclasses.replace(
            self.cas, volume_planes=self.bg_planes, min_cost_reg_all=True
        )
        self.bg = ENeRF(bg_cas, self.bn_axis_name)

    def __call__(self, batch: dict, train: bool = False) -> dict:
        cas = self.cas
        B, S, H, W, _ = batch["src_inps"].shape
        feats_fg = self.fg[0].extract_features(batch["src_inps"], train)
        bg_inps = batch.get("bg_src_inps", batch["src_inps"])
        feats_bg = self.bg.extract_features(bg_inps, train)

        origins = batch["bbox"][..., :2].astype(jnp.int32)  # (B, L, 2) x,y
        h, w = self.fg_hw

        ret = {}
        prev_fg = [None] * self.num_fg_layers
        prev_bg = None
        for i in range(cas.num):
            r_s = cas.render_scale[i]
            H_r, W_r = int(H * r_s), int(W * r_s)
            h_r, w_r = int(h * r_s), int(w * r_s)
            fg_layers = []
            for li in range(self.num_fg_layers):
                x0 = origins[:, li, 0].astype(jnp.float32)
                y0 = origins[:, li, 1].astype(jnp.float32)
                tar_ixt_l = _shift_ppoint(batch["tar_ixt"], x0, y0)
                nf_l = batch["near_far"][:, li]
                feat_vol, depth, std, nf_map = self.fg[li].build_level_volume(
                    i, feats_fg, batch["src_exts"], batch["src_ixts"],
                    batch["tar_ext"], tar_ixt_l, nf_l, prev_fg[li], train,
                    tar_hw=(h, w),
                )
                prev_fg[li] = (depth, std, nf_map)
                if not cas.render_if[i]:
                    continue
                ray_idx = jnp.broadcast_to(
                    jnp.arange(h_r * w_r, dtype=jnp.int32)[None], (B, h_r * w_r)
                )
                batch_l = dict(batch)
                batch_l["tar_ixt"] = tar_ixt_l
                raw = self.fg[li].render_level(
                    i, feats_fg, feat_vol, depth, std, nf_map, batch_l,
                    ray_idx, train, return_raw=True, tar_hw=(h, w),
                )
                z = raw["z_vals"]
                if cas.depth_inv[i]:  # metric z for the cross-layer sort
                    z = 1.0 / jnp.maximum(z, 1e-6)
                fg_layers.append(
                    {"net_output": raw["net_output"], "z_vals": z}
                )

            # background: full-frame cascade from the second feature net
            feat_vol, depth, std, nf_map = self.bg.build_level_volume(
                i, feats_bg, batch["src_exts"], batch["src_ixts"],
                batch["tar_ext"], batch["tar_ixt"], batch["near_far"][:, -1],
                prev_bg, train,
            )
            prev_bg = (depth, std, nf_map)
            if not cas.render_if[i]:
                continue
            ray_idx = jnp.broadcast_to(
                jnp.arange(H_r * W_r, dtype=jnp.int32)[None], (B, H_r * W_r)
            )
            batch_bg = dict(batch)
            batch_bg["src_inps"] = bg_inps
            raw_bg = self.bg.render_level(
                i, feats_bg, feat_vol, depth, std, nf_map, batch_bg,
                ray_idx, train, return_raw=True,
            )
            z_bg = raw_bg["z_vals"]
            if cas.depth_inv[i]:
                z_bg = 1.0 / jnp.maximum(z_bg, 1e-6)
            bg_layer = {"net_output": raw_bg["net_output"], "z_vals": z_bg}

            origins_r = (origins.astype(jnp.float32) * r_s).astype(jnp.int32)
            out = composite_outputs(
                fg_layers, bg_layer, origins_r, (h_r, w_r), (H_r, W_r),
                self.white_bkgd,
            )
            ret.update({f"{k}_level{i}": v for k, v in out.items()})
        return ret


class HumanENeRF(ENeRF):
    """Masked-subject cascade (reference network_human.py): identical to
    ENeRF, with the final-level radiance zeroed outside ``mask_at_box`` at
    eval (the reference gathers in-mask rays and scatters rgb into a zero
    canvas, network_human.py:93-110 — a mask multiply over the static full
    raster is the jit-stable equivalent)."""

    def __call__(self, batch: dict, train: bool = False) -> dict:
        ret = super().__call__(batch, train)
        last = self.cas.num - 1
        key = f"rgb_level{last}"
        if "mask_at_box" in batch and not train and key in ret:
            B = ret[key].shape[0]
            mask = batch["mask_at_box"].reshape(B, -1, 1).astype(
                ret[key].dtype
            )
            ret[key] = ret[key] * mask
        return ret
