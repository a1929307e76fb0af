"""ENeRF backbone: cascade cost volumes + depth-guided radiance rendering.

TPU-native re-design of reference lib/networks/enerf/network.py. Differences
from the reference by design:

* Rays are generated **on device** from camera matrices at ray pixel indices
  supplied in the batch (the reference ships CPU-built (N, 8) ray tensors,
  lib/datasets/enerf_utils.py:25-71).
* There is no chunked ``batchify_rays`` loop (reference network.py:45-55):
  ray memory is managed by sharding the ray axis over the device mesh
  (parallel/) and, within a device, by XLA scheduling; shapes stay static.
* All dense math is channels-last and jit-compiled end to end.

Batch convention (all jnp arrays):
  src_inps   (B, S, H, W, 3)  source images in [-1, 1]
  src_exts   (B, S, 4, 4)     world->camera
  src_ixts   (B, S, 3, 3)
  tar_ext    (B, 4, 4)
  tar_ixt    (B, 3, 3)
  near_far   (B, 2)           scene-level depth range
  ray_idx_{i} (B, N_i) int32  flat pixel ids at level-i render scale
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from boostmvsnerfs_tpu.models.cost_reg_net import CostRegNet, MinCostRegNet
from boostmvsnerfs_tpu.models.feature_net import FeatureNet
from boostmvsnerfs_tpu.models.nerf_head import NeRFHead
from boostmvsnerfs_tpu.ops import cost_volume, geometry, render, sampling


@dataclasses.dataclass(frozen=True)
class CascadeConfig:
    """Static cascade settings (reference
    configs/exps/pretrain/enerf/dtu_pretrain.yaml:31-47)."""

    num: int = 2
    depth_inv: tuple = (True, False)
    volume_scale: tuple = (0.125, 0.5)
    volume_planes: tuple = (64, 8)
    im_feat_scale: tuple = (0.25, 0.5)
    im_ibr_scale: tuple = (0.25, 1.0)
    render_scale: tuple = (0.25, 1.0)
    render_im_feat_level: tuple = (0, 2)
    nerf_model_feat_ch: tuple = (32, 8)
    render_if: tuple = (True, True)
    num_samples: tuple = (8, 2)
    num_rays: tuple = (4096, 32768)
    train_img: tuple = (True, True)
    loss_weight: tuple = (0.1, 1.0)
    # patch ray sampling: num_patchs[i] patches of patch_size[i]^2 pixels
    # appended to the random rays (reference enerf_utils.py:5-23 +
    # configs .../dtu_pretrain.yaml num_patchs/patch_size)
    num_patchs: tuple = (0, 0)
    patch_size: tuple = (-1, -1)
    # foreground-weighted ray sampling from the target mask (reference
    # cfg.enerf.sample_on_mask, enerf_utils.py:35-51; the ZJU-MoCap /
    # human-variant training recipe)
    sample_on_mask: bool = False
    viewdir_agg: bool = True
    # boost settings (reference configs/exps/pretrain/enerf_ours/dtu_pretrain.yaml)
    k_best: int = 4
    cost_volume_input_views: int = 3
    # TPU warp implementation: 'pallas' = fused VMEM warp+variance kernel
    # (ops/pallas/warp_variance.py; eval-time — falls back to 'windowed'
    # under training for differentiability), 'windowed' = XLA MXU
    # interpolation matmuls (ops/cost_volume.warp_src_view_windowed),
    # 'gather' = XLA gather path. window height / row tiling are per cascade
    # level; width is always the full source width (x coverage exact by
    # construction).
    warp_mode: str = "pallas"
    warp_window_h: tuple = (48, 32)
    warp_rows_per_tile: tuple = (4, 1)
    # per-row y-window of the fused Pallas warp (rows are warped one at a
    # time so a narrower band suffices than the 4-row XLA tiles above);
    # validate per camera setup with ops.pallas.warp_variance_coverage
    pallas_window_h: tuple = (32, 16)
    # x tiling of the plane-sweep warp (0 = full-width tiles / full source
    # width window, the exact-by-construction setting). Measured on TPU v5e:
    # column tiling ADDS per-tile overhead under XLA (the weight matrices
    # round-trip HBM), so it stays off; the Pallas fused warp supersedes it.
    warp_cols_per_tile: tuple = (0, 0)
    warp_window_w: tuple = (0, 0)
    # render-stage sampling at eval time (full-image raster rays):
    # 'pallas' = fused VMEM row-band sampler (ops/pallas/img_sample.py) +
    # separable volume resample; 'structured' = XLA row-band sampling +
    # separable volume resample; 'gather' = XLA gather path (always used for
    # random train rays)
    eval_sampling: str = "pallas"
    # eval-time NeRF head: 'pallas' = the whole Agg+radiance head as one
    # fused VMEM kernel (ops/pallas/enerf_head.py — under XLA the head is
    # HBM-bound on activation round-trips); 'xla' = plain flax math
    eval_head: str = "pallas"
    img_window_h: tuple = (32, 32)
    # y-band of the fused Pallas sampler. Default matches the XLA full-row
    # bands (img_window_h) — per-chunk bands are strictly tighter than
    # full-row bands, so coverage is at least as good; tune down per dataset
    # after checking ops.sampling.sample_window_coverage
    pallas_img_window_h: tuple = (32, 32)
    # x-window of the fused Pallas sampler's per-chunk interpolation matmul
    # (0 = full source width). Cuts the dominant render FLOPs by ~W/window;
    # exactness is geometry-dependent — tune per scene with
    # utils.autotune.tune_cascade_windows (checks
    # ops.pallas.img_sample.row_sample_coverage)
    pallas_img_window_w: tuple = (0, 0)
    # chunked-band DMA mode of the fused sampler (per-(row, chunk) source
    # bands with per-chunk y origins — admits much smaller y-windows when
    # the per-chunk y-spans are tight, at the cost of re-fetching a band
    # per chunk; the autotuner costs both modes)
    pallas_img_chunk_bands: tuple = (False, False)
    # x tiling of the structured image-feature sampler: rows are split into
    # column tiles of ~img_cols_per_tile pixels, each sampling from a
    # (img_window_h, img_window_w) source patch. 0 = full-width rows (the
    # faster setting under XLA — tiling adds per-tile overhead; see
    # scripts/bench_samplers.py).
    img_cols_per_tile: tuple = (0, 0)
    img_window_w: tuple = (0, 0)
    # conv computation dtype ('bfloat16' = the TPU AMP equivalent of the
    # reference autocast trainer); params/BN stats stay float32
    conv_dtype: str = "float32"
    # dtype of the windowed interpolation matmuls (warp + image-feature
    # sampling). bfloat16 runs them on the fast MXU path with float32
    # accumulation — interpolation-weight rounding ~2^-9, well inside the
    # parity budget (tests/test_mixed_precision.py measures the PSNR delta)
    warp_dtype: str = "bfloat16"
    # train-time plane-block streaming of the windowed warp backward:
    # planes per remat block (0 = auto from a ~128MB weight budget; 1+ =
    # explicit). The windowed formulation's per-plane interpolation-weight
    # tensors are rebuilt per block in the backward instead of being
    # retained/rematerialized all at once (several GB per level at eval
    # geometry)
    warp_remat_planes: tuple = (0, 0)
    # variant knobs (reference aux networks): MinCostRegNet at every level
    # + image-feature-only NeRF head = the composite layered variant's
    # per-layer stack (lib/networks/enerf/network_composite.py:18-21 with
    # the nerf_.py head)
    min_cost_reg_all: bool = False
    use_vox_feat: bool = True

    def _warp_dt(self):
        return None if self.warp_dtype == "float32" else jnp.dtype(
            self.warp_dtype
        )

    @staticmethod
    def from_cfg(node) -> "CascadeConfig":
        """Build from a cfg ``enerf`` subtree (dict-like)."""
        cas = node["cas_config"]
        fields = {f.name for f in dataclasses.fields(CascadeConfig)}
        kw = {k: tuple(v) if isinstance(v, list) else v for k, v in cas.items() if k in fields}
        if "viewdir_agg" in node:
            kw["viewdir_agg"] = node["viewdir_agg"]
        if "cost_volume_input_views" in node:
            kw["cost_volume_input_views"] = node["cost_volume_input_views"]
        # lives at the enerf level in the reference cfg tree, not inside
        # cas_config (lib/config/config.py enerf defaults)
        if "sample_on_mask" in node:
            kw["sample_on_mask"] = node["sample_on_mask"]
        return CascadeConfig(**kw)


class ENeRF(nn.Module):
    """Cascade ENeRF network (reference lib/networks/enerf/network.py:11-113)."""

    cas: CascadeConfig = CascadeConfig()
    # cross-device BatchNorm axis for shard_map/pmap-style use ONLY. The
    # jit/GSPMD train path needs no axis name: reductions over the sharded
    # batch are global by construction, which IS the SyncBN equivalence
    # (reference lib/train/trainers/trainer.py:15-22; pinned by
    # tests/test_parallel.py::test_syncbn_gspmd_global_stats)
    bn_axis_name: str | None = None

    def setup(self):
        dt = None if self.cas.conv_dtype == "float32" else jnp.dtype(
            self.cas.conv_dtype
        )
        self.feature_net = FeatureNet(self.bn_axis_name, dt)
        cost_regs = []
        nerf_heads = []
        for i in range(self.cas.num):
            cost_regs.append(
                MinCostRegNet(self.bn_axis_name, dt)
                if i == 0 or self.cas.min_cost_reg_all
                else CostRegNet(self.bn_axis_name, dt)
            )
            nerf_heads.append(
                NeRFHead(
                    feat_ch=self.cas.nerf_model_feat_ch[i] + 3,
                    viewdir_agg=self.cas.viewdir_agg,
                    use_vox_feat=self.cas.use_vox_feat,
                )
            )
        self.cost_regs = cost_regs
        self.nerf_heads = nerf_heads

    # ------------------------------------------------------------------
    # stages
    # ------------------------------------------------------------------

    def extract_features(self, src_inps: jnp.ndarray, train: bool) -> dict:
        """FPN over all source views: {'level_k': (B, S, h, w, c)}."""
        B, S, H, W, C = src_inps.shape
        feats = self.feature_net(src_inps.reshape(B * S, H, W, C), train)
        return {
            k: v.reshape(B, S, *v.shape[1:]) for k, v in feats.items()
        }

    def build_level_volume(
        self,
        level: int,
        feats: dict,
        src_exts,
        src_ixts,
        tar_ext,
        tar_ixt,
        near_far,
        prev,  # None | (depth, std, nf_map)
        train: bool,
        tar_hw: tuple | None = None,
    ):
        """Cost volume -> regularized feature volume + regressed depth.

        ``tar_hw`` overrides the full-resolution target raster size (the
        composite variant renders each foreground layer through a virtual
        camera cropped to its bbox: static crop size, dynamically shifted
        principal point — the TPU-native equivalent of the reference's
        dynamic bbox slicing in homo_warp_composite,
        lib/networks/enerf/utils.py:290-322).

        Returns (feat_vol (B,D,Hv,Wv,8), depth (B,Hv,Wv), std, nf_map
        (B,2,Hv,Wv), depth_values).
        """
        cas = self.cas
        B, S, Hf, Wf, _ = feats[f"level_{level}"].shape
        if tar_hw is None:
            H = int(round(Hf / cas.im_feat_scale[level]))
            W = int(round(Wf / cas.im_feat_scale[level]))
        else:
            H, W = tar_hw
        Hv, Wv = int(H * cas.volume_scale[level]), int(W * cas.volume_scale[level])
        D = cas.volume_planes[level]
        inv = cas.depth_inv[level]

        if prev is None:
            dv = cost_volume.initial_depth_values(near_far, D, Hv, Wv, inv)
        else:
            depth_p, std_p, nf_p = prev
            dv = cost_volume.refined_depth_values(
                depth_p, std_p, nf_p, D, Hv, Wv, cas.depth_inv[level - 1], inv
            )
        nf_map = cost_volume.depth_values_near_far(dv, inv)

        pm = geometry.proj_mats(
            src_ixts, src_exts, tar_ixt, tar_ext,
            src_scale=cas.im_feat_scale[level],
            tar_scale=cas.volume_scale[level],
        )
        from boostmvsnerfs_tpu.ops import pallas as pallas_ops

        _, Sf, Hf_, Wf_, Cf = feats[f"level_{level}"].shape
        use_pallas = (
            cas.warp_mode == "pallas"
            # non-TPU backends fall back to the XLA windowed path instead
            # of Pallas interpret mode (orders of magnitude slower)
            and pallas_ops.pallas_supported()
            # oversized source stacks (no HBM band mode in this kernel)
            # fall back too rather than failing to compile
            and pallas_ops.warp_variance_fits(
                Sf, Hf_, Wf_, Cf, "float32" if train else cas.warp_dtype
            )
            # training additionally needs the per-view backward kernel's
            # float32 feature planes + gradient accumulator to fit VMEM
            and (
                not train
                or pallas_ops.warp_variance_bwd_fits(Sf, Hf_, Wf_, Cf)
            )
        )
        if use_pallas:
            dv_metric = dv  # kernel warps at metric depth (dv is metric)
            if train:
                # custom-VJP wrapper: Pallas forward AND backward, float32
                # (training interpolation matmuls stay f32 per the AMP policy)
                vol = pallas_ops.fused_warp_variance_diff(
                    feats[f"level_{level}"],
                    pm,
                    dv_metric,
                    cas.pallas_window_h[level],
                    jnp.float32,
                    pallas_ops.pallas_interpret(),
                )
            else:
                vol = pallas_ops.fused_warp_variance(
                    feats[f"level_{level}"],
                    pm,
                    dv_metric,
                    window_h=cas.pallas_window_h[level],
                    compute_dtype=jnp.dtype(cas.warp_dtype),
                    interpret=pallas_ops.pallas_interpret(),
                )
        elif cas.warp_mode in ("windowed", "pallas"):
            cols = cas.warp_cols_per_tile[level]
            win_w = cas.warp_window_w[level] if cols else 0

            def warp_one(f, p, d):
                return cost_volume.variance_volume_windowed(
                    f, p, d,
                    window_h=cas.warp_window_h[level],
                    # full source width when not column-tiled: exact in x
                    window_w=win_w or f.shape[2],
                    rows_per_tile=cas.warp_rows_per_tile[level],
                    # training gradients stay float32: the bf16 MXU default
                    # is an eval-only throughput knob
                    compute_dtype=None if train else cas._warp_dt(),
                    cols_per_tile=cols,
                )

            if train:
                # stream the warp over plane blocks with per-block remat:
                # plain remat still materializes EVERY plane's
                # interpolation weights at once during the backward
                # recompute; a scan bounds the transient to one block
                Ws_src = feats[f"level_{level}"].shape[3]
                pb = cas.warp_remat_planes[level]
                if pb <= 0:
                    pb = max(1, (2**27) // max(Hv * Wv * Ws_src * 4, 1))

                def warp_scan(f, p, d, pb=pb):
                    Dp = d.shape[0]
                    if Dp <= pb or Dp % pb != 0:
                        return jax.checkpoint(warp_one)(f, p, d)
                    blocks = d.reshape(Dp // pb, pb, *d.shape[1:])

                    def body(carry, db):
                        return carry, warp_one(f, p, db)

                    _, vb = jax.lax.scan(jax.checkpoint(body), 0.0, blocks)
                    return vb.reshape(Dp, *vb.shape[2:])

                vol = jax.vmap(warp_scan)(feats[f"level_{level}"], pm, dv)
            else:
                vol = jax.vmap(warp_one)(feats[f"level_{level}"], pm, dv)
        else:
            vol = jax.vmap(cost_volume.variance_volume)(
                feats[f"level_{level}"], pm, dv
            )  # (B, D, Hv, Wv, C)
        feat_vol, logits = self.cost_regs[level](vol, train)
        depth, std = render.depth_regression(logits, dv, inv)
        return feat_vol, depth, std, nf_map

    def render_level(
        self,
        level: int,
        feats: dict,
        feat_vol,
        depth,
        std,
        nf_map,
        batch: dict,
        ray_idx: jnp.ndarray,  # (B, N)
        train: bool,
        return_raw: bool = False,
        tar_hw: tuple | None = None,
        rows_block: int = 0,
    ) -> dict:
        """Depth-guided rendering of the rays at ``ray_idx``.

        Mirrors reference lib/networks/enerf/network.py:24-43 ``render_rays``
        plus utils.build_rays; with ``return_raw`` the per-sample radiance,
        z-values, and visibility mask are returned un-composited for the
        boost fused render (reference lib/networks/boost_enerf/network.py:123-149).
        ``tar_hw`` overrides the target raster size (virtual-crop cameras of
        the composite variant; see build_level_volume).

        ``rows_block > 0`` asserts (caller contract — the blocked
        full-image train step, parallel/train.make_blocked_loss) that
        ``ray_idx`` is a CONTIGUOUS block of ``rows_block`` whole raster
        rows in row-major order, identical across the batch. The block then
        takes the structured (row-band) sampling path whose backward is
        scatter-free — without it, each block's N != H_r*W_r forces the
        gather path, and every gather's backward scatter-adds into the
        full-resolution feature maps / cost volume (measured 3.8 s of a
        6.9 s step at 480x736, PROFILE_r05.md train section).
        """
        cas = self.cas
        B, S, H, W, _ = batch["src_inps"].shape
        if tar_hw is not None:
            H, W = tar_hw
        H_r, W_r = int(H * cas.render_scale[level]), int(W * cas.render_scale[level])
        inv = cas.depth_inv[level]
        D = feat_vol.shape[1]
        Hv, Wv = feat_vol.shape[2], feat_vol.shape[3]

        N = ray_idx.shape[1]
        row_blocked = (
            rows_block > 0
            and N == rows_block * W_r
            and N != H_r * W_r
            and cas.eval_sampling in ("structured", "pallas")
        )
        structured = row_blocked or (
            cas.eval_sampling in ("structured", "pallas")
            and N == H_r * W_r
            # under training only when this level trains on full images —
            # then ray_idx is the raster arange by construction
            # (data/base.py); random-ray training keeps the gather path
            and (not train or cas.train_img[level])
        )
        H_blk = rows_block if row_blocked else H_r
        row0 = ray_idx[0, 0] // W_r if row_blocked else None

        bounds_map = render.ray_bounds_maps(depth, std, nf_map, H_r, W_r, inv)
        if row_blocked:
            # whole-row block: a dynamic row slice (backward = pad, not
            # scatter) replaces the per-ray gather
            bounds = jax.lax.dynamic_slice_in_dim(
                bounds_map.reshape(B, H_r, W_r, 4), row0, rows_block, 1
            ).reshape(B, N, 4)
        elif structured:
            # full-raster rays are raster-ordered by construction: the
            # per-ray gather is an identity
            bounds = bounds_map.reshape(B, N, 4)
        else:
            bounds = jnp.take_along_axis(
                bounds_map.reshape(B, H_r * W_r, 4), ray_idx[..., None],
                axis=1,
            )  # (B, N, 4)
        xy = geometry.flat_idx_to_xy(ray_idx, W_r)  # (B, N, 2)
        tar_ixt_r = geometry.scale_ixt(batch["tar_ixt"], cas.render_scale[level])
        ray_o, ray_d = geometry.rays_from_pixels(tar_ixt_r, batch["tar_ext"], xy)

        world_xyz, uvd, z_vals = render.sample_along_depth(
            ray_o, ray_d, bounds, xy, cas.num_samples[level], inv
        )
        Ns = world_xyz.shape[2]

        from boostmvsnerfs_tpu.ops import pallas as pallas_ops

        # fully fused eval path: Pallas row sampler (raw rows layout) ->
        # Pallas NeRF head, channels in sublanes end to end — no tensor
        # with a tiny trailing dim is ever materialized in HBM (TPU tiling
        # pads a trailing C < 128 up to 16x)
        use_fused_head = (
            structured
            and not row_blocked
            and not train
            and cas.eval_sampling == "pallas"
            and cas.eval_head == "pallas"
            and pallas_ops.pallas_supported()
        )

        # voxel features: normalize uv to [0,1] over the render frame, then
        # scale to volume pixel coords (reference network.py:37-38 +
        # utils.py:458-460)
        d = uvd[..., 2] * (D - 1)
        vox_rows = None
        if use_fused_head:
            z = d.reshape(B, H_r, W_r, Ns)
            vox_rows = jax.vmap(sampling.plane_resample_z_rows)(
                feat_vol, z
            )  # (B, H_r, Cvox, W_r*Ns)
            vox_feat = None
        elif structured:
            # full-raster rays: trilinear factorizes into separable plane
            # resize + z-lerp (exact; see ops/sampling.plane_resample_z) —
            # a row block slices the full-frame y-interp weights instead
            z = d.reshape(B, H_blk, W_r, Ns)
            vox_feat = jax.vmap(
                lambda vol, zz: sampling.plane_resample_z(
                    vol, zz, H_r if row_blocked else None, row0
                )
            )(feat_vol, z)
            vox_feat = vox_feat.reshape(B, N, Ns, -1)
        else:
            u = uvd[..., 0] / (W_r - 1) * (Wv - 1)
            v = uvd[..., 1] / (H_r - 1) * (Hv - 1)
            vox_xyz = jnp.stack([u, v, d], axis=-1).reshape(B, N * Ns, 3)
            vox_feat = jax.vmap(
                lambda vol, pts: sampling.grid_sample_3d(vol, pts, "zeros")
            )(feat_vol, vox_xyz).reshape(B, N, Ns, -1)

        # per-view image features at render scale
        im_feat = feats[f"level_{cas.render_im_feat_level[level]}"]
        up = cas.render_scale[level] / cas.im_ibr_scale[level]
        if up != 1.0:
            im_feat = sampling.resize_bilinear(
                im_feat, int(im_feat.shape[-3] * up), int(im_feat.shape[-2] * up)
            )
        rgbs = render.unpreprocess(batch["src_inps"], cas.render_scale[level])
        img_feat_rgb = jnp.concatenate([im_feat, rgbs], axis=-1)  # (B,S,H_r,W_r,C+3)

        gathered = self._gather_view_features(
            world_xyz, img_feat_rgb, batch, cas.render_scale[level],
            window_h=cas.img_window_h[level] if structured else None,
            raster_hw=(H_blk, W_r) if structured else None,
            cols_per_tile=cas.img_cols_per_tile[level],
            window_w=cas.img_window_w[level],
            pallas_window_h=cas.pallas_img_window_h[level],
            pallas_window_w=cas.pallas_img_window_w[level],
            pallas_chunk_bands=cas.pallas_img_chunk_bands[level],
            train=train,
            rows_layout=use_fused_head,
        )

        if use_fused_head:
            feat_rows, dirs_rows = gathered  # (B,S,R,Cp,Tp), (B,S,R,4,Tp)
            T = W_r * Ns
            T_pad = feat_rows.shape[-1]
            if vox_rows.shape[-1] != T_pad:
                vox_rows = jnp.pad(
                    vox_rows,
                    ((0, 0), (0, 0), (0, 0), (0, T_pad - vox_rows.shape[-1])),
                )
            raw_rows = self.nerf_heads[level].fused(
                vox_rows, feat_rows, dirs_rows,
                interpret=pallas_ops.pallas_interpret(),
            )  # (B, H_r, 4, T_pad)
            raw = jnp.moveaxis(
                raw_rows[..., :T].reshape(B, H_r, 4, W_r, Ns), 2, -1
            ).reshape(B, N, Ns, 4)
        else:
            feat_sm, dirs_sm = gathered  # S-major (B, S, N*Ns, C+3 | 4)
            Cd = feat_sm.shape[-1]
            img_feat_rgb_dir = jnp.concatenate(
                [
                    jnp.moveaxis(feat_sm, 1, 2).reshape(B, N, Ns, S, Cd),
                    jnp.moveaxis(dirs_sm, 1, 2).reshape(B, N, Ns, S, 4),
                ],
                axis=-1,
            )  # (B, N, Ns, S, C+3+4)
            raw = self.nerf_heads[level](
                vox_feat, img_feat_rgb_dir
            )  # (B, N, Ns, 4)

        if return_raw:
            inv_scale = jnp.broadcast_to(
                jnp.asarray([W_r - 1, H_r - 1], jnp.float32)[None], (B, 2)
            )
            mask = jax.lax.stop_gradient(
                render.mask_viewport(
                    world_xyz, batch["src_exts"], batch["src_ixts"], inv_scale
                )
            )
            return {"net_output": raw, "z_vals": z_vals, "mask": mask}

        out = render.composite(raw, z_vals)
        out["depth_mvs"] = 1.0 / depth if inv else depth
        out["std"] = std
        return out

    def _gather_view_features(
        self, world_xyz, img_feat_rgb, batch, render_scale: float,
        window_h: int | None = None, raster_hw: tuple | None = None,
        cols_per_tile: int = 0, window_w: int = 0,
        pallas_window_h: int = 16, pallas_window_w: int = 0,
        pallas_chunk_bands: bool = False,
        train: bool = False, rows_layout: bool = False,
    ) -> tuple:
        """Project samples into every source view and gather features + RGB +
        ray-difference descriptors (reference lib/networks/enerf/utils.py:753-786).

        With ``raster_hw`` the rays are a full-image raster and sampling uses
        the gather-free windowed path (ops/sampling.windowed_sample_tiles):
        rows (optionally split into ``cols_per_tile``-column tiles with an
        x window of ``window_w``) sample via MXU triangle-weight matmuls.

        Returns S-major ``(feat (B, S, N*Ns, C+3), dirs (B, S, N*Ns, 4))``.
        With ``rows_layout`` (fused Pallas sampler + head) the raw
        channels-in-sublanes row layout is returned instead:
        ``(feat (B, S, H_r, Cp, T_pad), dirs (B, S, H_r, 4, T_pad))`` with
        T = W_r*Ns lane-padded — no HBM transpose anywhere on the path.
        """
        B, N, Ns = world_xyz.shape[:3]
        S = img_feat_rgb.shape[1]
        Hf, Wf = img_feat_rgb.shape[2], img_feat_rgb.shape[3]
        pts = world_xyz.reshape(B, N * Ns, 3)
        tar_c = geometry.cam_center(batch["tar_ext"])  # (B, 3)

        from boostmvsnerfs_tpu.ops import pallas as pallas_ops

        use_pallas = (
            raster_hw is not None
            and self.cas.eval_sampling == "pallas"
            and pallas_ops.pallas_supported()
        )
        assert not rows_layout or use_pallas, (
            "rows_layout requires the fused Pallas sampler path"
        )
        feat_sm = None
        if use_pallas:
            from boostmvsnerfs_tpu.ops.pallas.img_sample import (
                fused_row_sample,
            )

            H_r, W_r = raster_hw
            xs, ys = [], []
            for s in range(S):
                ixt = geometry.scale_ixt(batch["src_ixts"][:, s], render_scale)
                xy, _ = geometry.project_points(
                    pts, batch["src_exts"][:, s], ixt
                )
                xs.append(xy[..., 0])
                ys.append(xy[..., 1])
            T = W_r * Ns
            x_all = jnp.stack(xs, 1).reshape(B * S, H_r, T)
            y_all = jnp.stack(ys, 1).reshape(B * S, H_r, T)
            imgs = img_feat_rgb.reshape(B * S, Hf, Wf, -1)
            if train:
                # custom-VJP wrapper: Pallas forward AND backward (float32,
                # like the warp kernel) — gradients reach the image features
                # and, through x/y, the projected depth
                sampled = pallas_ops.fused_row_sample_diff(
                    imgs, x_all, y_all,
                    pallas_window_h, "border",
                    pallas_ops.pallas_interpret(), pallas_window_w,
                    pallas_chunk_bands,
                )
            else:
                sampled = fused_row_sample(
                    imgs, x_all, y_all,
                    window_h=pallas_window_h,
                    padding_mode="border",
                    compute_dtype=jnp.dtype(self.cas.warp_dtype),
                    interpret=pallas_ops.pallas_interpret(),
                    window_w=pallas_window_w,
                    raw_layout=rows_layout,
                    chunk_bands=pallas_chunk_bands,
                )
            if rows_layout:
                Cp, T_pad = sampled.shape[-2], sampled.shape[-1]
                feat_rows = sampled.reshape(B, S, H_r, Cp, T_pad)
            else:
                feat_sm = sampled.reshape(B, S, N * Ns, -1)

        per_view_feat = [] if not use_pallas else None
        per_view_dir = []
        for s in range(S):
            if use_pallas:
                feat = None  # the fused sampler already holds the features
            elif raster_hw is not None:
                ixt = geometry.scale_ixt(batch["src_ixts"][:, s], render_scale)
                xy, _ = geometry.project_points(
                    pts, batch["src_exts"][:, s], ixt
                )
                H_r, W_r = raster_hw
                nx = 1
                if cols_per_tile and window_w:
                    nx = max(W_r // cols_per_tile, 1)
                    while W_r % nx:
                        nx -= 1
                w_win = window_w if nx > 1 else Wf
                tiles = xy.reshape(B, H_r * nx, (W_r // nx) * Ns, 2)
                feat = jax.vmap(
                    lambda img, c: sampling.windowed_sample_tiles(
                        img, c, window_h, w_win, "border",
                        # training interpolation matmuls stay float32
                        compute_dtype=None if train else self.cas._warp_dt(),
                        tiles_per_step=nx,
                    )
                )(img_feat_rgb[:, s], tiles).reshape(B, N * Ns, -1)
            else:
                ixt = geometry.scale_ixt(batch["src_ixts"][:, s], render_scale)
                xy, _ = geometry.project_points(
                    pts, batch["src_exts"][:, s], ixt
                )
                feat = jax.vmap(
                    lambda img, c: sampling.grid_sample_2d(img, c, "border")
                )(img_feat_rgb[:, s], xy)  # (B, N*Ns, C+3)

            src_c = geometry.cam_center(batch["src_exts"][:, s])  # (B, 3)
            tar_diff = pts - tar_c[:, None]
            src_diff = pts - src_c[:, None]
            tar_diff = tar_diff / (
                jnp.linalg.norm(tar_diff, axis=-1, keepdims=True) + 1e-6
            )
            src_diff = src_diff / (
                jnp.linalg.norm(src_diff, axis=-1, keepdims=True) + 1e-6
            )
            ray_diff = tar_diff - src_diff
            ray_diff_norm = jnp.linalg.norm(ray_diff, axis=-1, keepdims=True)
            ray_diff_dot = jnp.sum(tar_diff * src_diff, axis=-1, keepdims=True)
            ray_diff_dir = ray_diff / jnp.maximum(ray_diff_norm, 1e-6)
            per_view_dir.append(
                jnp.concatenate([ray_diff_dir, ray_diff_dot], axis=-1)
            )
            if feat is not None:
                per_view_feat.append(feat)
        dirs_sm = jnp.stack(per_view_dir, axis=1)  # (B, S, N*Ns, 4)
        if rows_layout:
            H_r, W_r = raster_hw
            T = (N * Ns) // H_r
            dirs_rows = jnp.swapaxes(
                dirs_sm.reshape(B, S, H_r, T, 4), -1, -2
            )  # (B, S, H_r, 4, T)
            if T_pad != T:
                dirs_rows = jnp.pad(
                    dirs_rows,
                    ((0, 0),) * 4 + ((0, T_pad - T),),
                )
            return feat_rows, dirs_rows
        if feat_sm is None:
            feat_sm = jnp.stack(per_view_feat, axis=1)  # (B, S, N*Ns, C+3)
        return feat_sm, dirs_sm

    # ------------------------------------------------------------------
    # full forward
    # ------------------------------------------------------------------

    def __call__(self, batch: dict, train: bool = False) -> dict:
        feats = self.extract_features(batch["src_inps"], train)
        ret = {}
        prev = None
        for i in range(self.cas.num):
            feat_vol, depth, std, nf_map = self.build_level_volume(
                i,
                feats,
                batch["src_exts"],
                batch["src_ixts"],
                batch["tar_ext"],
                batch["tar_ixt"],
                batch["near_far"],
                prev,
                train,
            )
            prev = (depth, std, nf_map)
            if not self.cas.render_if[i]:
                continue
            out = self.render_level(
                i, feats, feat_vol, depth, std, nf_map, batch,
                batch[f"ray_idx_{i}"], train,
            )
            ret.update({f"{k}_level{i}": v for k, v in out.items()})
        return ret
