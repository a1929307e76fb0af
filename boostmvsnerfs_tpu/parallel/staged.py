"""Staged execution: the render pipeline as a few separately-jitted stages.

XLA whole-program optimization scales superlinearly with program size — the
monolithic 2-level x K-volume forward compiles orders of magnitude slower
than its stages do individually (and on the axon remote-compile path a huge
program can block the compile service for everyone). Staged execution jits
each pipeline stage once (features / per-level volume / per-level render /
blend); intermediate tensors stay on device, so dispatch overhead is a few
microseconds per stage while compile time drops from tens of minutes to
seconds.

The staged path produces the same numerics as the monolithic ``model.apply``
(same functions, same order) — tests assert equality.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from boostmvsnerfs_tpu.models.boost_enerf import BoostENeRF, _take_views
from boostmvsnerfs_tpu.models.enerf import ENeRF
from boostmvsnerfs_tpu.ops import render


class StagedENeRF:
    """Stage-jitted ENeRF / BoostENeRF forward for evaluation.

    With ``mesh`` (a ``(cv, rays)`` mesh from parallel/mesh.make_cv_mesh)
    the boost pipeline shards across devices via per-stage jit shardings:
    the K-folded batch axis of the volume stages partitions over ``cv``
    (each device group builds its own cost volumes) and the ray axis of
    the render stage over ``rays``; the cross-K blend inside the fused
    render stage is the only cross-``cv`` collective. No model changes —
    the stage boundaries already expose exactly the tensors that need
    constraints (SURVEY.md §2.3 TPU mapping (b))."""

    def __init__(self, model: ENeRF, mesh=None, fuse_levels: bool | None = None,
                 fuse_frame: bool = False, fold_inside: bool = True):
        self.model = model
        self.cas = model.cas
        self.boost = isinstance(model, BoostENeRF)
        self.mesh = mesh
        # fuse_levels: jit each cascade level's volume+render+blend as ONE
        # program (3 dispatches/frame instead of 5-6). On the remote-tunnel
        # TPU backend per-dispatch overhead is tens of ms, so fewer, larger
        # programs win; compile time per level stays in staged territory.
        # Defaults on for the boost eval pipeline (off under a mesh: the
        # per-stage shardings below are tuned for the split stages).
        if fuse_levels is None:
            fuse_levels = mesh is None and self.boost
        self.fuse_levels = fuse_levels
        m = model

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            cv = NamedSharding(mesh, P("cv"))
            cv_rays = NamedSharding(mesh, P("cv", "rays"))
        else:
            rep = cv = cv_rays = None

        if mesh is not None:
            # the per-view FPN is embarrassingly parallel over the source
            # views: shard the view axis over ``cv``. GSPMD requires the
            # sharded dim divisible by the axis, so pad the view count up
            # to a cv multiple inside the program (static shapes) and
            # slice back; the combo fold below re-gathers each view
            # group's features with one all-gather on ``cv``
            views = NamedSharding(mesh, P(None, "cv"))
            n_cv = mesh.shape["cv"]

            def features_fn(v, x):
                V = x.shape[1]
                pad = (-V) % n_cv
                if pad:
                    x = jnp.concatenate([x, x[:, :pad]], axis=1)
                x = jax.lax.with_sharding_constraint(x, views)
                out = m.apply(v, x, False, method=ENeRF.extract_features)
                if pad:
                    out = {k: f[:, :V] for k, f in out.items()}
                return out

            self._features = jax.jit(features_fn)
        else:
            self._features = jax.jit(
                lambda v, x: m.apply(v, x, False, method=ENeRF.extract_features)
            )

        def _pin(tree, sharding):
            """Constrain every leaf inside the program: unlike jit
            in_shardings this RESHARDS args whatever committed sharding
            they arrive with (the eager combo fold of the view-sharded
            features commits a sharding jit would otherwise reject)."""
            if sharding is None:
                return tree
            return jax.tree_util.tree_map(
                lambda x: jax.lax.with_sharding_constraint(x, sharding),
                tree,
            )

        boost_mesh = mesh is not None and self.boost

        def volume_stage(level, v, feats, src_exts, src_ixts, tar_ext,
                         tar_ixt, near_far, prev):
            if boost_mesh:
                # everything but the params carries the K-folded batch
                # axis first — partition it over ``cv``
                feats, src_exts, src_ixts, tar_ext, tar_ixt, near_far, \
                    prev = _pin(
                        (feats, src_exts, src_ixts, tar_ext, tar_ixt,
                         near_far, prev), cv,
                    )
            return m.apply(
                v, level, feats, src_exts, src_ixts, tar_ext, tar_ixt,
                near_far, prev, False, method=ENeRF.build_level_volume,
            )

        def render_stage(level, return_raw, v, feats, feat_vol, depth, std,
                         nf_map, batch, ray_idx):
            return m.apply(
                v, level, feats, feat_vol, depth, std, nf_map, batch,
                ray_idx, False, return_raw, method=ENeRF.render_level,
            )

        vol_jit_kw = {}
        if boost_mesh:
            vol_jit_kw = dict(out_shardings=cv)
        self._volume = {
            i: jax.jit(partial(volume_stage, i), **vol_jit_kw)
            for i in range(self.cas.num)
        }
        self._render = {
            (i, raw): jax.jit(partial(render_stage, i, raw))
            for i in range(self.cas.num)
            for raw in (True, False)
        }
        self._mask_composite = jax.jit(
            self._mask_composite_fn, static_argnums=(1,)
        )
        if self.boost:
            self._blend = {
                i: jax.jit(partial(self._blend_fn, inv=self.cas.depth_inv[i]))
                for i in range(self.cas.num)
            }

            # one dispatch per level for the boost hot path: the K raw
            # renders and the cross-K blend fuse into a single program, so
            # the (B*K, N, S, 4) raws never cross a dispatch boundary
            def render_blend_stage(level, K, v, feats, feat_vol, depth, std,
                                   nf_map, batch, ray_idx):
                if mesh is not None:
                    # volume tensors stay cv-sharded; the ray ids split
                    # over (cv, rays) so each device renders its volume
                    # group's ray tile; the blend's cross-K reduction is
                    # the only cross-cv collective
                    feats, feat_vol, depth, std, nf_map, batch = _pin(
                        (feats, feat_vol, depth, std, nf_map, batch), cv
                    )
                    ray_idx = _pin(ray_idx, cv_rays)
                raw_out = m.apply(
                    v, level, feats, feat_vol, depth, std, nf_map, batch,
                    ray_idx, False, True, method=ENeRF.render_level,
                )
                BK = raw_out["net_output"].shape[0]
                B = BK // K

                def unfold(a):
                    return a.reshape(B, K, *a.shape[1:])

                raws = unfold(raw_out["net_output"])
                masks = unfold(raw_out["mask"])
                zs = unfold(raw_out["z_vals"])
                depth0 = unfold(depth)[:, 0]
                std0 = unfold(std)[:, 0]
                return self._blend_fn(
                    raws, masks, zs, depth0, std0,
                    inv=self.cas.depth_inv[level],
                )

            self._render_blend = {
                i: jax.jit(
                    partial(render_blend_stage, i, self.cas.k_best),
                )
                for i in range(self.cas.num)
            }

            # whole-level program: volume build + (optionally) fused
            # render+blend in ONE dispatch — same functions in the same
            # order as the split stages, so numerics are identical
            def level_stage(level, K, render, v, feats, src_exts, src_ixts,
                            tar_ext, tar_ixt, near_far, prev, rb, ray_idx):
                feat_vol, depth, std, nf_map = m.apply(
                    v, level, feats, src_exts, src_ixts, tar_ext, tar_ixt,
                    near_far, prev, False, method=ENeRF.build_level_volume,
                )
                out = None
                if render:
                    raw_out = m.apply(
                        v, level, feats, feat_vol, depth, std, nf_map, rb,
                        ray_idx, False, True, method=ENeRF.render_level,
                    )
                    BK = raw_out["net_output"].shape[0]
                    B = BK // K

                    def unfold(a):
                        return a.reshape(B, K, *a.shape[1:])

                    out = self._blend_fn(
                        unfold(raw_out["net_output"]),
                        unfold(raw_out["mask"]),
                        unfold(raw_out["z_vals"]),
                        unfold(depth)[:, 0],
                        unfold(std)[:, 0],
                        inv=self.cas.depth_inv[level],
                    )
                return (depth, std, nf_map), out

            if self.fuse_levels:
                self._level = {
                    i: jax.jit(partial(
                        level_stage, i, self.cas.k_best,
                        bool(self.cas.render_if[i]),
                    ))
                    for i in range(self.cas.num)
                }

                # fold-inside variant for the no-mesh hot path: the combo
                # gather/fold/repeat glue runs INSIDE each level program.
                # Eagerly it emits ~10 tiny executables per frame whose
                # per-launch gaps on the remote-tunnel backend cost more
                # than the (sub-ms) on-device gathers they contain.
                def level_stage_folded(level, K, render, v, feats_all,
                                       fb, prev):
                    sel = jnp.take(fb["combos"], fb["k_best"], axis=0)
                    B = fb["all_src_inps"].shape[0]
                    I = sel.shape[-1]

                    def fold(x):
                        g = _take_views(x, sel.reshape(B, K * I))
                        return g.reshape(B * K, I, *x.shape[2:])

                    def rep(x):
                        return jnp.repeat(x, K, axis=0)

                    feats = {
                        lvl: fold(f) for lvl, f in feats_all.items()
                    }
                    rb = {
                        "src_inps": fold(fb["all_src_inps"]),
                        "src_exts": fold(fb["all_src_exts"]),
                        "src_ixts": fold(fb["all_src_ixts"]),
                        "tar_ext": rep(fb["tar_ext"]),
                        "tar_ixt": rep(fb["tar_ixt"]),
                    }
                    last = self.cas.num - 1
                    ridx = rep(fb.get(f"ray_idx_{level}",
                                      fb[f"ray_idx_{last}"]))
                    return level_stage(
                        level, K, render, v, feats, rb["src_exts"],
                        rb["src_ixts"], rb["tar_ext"], rb["tar_ixt"],
                        rep(fb["near_far"]), prev, rb, ridx,
                    )

                self._level_folded = {
                    i: jax.jit(partial(
                        level_stage_folded, i, self.cas.k_best,
                        bool(self.cas.render_if[i]),
                    ))
                    for i in range(self.cas.num)
                }

            if fuse_frame:
                # everything after the feature net in ONE program: the
                # XLA scheduler sees the whole cascade, so inter-level
                # tensors never cross a dispatch/relayout boundary
                def frame_stage(v, feats, src_exts, src_ixts, tar_ext,
                                tar_ixt, near_far, rb, ray_idxs):
                    prev = None
                    ret = {}
                    for i in range(self.cas.num):
                        prev, out = level_stage(
                            i, self.cas.k_best, bool(self.cas.render_if[i]),
                            v, feats, src_exts, src_ixts, tar_ext, tar_ixt,
                            near_far, prev, rb, ray_idxs[i],
                        )
                        if out is not None:
                            ret.update(
                                {f"{k}_level{i}": x for k, x in out.items()}
                            )
                    return ret

                self._frame = jax.jit(frame_stage)
        self.fuse_frame = fuse_frame and self.boost
        self.fold_inside = fold_inside

    @staticmethod
    def _mask_composite_fn(mask, n_samples: int):
        """Composite per-sample visibility into a coverage image (reference
        lib/networks/boost_enerf/network.py:61-64)."""
        m = mask / n_samples
        pseudo = jnp.broadcast_to(m[..., None], m.shape + (4,))
        out = render.composite(pseudo, None)
        return jnp.mean(out["rgb"], axis=-1)

    def coverage_mask(self, variables, batch: dict, combo) -> jnp.ndarray:
        """Staged equivalent of BoostENeRF.combo_coverage_mask: the full
        cascade on one 3-view subset, returning the final level's composited
        visibility mask (B, H_r, W_r). Uses the per-stage jits so no
        monolithic full-resolution program is ever built."""
        cas = self.cas
        sub = {
            "src_inps": jnp.take(batch["all_src_inps"], combo, axis=1),
            "src_exts": jnp.take(batch["all_src_exts"], combo, axis=1),
            "src_ixts": jnp.take(batch["all_src_ixts"], combo, axis=1),
            "tar_ext": batch["tar_ext"],
            "tar_ixt": batch["tar_ixt"],
            "near_far": batch["near_far"],
        }
        feats = self._features(variables, sub["src_inps"])
        prev = None
        last = cas.num - 1
        raw_out = None
        for i in range(cas.num):
            feat_vol, depth, std, nf_map = self._volume[i](
                variables, feats, sub["src_exts"], sub["src_ixts"],
                sub["tar_ext"], sub["tar_ixt"], sub["near_far"], prev,
            )
            prev = (depth, std, nf_map)
            if i == last:
                raw_out = self._render[(i, True)](
                    variables, feats, feat_vol, depth, std, nf_map,
                    _render_batch(sub), batch[f"ray_idx_{i}"],
                )
        B, S, H, W, _ = sub["src_inps"].shape
        H_r = int(H * cas.render_scale[last])
        W_r = int(W * cas.render_scale[last])
        m = self._mask_composite(raw_out["mask"], cas.num_samples[last])
        return m.reshape(B, H_r, W_r)

    @staticmethod
    def _blend_fn(raws, masks, zs, depth0, std0, *, inv: bool):
        masks = render.normalize_blend_masks(masks)
        out = render.composite_blend(raws, masks, zs)
        out["depth_mvs"] = 1.0 / depth0 if inv else depth0
        out["std"] = std0
        return out

    def __call__(self, variables, batch: dict) -> dict:
        if self.boost:
            return self._forward_boost(variables, batch)
        return self._forward_base(variables, batch)

    def _forward_base(self, variables, batch):
        cas = self.cas
        feats = self._features(variables, batch["src_inps"])
        ret = {}
        prev = None
        for i in range(cas.num):
            feat_vol, depth, std, nf_map = self._volume[i](
                variables, feats, batch["src_exts"], batch["src_ixts"],
                batch["tar_ext"], batch["tar_ixt"], batch["near_far"], prev,
            )
            prev = (depth, std, nf_map)
            if not cas.render_if[i]:
                continue
            out = self._render[(i, False)](
                variables, feats, feat_vol, depth, std, nf_map,
                _render_batch(batch), batch[f"ray_idx_{i}"],
            )
            ret.update({f"{k}_level{i}": v for k, v in out.items()})
        return ret

    def _forward_boost(self, variables, batch):
        cas = self.cas
        K = cas.k_best

        if (
            self.fold_inside
            and self.fuse_levels
            and not self.fuse_frame
            and self.mesh is None
        ):
            # hot path: features + one fold-inside program per level —
            # zero eager glue executables between dispatches
            feats_all = self._features(variables, batch["all_src_inps"])
            keys = [
                "all_src_inps", "all_src_exts", "all_src_ixts", "tar_ext",
                "tar_ixt", "near_far", "combos", "k_best",
            ] + [
                f"ray_idx_{i}" for i in range(cas.num)
                if f"ray_idx_{i}" in batch
            ]
            fb = {k: batch[k] for k in keys}
            prev = None
            ret = {}
            for i in range(cas.num):
                prev, out = self._level_folded[i](
                    variables, feats_all, fb, prev
                )
                if out is not None:
                    ret.update(
                        {f"{k}_level{i}": v for k, v in out.items()}
                    )
            return ret

        B = batch["all_src_inps"].shape[0]
        sel = jnp.take(batch["combos"], batch["k_best"], axis=0)
        I = sel.shape[-1]

        feats_all = self._features(variables, batch["all_src_inps"])

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
            "near_far": rep(batch["near_far"]),
        }
        feats = {lvl: fold(f) for lvl, f in feats_all.items()}

        ret = {}
        prev = None
        rb = _render_batch(sub)
        last = cas.num - 1
        if self.fuse_frame:
            ridxs = {
                i: rep(batch.get(f"ray_idx_{i}", batch[f"ray_idx_{last}"]))
                for i in range(cas.num)
            }
            return self._frame(
                variables, feats, sub["src_exts"], sub["src_ixts"],
                sub["tar_ext"], sub["tar_ixt"], sub["near_far"], rb, ridxs,
            )
        for i in range(cas.num):
            ridx = rep(batch.get(f"ray_idx_{i}", batch[f"ray_idx_{last}"]))
            if self.fuse_levels:
                prev, out = self._level[i](
                    variables, feats, sub["src_exts"], sub["src_ixts"],
                    sub["tar_ext"], sub["tar_ixt"], sub["near_far"], prev,
                    rb, ridx,
                )
                if out is not None:
                    ret.update({f"{k}_level{i}": v for k, v in out.items()})
                continue
            feat_vol, depth, std, nf_map = self._volume[i](
                variables, feats, sub["src_exts"], sub["src_ixts"],
                sub["tar_ext"], sub["tar_ixt"], sub["near_far"], prev,
            )
            prev = (depth, std, nf_map)
            if not cas.render_if[i]:
                continue
            out = self._render_blend[i](
                variables, feats, feat_vol, depth, std, nf_map, rb, ridx,
            )
            ret.update({f"{k}_level{i}": v for k, v in out.items()})
        return ret


def _render_batch(batch: dict) -> dict:
    """The subset of batch keys render_level reads (hashable-stable)."""
    keys = ["src_inps", "src_exts", "src_ixts", "tar_ext", "tar_ixt"]
    return {k: batch[k] for k in keys}


class StagedMVSNeRF:
    """Stage-jitted MVSNeRF / BoostMVSNeRF forward for evaluation.

    The monolithic forward at real geometry materializes the positional
    encodings + per-sample features of every ray at once (K=4, D=32,
    86ch/sample — ~20GB HBM at 224x352) and OOMs a single chip. This
    executor jits (features, per-combo volume build, row-block render)
    separately and marches the rays in blocks of whole raster rows —
    the TPU-native equivalent of the reference's serial ray chunks
    (lib/networks/boost_mvsnerf/network.py:97-135, N_rays//10) that keeps
    the fused Pallas row samplers applicable (models/mvsnerf.py
    render_volume H_rows blocks). The cross-K blend runs per block (rays
    are independent) and blocks concatenate on the host side of the jit
    boundary while staying on device.
    """

    def __init__(self, model, row_chunk: int = 32):
        from boostmvsnerfs_tpu.models.boost_mvsnerf import BoostMVSNeRF
        from boostmvsnerfs_tpu.models.mvsnerf import MVSNeRF

        self.model = model
        self.cfg = model.cfg
        self.boost = isinstance(model, BoostMVSNeRF)
        self.row_chunk = row_chunk
        m = model

        self._features = jax.jit(
            lambda v, x: m.apply(
                v, x, False, method=MVSNeRF.extract_features
            )
        )
        self._volume = jax.jit(
            lambda v, src, feats, pm, dv: m.apply(
                v, src, feats, pm, dv, False, method=MVSNeRF.build_volume
            )
        )
        self._render = {
            wm: jax.jit(
                partial(
                    lambda with_mask, v, sub, vol, ridx, near, far: m.apply(
                        v, sub, vol, ridx, near, far, False, with_mask,
                        method=MVSNeRF.render_volume,
                    ),
                    wm,
                )
            )
            for wm in (False, True)
        }

        def blend(raws, masks, zs):
            masks = render.normalize_blend_masks(masks)
            return render.composite_blend(raws, masks, zs)

        self._blend = jax.jit(blend)
        self._composite = jax.jit(
            lambda raw, z: render.composite(raw, z, softmax_depth=True)
        )

        # boost hot path: one program per ray block — the K raw renders
        # and the cross-K blend fuse so the (B*K, N, S, 4) raws never
        # cross a dispatch boundary (same fusion as StagedENeRF)
        def render_blend(K, v, sub, vol, ridx, near, far):
            raw = m.apply(
                v, sub, vol, ridx, near, far, False, True,
                method=MVSNeRF.render_volume,
            )
            BK = raw["net_output"].shape[0]
            B = BK // K

            def unfold(a):
                return a.reshape(B, K, *a.shape[1:])

            return blend(
                unfold(raw["net_output"]), unfold(raw["mask"]),
                unfold(raw["z_vals"]),
            )

        if self.boost:
            self._render_blend = jax.jit(
                partial(render_blend, self.cfg.k_best)
            )

            # ALL row blocks in one program: a lax.scan over equal-shaped
            # ray blocks (per-iteration activations stay block-sized, so
            # memory matches the per-block dispatch loop) — measured
            # per-executable overhead on the remote TPU backend is
            # ~10-25ms, so the 8-block 18-dispatch frame loses ~40% of
            # its wall time to dispatch, not compute
            def render_all_blocks(K, v, sub, vol, blocks, near, far):
                def body(carry, ridx):
                    ridx_k = jnp.repeat(ridx, K, axis=0)
                    o = render_blend(K, v, sub, vol, ridx_k, near, far)
                    # channels to sublanes for the scan's per-iteration
                    # output writes: a (B, n, 3) rgb block DUS-writes a
                    # 42x lane-padded buffer per iteration in HBM tiling
                    return carry, {
                        k: jnp.moveaxis(a, -1, 1) if a.ndim == 3 else a
                        for k, a in o.items()
                    }

                _, outs = jax.lax.scan(body, 0.0, blocks)

                # (nb, B, [C,] n_blk) -> (B, nb*n_blk[, C]): blocks are
                # consecutive row ranges in raster order
                def merge(a):
                    if a.ndim == 4:
                        a = jnp.moveaxis(a, 2, 3)
                    return jnp.moveaxis(a, 0, 1).reshape(
                        a.shape[1], a.shape[0] * a.shape[2], *a.shape[3:]
                    )

                return {k: merge(a) for k, a in outs.items()}

            self._render_frame = jax.jit(
                partial(render_all_blocks, self.cfg.k_best)
            )

    def _ray_blocks(self, ray_idx, W):
        B, N = ray_idx.shape
        rows = N // W if N % W == 0 else 0
        rc = self.row_chunk
        if rows == 0 or rows <= rc or rows % rc != 0:
            return [ray_idx]
        return [
            ray_idx[:, r * W * rc:(r + 1) * W * rc]
            for r in range(rows // rc)
        ]

    def __call__(self, variables, batch: dict) -> dict:
        from boostmvsnerfs_tpu.models.boost_enerf import _take_views
        from boostmvsnerfs_tpu.models.mvsnerf import mvs_proj_mats

        cfg = self.cfg
        m_vars = variables
        if self.boost:
            K = cfg.k_best
            B = batch["all_src_inps"].shape[0]
            sel = jnp.take(batch["combos"], batch["k_best"], axis=0)
            I = sel.shape[-1]

            def fold(x):
                g = _take_views(x, sel.reshape(B, K * I))
                return g.reshape(B * K, I, *x.shape[2:])

            def rep(x):
                return jnp.repeat(x, K, axis=0)

            feats_all = self._features(m_vars, batch["all_src_inps"])
            sub = {
                "src_inps": fold(batch["all_src_inps"]),
                "src_exts": fold(batch["all_src_exts"]),
                "src_ixts": fold(batch["all_src_ixts"]),
                "tar_ext": rep(batch["tar_ext"]),
                "tar_ixt": rep(batch["tar_ixt"]),
            }
            feats = fold(feats_all)
            dr = fold(batch["depth_ranges"])
            near = jnp.min(dr[..., 0], axis=1) * cfg.near_far_scale[0]
            far = jnp.max(dr[..., 1], axis=1) * cfg.near_far_scale[1]
            t = jnp.linspace(0.0, 1.0, cfg.num_samples)
            dv = near[:, None] * (1 - t) + far[:, None] * t
            pm = mvs_proj_mats(sub["src_ixts"], sub["src_exts"])
            volume = self._volume(m_vars, sub["src_inps"], feats, pm, dv)

            W = batch["all_src_inps"].shape[3]
            blocks = self._ray_blocks(batch["ray_idx_0"], W)
            if len(blocks) > 1:
                merged = self._render_frame(
                    m_vars, sub, volume, jnp.stack(blocks), near, far
                )
            else:
                merged = self._render_blend(
                    m_vars, sub, volume, rep(blocks[0]), near, far
                )
            return {f"{k}_level0": v for k, v in merged.items()}

        # plain MVSNeRF
        V = cfg.n_views
        feats = self._features(m_vars, batch["all_src_inps"])
        sub = {
            "src_inps": batch["all_src_inps"][:, :V],
            "src_exts": batch["all_src_exts"][:, :V],
            "src_ixts": batch["all_src_ixts"][:, :V],
            "tar_ext": batch["tar_ext"],
            "tar_ixt": batch["tar_ixt"],
        }
        dr = batch["depth_ranges"][:, :V]
        near = jnp.min(dr[..., 0], axis=1) * cfg.near_far_scale[0]
        far = jnp.max(dr[..., 1], axis=1) * cfg.near_far_scale[1]
        t = jnp.linspace(0.0, 1.0, cfg.num_samples)
        dv = near[:, None] * (1 - t) + far[:, None] * t
        pm = mvs_proj_mats(sub["src_ixts"], sub["src_exts"])
        volume = self._volume(
            m_vars, sub["src_inps"], feats[:, :V], pm, dv
        )
        W = batch["all_src_inps"].shape[3]
        outs = []
        for ridx in self._ray_blocks(batch["ray_idx_0"], W):
            raw = self._render[False](m_vars, sub, volume, ridx, near, far)
            outs.append(self._composite(raw["net_output"], raw["z_vals"]))
        merged = {
            k: jnp.concatenate([o[k] for o in outs], axis=1)
            for k in outs[0]
        }
        return {f"{k}_level0": v for k, v in merged.items()}
