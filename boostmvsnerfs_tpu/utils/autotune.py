"""Per-scene window auto-tuning for the fused Pallas kernels.

The windowed samplers (ops/pallas/{warp_variance,img_sample}.py and the XLA
windowed fallbacks) are exact when every bilinear tap of a row falls inside
its y-band — and their FLOP cost is *linear in the band height* (the
band-x-output interpolation matmul). The defaults (32/16) are safe for
typical capture rigs but generous: most of the render's arithmetic is
spent multiplying rows of zero triangle weights (utils/roofline.py:
sample1 alone is ~55% of flagship-render FLOPs at window 32).

Two tuning modes:

* **Endpoint-sound** (``tune_cascade_windows``): minimal exact windows
  knowing only the scene's cameras. Key property: a pinhole projection
  maps a 3D segment to an image-space segment, so projecting the two
  *depth endpoints* (scene near/far) of every target ray/voxel column
  bounds the span of every intermediate depth sample. The joint sampler
  tuner (``tune_img_windows_joint``) searches (y-window, x-window,
  band mode) with the kernel's own per-chunk-aware coverage checker and
  a roofline cost model (MXU FLOPs vs band-DMA bytes + DMA issue
  overhead).
* **Depth-calibrated** (``tune_cascade_windows_calibrated``): runs the
  volume stages once and tunes against the ACTUAL per-ray
  [depth-std, depth+std] bounds — identical to the production bounds,
  since sampler windows don't affect the depth maps — projecting the
  true sample positions. At the Free eval geometry this shrinks the
  fine-level y-window from the endpoint envelope (~64 rows) to ~26.

Windows depend on cameras (and, calibrated, on the scene's depth), so
tuning once per scene — or over a sample of target views plus
``margin`` — is enough; each distinct window re-compiles the stage jits
once. A per-scene precompute, like the reference's view_selection.json.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from boostmvsnerfs_tpu.ops import geometry, sampling
from boostmvsnerfs_tpu.ops.pallas.warp_variance import warp_variance_coverage

CANDIDATES = (8, 12, 16, 24, 32, 48, 64, 96, 128)


def _endpoint_depths(near_far: np.ndarray) -> np.ndarray:
    return np.asarray(near_far, np.float32).reshape(2)


def _min_window(miss_fn, candidates, fallback: int) -> int:
    for w in candidates:
        if float(miss_fn(w)) == 0.0:
            return w
    # no candidate is exact: never silently shrink — take the largest of
    # the config default and the biggest candidate tried
    return max(fallback, max(candidates))


def tune_warp_window(batch: dict, cas, level: int,
                     candidates=CANDIDATES) -> int:
    """Minimal exact y-window of the plane-sweep warp at ``level``."""
    src_inps = np.asarray(batch["src_inps"])
    B, S, H, W = src_inps.shape[:4]
    fs, vs = cas.im_feat_scale[level], cas.volume_scale[level]
    Hs, Ws = int(H * fs), int(W * fs)
    Hv, Wv = int(H * vs), int(W * vs)
    C = (32, 16, 8)[level] if level < 3 else 8

    pm = geometry.proj_mats(
        jnp.asarray(batch["src_ixts"]), jnp.asarray(batch["src_exts"]),
        jnp.asarray(batch["tar_ixt"]), jnp.asarray(batch["tar_ext"]),
        src_scale=fs, tar_scale=vs,
    )  # (B, S, 3, 4)
    nf = _endpoint_depths(np.asarray(batch["near_far"])[0])
    # endpoint "planes": D=2 at scene near/far bound every cascade schedule
    dv = jnp.asarray(
        np.broadcast_to(nf[:, None, None], (2, Hv, Wv)).copy()
    )

    def miss(w):
        m = 0.0
        for b in range(B):
            for s in range(S):
                m = max(m, float(warp_variance_coverage(
                    (Hs, Ws, C), pm[b, s], dv, w
                )))
        return m

    return _min_window(miss, candidates, cas.pallas_window_h[level])


def _img_spans(batch: dict, cas, level: int):
    """Projected source-view coordinate curves of the full target raster at
    ``level``, sampled at the scene depth endpoints: (H_r, W_r*2, 2) per
    (batch, view) pair — the input to both window-coverage checkers."""
    src_inps = np.asarray(batch["src_inps"])
    B, S, H, W = src_inps.shape[:4]
    r_s = cas.render_scale[level]
    H_r, W_r = int(H * r_s), int(W * r_s)

    # full-raster rays, sampled at the scene depth endpoints
    idx = jnp.arange(H_r * W_r, dtype=jnp.int32)[None]
    xy = geometry.flat_idx_to_xy(idx, W_r)  # (1, N, 2)
    nf = _endpoint_depths(np.asarray(batch["near_far"])[0])

    spans = []
    for b in range(B):
        tar_ixt_r = geometry.scale_ixt(
            jnp.asarray(batch["tar_ixt"][b : b + 1]), r_s
        )
        ray_o, ray_d = geometry.rays_from_pixels(
            tar_ixt_r, jnp.asarray(batch["tar_ext"][b : b + 1]), xy
        )
        pts = (
            ray_o[..., None, :]
            + ray_d[..., None, :] * jnp.asarray(nf)[None, None, :, None]
        ).reshape(1, H_r * W_r * 2, 3)
        for s in range(S):
            ixt = geometry.scale_ixt(
                jnp.asarray(batch["src_ixts"][b : b + 1, s]), r_s
            )
            sxy, _ = geometry.project_points(
                pts, jnp.asarray(batch["src_exts"][b : b + 1, s]), ixt
            )
            spans.append(sxy.reshape(H_r, W_r * 2, 2))
    return spans, (H_r, W_r)


def tune_img_window(batch: dict, cas, level: int,
                    candidates=CANDIDATES) -> int:
    """Minimal exact y-band of the render-stage row sampler at ``level``."""
    spans, (H_r, W_r) = _img_spans(batch, cas, level)

    def miss(w):
        m = 0.0
        for sxy in spans:
            m = max(m, float(sampling.sample_window_coverage(
                (H_r, W_r), sxy, w, W_r, padding_mode="border"
            )))
        return m

    return _min_window(miss, candidates, cas.pallas_img_window_h[level])


# x-window candidates are 128-lane multiples (the kernel rounds up anyway)
X_CANDIDATES = (128, 256, 384, 512, 768, 1024)


def tune_img_windows_joint(batch: dict, cas, level: int, fallback_h: int,
                           candidates=CANDIDATES,
                           x_candidates=X_CANDIDATES,
                           spans_hw=None, n_samples: int = 2):
    """Jointly minimal-cost (window_h, window_w) of the fused Pallas row
    sampler at ``level``.

    The sampler's dominant matmul costs ~window_k*Cp*(Wx or W_pad) FLOPs
    per output column; with an x-window the kernel uses PER-CHUNK y
    origins (resident and chunked-band DMA modes), so far smaller
    y-windows validate than the row-level spans the plain y tuner checks
    — at the Free eval geometry the L1 row-level window is 64 while
    canonical-chunk spans fit 16. Scans the (h, w) grid with the kernel's
    own per-chunk-aware coverage checker and returns the feasible combo
    with the lowest FLOP cost (falling back to ``fallback_h`` full-width).
    """
    from boostmvsnerfs_tpu.ops.pallas.img_sample import (
        _pack_geometry,
        row_sample_coverage,
    )

    if spans_hw is None:
        spans, (H_r, W_r) = _img_spans(batch, cas, level)
    else:
        spans, (H_r, W_r) = spans_hw
    C = (32, 16, 8)[cas.render_im_feat_level[level]] + 3
    W_pad = -(-W_r // 128) * 128

    def miss(h, w, cb):
        m = 0.0
        for sxy in spans:
            m = max(m, float(row_sample_coverage(
                (H_r, W_r, C), sxy[..., 0], sxy[..., 1], h, w,
                padding_mode="border", chunk_bands=cb,
            )))
            if m > 0:
                break
        return m

    def cost(h, w, cb):
        """Roofline seconds/row: interp-matmul FLOPs vs band-DMA bytes of
        the bf16 eval mode (the bench path). Chunked-band DMA re-fetches a
        (window_k*Cp, Wx) band per chunk, so narrow x-windows trade MXU
        work for HBM traffic — cost by the binding resource."""
        from boostmvsnerfs_tpu.ops.pallas.img_sample import _chunk_geometry
        from boostmvsnerfs_tpu.utils.roofline import peaks

        Cp, _, window_k = _pack_geometry(C, h, H_r)
        whC = window_k * Cp
        T = W_r * n_samples  # samples per output row
        T_pad = -(-T // 128) * 128
        resident = H_r * Cp * W_pad * 2 <= 6 * 2**20
        Tc, chunked = _chunk_geometry(T_pad, whC, resident, w, cb)
        flops = 2 * whC * ((w or W_pad) + Cp) * T_pad
        peak_f, peak_b = peaks()
        # each band DMA pays a fixed issue cost on top of its bytes —
        # measured on v5e a per-(row, chunk) band mode at Tc=128 (~12
        # DMAs/row) is issue-bound, not bandwidth-bound
        dma_issue = 1e-6
        if chunked:
            n = T_pad // Tc
            dma = n * max(whC * w * 2 / peak_b, dma_issue)
        elif resident:
            dma = 0.0  # image loaded once for the whole block
        else:
            dma = max(whC * W_pad * 2 / peak_b, dma_issue)  # one row band
        return max(flops / peak_f, dma)

    best = (fallback_h, 0, False)
    best_cost = cost(*best)
    for h in candidates:
        for cb in (False, True):
            # smallest feasible x-window for this h and band mode
            # (coverage is monotone in w)
            for w in [x for x in x_candidates if x < W_pad] + [0]:
                if cost(h, w, cb) >= best_cost:
                    continue
                if miss(h, w, cb) == 0.0:
                    best, best_cost = (h, w, cb), cost(h, w, cb)
                    break
    return best


def tune_cascade_windows(batch: dict, cas, margin: int = 0):
    """Re-tune every per-level Pallas/windowed kernel window for the scene
    geometry in ``batch`` (uses src/tar cameras + scene near_far only).

    ``margin`` adds rows of safety when tuning from a subset of target
    views (0 = exact for exactly these cameras). Returns a new
    CascadeConfig."""
    import jax

    warp = []
    img_row = []
    img_p = []
    img_w = []
    img_cb = []
    # camera-geometry math only — run on host CPU so tuning never pays
    # (remote) TPU compiles for dozens of tiny programs
    with jax.default_device(jax.devices("cpu")[0]):
        for i in range(cas.num):
            warp.append(tune_warp_window(batch, cas, i) + margin)
            # row-level y window: the XLA windowed fallback path samples
            # one band per row, so it needs the whole-row span
            img_row.append(tune_img_window(batch, cas, i) + margin)
            # the Pallas sampler with an x-window uses per-chunk origins:
            # jointly tune (h, w) for minimal matmul cost; margin scales
            # by the lane tile in x (origins are 128-aligned)
            h, w, cb = tune_img_windows_joint(batch, cas, i, img_row[-1])
            img_p.append(h + margin)
            img_w.append(w + 128 * (margin > 0) if w else 0)
            img_cb.append(cb)
    return dataclasses.replace(
        cas,
        pallas_window_h=tuple(warp),
        warp_window_h=tuple(max(w, x) for w, x in zip(warp, cas.warp_window_h)),
        pallas_img_window_h=tuple(img_p),
        img_window_h=tuple(img_row),
        pallas_img_window_w=tuple(img_w),
        pallas_img_chunk_bands=tuple(img_cb),
    )


TRI_Z_CANDIDATES = (2, 3, 4, 6, 8, 12, 16)


def tune_mvsnerf_windows(batch: dict, cfg, margin: int = 1):
    """Tune the StagedMVSNeRF fused-sampler windows for a scene's cameras.

    The MVSNeRF sample positions are camera-determined (uniform depth
    linspace between the scene near/far — reference
    lib/networks/mvsnerf/network.py:1002-1013 — no depth guidance), so the
    minimal exact (y, z) slab of the trilinear volume sampler
    (ops/pallas/tri_sample.py) and the y-band of the per-view color
    sampler (ops/pallas/img_sample.py) are computable without running the
    network: replicate render_volume's exact coordinate math for the full
    raster, then search the kernels' own coverage checkers. Returns a new
    MVSNeRFConfig. One-time per-scene precompute like the reference's
    view_selection.json.
    """
    import jax

    from boostmvsnerfs_tpu.ops.pallas.img_sample import row_sample_coverage
    from boostmvsnerfs_tpu.ops.pallas.tri_sample import tri_window_coverage
    from boostmvsnerfs_tpu.models.mvsnerf import ndc_coords

    boost = "combos" in batch
    src_key = "all_src_inps"
    B, n_all, H, W = np.asarray(batch[src_key]).shape[:4]
    V = cfg.cost_volume_input_views if boost else cfg.n_views
    D = cfg.num_samples
    h, w = H // 4, W // 4
    p = cfg.pad
    hp, wp = h + 2 * p, w + 2 * p

    # the (folded) view groups whose samplers run: every selected combo
    # for the boost pipeline, the first V views otherwise — mirrors
    # parallel/staged.StagedMVSNeRF.__call__
    if boost:
        sel = np.take(
            np.asarray(batch["combos"]), np.asarray(batch["k_best"]), axis=0
        )  # (B, K, I)
        groups = [
            (b, list(sel[b, k])) for b in range(B) for k in range(sel.shape[1])
        ]
    else:
        groups = [(b, list(range(V))) for b in range(B)]

    exts = np.asarray(batch["all_src_exts"])
    ixts = np.asarray(batch["all_src_ixts"])
    drs = np.asarray(batch["depth_ranges"])

    vol_h = cfg.pallas_vol_window_h
    vol_z = cfg.pallas_vol_window_z
    img_h = cfg.pallas_img_window_h
    g_candidates = [g for g in (1, 2, 4, 8, 16, 32) if D % g == 0]
    # per-G maxima over all groups/views: {G: (vol_h, vol_z, img_h)}
    per_g = {g: [1, 1, 1] for g in g_candidates}
    with jax.default_device(jax.devices("cpu")[0]):
        idx = jnp.arange(H * W, dtype=jnp.int32)[None]
        xy = geometry.flat_idx_to_xy(idx, W)
        t = jnp.linspace(0.0, 1.0, D)
        inv_scale = jnp.asarray([W - 1, H - 1], jnp.float32)

        for b, views in groups:
            dr = drs[b, views]
            near = float(dr[:, 0].min()) * cfg.near_far_scale[0]
            far = float(dr[:, 1].max()) * cfg.near_far_scale[1]
            ray_o, ray_d = geometry.rays_from_pixels(
                jnp.asarray(batch["tar_ixt"][b : b + 1]),
                jnp.asarray(batch["tar_ext"][b : b + 1]),
                xy,
            )
            z_vals = near * (1.0 - t) + far * t  # (D,)
            pts = (
                ray_o[..., None, :]
                + ray_d[..., None, :] * z_vals[None, None, :, None]
            )  # (1, N, D, 3)
            flat = pts.reshape(1, -1, 3)

            # --- trilinear volume sampler slab (rows (h, d-group)) ------
            uvd = ndc_coords(
                jnp.asarray(exts[b : b + 1, views[0]]),
                jnp.asarray(ixts[b : b + 1, views[0]]),
                flat, inv_scale, near, far, p, (h, w),
            )
            vox = uvd * jnp.asarray([wp - 1, hp - 1, D - 1], jnp.float32)
            c = jnp.swapaxes(vox.reshape(1, H, W, D, 3), 2, 3)
            for g in g_candidates:
                vx = c[..., 0].reshape(H * D // g, g * W)
                vy = c[..., 1].reshape(H * D // g, g * W)
                vz = c[..., 2].reshape(H * D // g, g * W)

                def vol_miss(wh, wz):
                    return float(tri_window_coverage(
                        (D, hp, wp, cfg.feat_dim), vx, vy, vz, wh, wz
                    ))

                wh = _min_window(lambda x: vol_miss(x, D), CANDIDATES, vol_h)
                wz = _min_window(
                    lambda x: vol_miss(max(wh, 8), x), TRI_Z_CANDIDATES,
                    vol_z,
                )
                wh = _min_window(lambda x: vol_miss(x, wz), CANDIDATES,
                                 vol_h)
                per_g[g][0] = max(per_g[g][0], wh)
                per_g[g][1] = max(per_g[g][1], wz)

            # --- per-view color sampler y-band ---------------------------
            for v in views:
                sxy, _ = geometry.project_points(
                    flat, jnp.asarray(exts[b : b + 1, v]),
                    jnp.asarray(ixts[b : b + 1, v]),
                )
                sc = jnp.swapaxes(sxy.reshape(1, H, W, D, 2), 2, 3)
                for g in g_candidates:
                    sx = sc[..., 0].reshape(H * D // g, g * W)
                    sy = sc[..., 1].reshape(H * D // g, g * W)

                    def img_miss(wh_img):
                        return float(row_sample_coverage(
                            (H, W, 3), sx, sy, wh_img,
                            padding_mode="border",
                        ))

                    per_g[g][2] = max(
                        per_g[g][2],
                        _min_window(img_miss, CANDIDATES, img_h),
                    )

    best_g, best_cost = 1, float("inf")
    for g in g_candidates:
        wh, wz, wi = per_g[g]
        # VMEM feasibility: the tri kernel double-buffers a
        # (wz, wh*C, Wp_pad) bf16 slab next to its (RB, C, T) blocks —
        # huge-G window growth can exceed what Mosaic will schedule
        # (G=32 at 224x352 picked wh=104/wz=17 and failed to compile)
        wp_pad = -(-wp // 128) * 128
        slab = 2 * (wz + 1) * ((wh + 1) * cfg.feat_dim) * wp_pad * 2
        if slab > 6 * 2**20:
            continue
        # per-row cost model: band-DMA issue + the windowed interp
        # matmuls; R rows of G*W columns — larger G trades fewer row
        # iterations against taller (costlier) windows
        R = H * D // g
        t_pad = -(-(g * W) // 128) * 128
        issue = 2e-6  # measured-scale per-row DMA/loop overhead
        flops = 2 * wz * (wh * cfg.feat_dim) * t_pad  # tri interp
        flops += 2 * (wi * 4) * t_pad * 3              # img interp (V~3)
        cost = R * (issue + flops / 2e14)
        if cost < best_cost:
            best_g, best_cost = g, cost
    wh, wz, wi = per_g[best_g]
    return dataclasses.replace(
        cfg,
        pallas_vol_window_h=min(wh + margin, hp),
        pallas_vol_window_z=min(wz + margin, D),
        pallas_img_window_h=wi + margin,
        pallas_depth_group=best_g,
    )


def _true_sample_spans(cams, bounds, H_r, W_r, n_samples, inverse):
    """Projected source coordinates of the render's ACTUAL sample
    positions, per (volume, view): list of (H_r, W_r*Ns, 2).

    ``cams`` = (tar_ixts (BK,3,3) at render scale, tar_exts (BK,4,4),
    src_ixts (BK,S,3,3) at render scale, src_exts (BK,S,4,4));
    ``bounds`` (BK, H_r, W_r, 4) per-ray [near, far, vol_near, vol_far]
    (disparities when ``inverse``) — the exact values the render samples
    between (ops/render.sample_along_depth).
    """
    import jax

    tar_ixts, tar_exts, src_ixts, src_exts = cams
    BK = bounds.shape[0]
    idx = jnp.arange(H_r * W_r, dtype=jnp.int32)[None]
    t = jnp.linspace(0.0, 1.0, n_samples, dtype=jnp.float32)

    spans = []
    for bk in range(BK):
        xy = geometry.flat_idx_to_xy(idx, W_r)
        ray_o, ray_d = geometry.rays_from_pixels(
            tar_ixts[bk : bk + 1], tar_exts[bk : bk + 1], xy
        )
        nf = bounds[bk].reshape(1, H_r * W_r, 4)
        z = nf[..., 0:1] + (nf[..., 1:2] - nf[..., 0:1]) * t  # (1, N, Ns)
        depth = 1.0 / jnp.maximum(z, 1e-6) if inverse else z
        pts = (
            ray_o[..., None, :] + ray_d[..., None, :] * depth[..., None]
        ).reshape(1, H_r * W_r * n_samples, 3)
        for s in range(src_exts.shape[1]):
            sxy, _ = geometry.project_points(
                pts, src_exts[bk : bk + 1, s], src_ixts[bk : bk + 1, s]
            )
            spans.append(
                np.asarray(sxy.reshape(H_r, W_r * n_samples, 2))
            )
    return spans


def tune_cascade_windows_calibrated(
    batch: dict, cas, variables, margin: int = 2
):
    """Depth-calibrated sampler windows: a per-scene calibration pass.

    Endpoint-sound tuning (tune_cascade_windows) bounds sample spans by
    the SCENE near/far envelope, which forces fine-level y-windows of ~64
    rows at the Free eval geometry; the actual depth-guided samples lie in
    the far tighter per-ray [depth-std, depth+std] bands (reference
    lib/networks/enerf/utils.py:392-443). This runs the volume stages once
    at the endpoint-safe windows — the sampler windows do not affect the
    depth maps, so the bounds computed here are EXACTLY the production
    ones — projects the true sample positions into every source view, and
    re-tunes the sampler (h, w, band-mode) against those spans with the
    kernel's own coverage checker. ``margin`` adds y rows (and one x lane
    tile when > 0) of slack; tune per target view, or over a sample of
    views taking per-level maxima, when reusing windows across a scene.
    Analogous one-time precompute to the reference's view_selection.json.
    """
    import jax

    from boostmvsnerfs_tpu.models.boost_enerf import BoostENeRF, _take_views
    from boostmvsnerfs_tpu.models.enerf import ENeRF
    from boostmvsnerfs_tpu.ops import render
    from boostmvsnerfs_tpu.parallel.staged import StagedENeRF

    safe = tune_cascade_windows(batch, cas)
    boost = "combos" in batch
    model = (BoostENeRF if boost else ENeRF)(cas=safe)
    staged = StagedENeRF(model)
    jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "meta"}

    B = jb["all_src_inps" if boost else "src_inps"].shape[0]
    if boost:
        K = safe.k_best
        sel = jnp.take(jb["combos"], jb["k_best"], axis=0)
        I = sel.shape[-1]

        def fold(x):
            g = _take_views(x, sel.reshape(B, K * I))
            return g.reshape(B * K, I, *x.shape[2:])

        def rep(x):
            return jnp.repeat(x, K, axis=0)

        src_inps = fold(jb["all_src_inps"])
        src_exts = fold(jb["all_src_exts"])
        src_ixts = fold(jb["all_src_ixts"])
        tar_ext = rep(jb["tar_ext"])
        tar_ixt = rep(jb["tar_ixt"])
        near_far = rep(jb["near_far"])
        feats = {
            lvl: fold(f)
            for lvl, f in staged._features(
                {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]},
                jb["all_src_inps"],
            ).items()
        }
    else:
        src_inps, src_exts, src_ixts = (
            jb["src_inps"], jb["src_exts"], jb["src_ixts"]
        )
        tar_ext, tar_ixt, near_far = (
            jb["tar_ext"], jb["tar_ixt"], jb["near_far"]
        )
        feats = staged._features(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            src_inps,
        )

    H, W = src_inps.shape[2], src_inps.shape[3]
    var = {"params": variables["params"],
           "batch_stats": variables["batch_stats"]}

    img_p, img_w, img_cb = [], [], []
    prev = None
    for i in range(cas.num):
        feat_vol, depth, std, nf_map = staged._volume[i](
            var, feats, src_exts, src_ixts, tar_ext, tar_ixt, near_far,
            prev,
        )
        prev = (depth, std, nf_map)
        H_r = int(H * cas.render_scale[i])
        W_r = int(W * cas.render_scale[i])
        inv = cas.depth_inv[i]
        bounds = render.ray_bounds_maps(depth, std, nf_map, H_r, W_r, inv)
        with jax.default_device(jax.devices("cpu")[0]):
            cams = (
                geometry.scale_ixt(tar_ixt, cas.render_scale[i]),
                tar_ext,
                geometry.scale_ixt(src_ixts, cas.render_scale[i]),
                src_exts,
            )
            spans = _true_sample_spans(
                cams, np.asarray(bounds), H_r, W_r, cas.num_samples[i], inv
            )
            h, w, cb = tune_img_windows_joint(
                batch, cas, i, safe.pallas_img_window_h[i],
                spans_hw=(spans, (H_r, W_r)),
                n_samples=cas.num_samples[i],
            )
        img_p.append(min(h + margin, safe.pallas_img_window_h[i]))
        img_w.append(w + 128 * (margin > 0) if w else 0)
        img_cb.append(cb)
    return dataclasses.replace(
        safe,
        pallas_img_window_h=tuple(img_p),
        pallas_img_window_w=tuple(img_w),
        pallas_img_chunk_bands=tuple(img_cb),
    )
