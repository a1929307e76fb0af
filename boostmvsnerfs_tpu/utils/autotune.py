"""Per-scene window auto-tuning for the fused Pallas kernels.

The windowed samplers (ops/pallas/{warp_variance,img_sample}.py and the XLA
windowed fallbacks) are exact when every bilinear tap of a row falls inside
its y-band — and their FLOP cost is *linear in the band height* (the
band-x-output interpolation matmul). The defaults (32/16) are safe for
typical capture rigs but generous: most of the render's arithmetic is
spent multiplying rows of zero triangle weights (utils/roofline.py:
sample1 alone is ~55% of flagship-render FLOPs at window 32).

This module computes the **minimal exact windows for a given scene's
cameras** and returns a re-tuned CascadeConfig. Key property making this
sound without knowing the regressed depths: a pinhole projection maps a
3D segment to an image-space segment, so projecting only the two *depth
endpoints* (scene near/far) of every target ray/voxel column bounds the
y-span of every intermediate depth sample. Coverage is then verified with
the kernels' own exactness checkers (sampling.sample_window_coverage /
pallas.warp_variance.warp_variance_coverage), evaluated with row-level
grouping — conservative versus the kernels' tighter per-chunk bands.

Windows depend only on the camera poses/intrinsics, so tuning once per
scene (or over a sample of target views plus ``margin``) is enough; each
distinct window re-compiles the stage jits once.
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


def tune_img_window_w(batch: dict, cas, level: int, window_h: int,
                      candidates=X_CANDIDATES) -> int:
    """Minimal exact x-window of the fused row sampler's per-chunk
    interpolation matmul at ``level`` (0 = full width when none fits).

    Uses the kernel's own coverage checker
    (ops.pallas.img_sample.row_sample_coverage), which reproduces the
    column chunking and the 128-lane-aligned window origins."""
    from boostmvsnerfs_tpu.ops.pallas.img_sample import row_sample_coverage

    spans, (H_r, W_r) = _img_spans(batch, cas, level)
    # render-scale feature maps have C+3 channels (feat + RGB)
    C = (32, 16, 8)[cas.render_im_feat_level[level]] + 3
    W_pad = -(-W_r // 128) * 128

    def miss(w):
        m = 0.0
        for sxy in spans:
            m = max(m, float(row_sample_coverage(
                (H_r, W_r, C), sxy[..., 0], sxy[..., 1], window_h, w,
                padding_mode="border",
            )))
        return m

    for w in candidates:
        if w >= W_pad:
            break
        if miss(w) == 0.0:
            return w
    return 0


def tune_cascade_windows(batch: dict, cas, margin: int = 0):
    """Re-tune every per-level Pallas/windowed kernel window for the scene
    geometry in ``batch`` (uses src/tar cameras + scene near_far only).

    ``margin`` adds rows of safety when tuning from a subset of target
    views (0 = exact for exactly these cameras). Returns a new
    CascadeConfig."""
    import jax

    warp = []
    img = []
    img_w = []
    # camera-geometry math only — run on host CPU so tuning never pays
    # (remote) TPU compiles for dozens of tiny programs
    with jax.default_device(jax.devices("cpu")[0]):
        for i in range(cas.num):
            warp.append(tune_warp_window(batch, cas, i) + margin)
            img.append(tune_img_window(batch, cas, i) + margin)
            # x-windows shrink the dominant sample-stage matmul; margin
            # scales by the lane tile (origins are 128-aligned)
            w = tune_img_window_w(batch, cas, i, img[-1])
            img_w.append(w + 128 * (margin > 0) if w else 0)
    return dataclasses.replace(
        cas,
        pallas_window_h=tuple(warp),
        warp_window_h=tuple(max(w, x) for w, x in zip(warp, cas.warp_window_h)),
        pallas_img_window_h=tuple(img),
        img_window_h=tuple(img),
        pallas_img_window_w=tuple(img_w),
    )
