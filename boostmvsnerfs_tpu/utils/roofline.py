"""Analytic FLOP / HBM-byte accounting for the flagship render.

Counts the major matmul/conv terms of the BoostENeRF fused render (the
bench.py workload) so throughput can be reported as a fraction of the
chip's speed of light instead of only relative to past runs
(BASELINE.md). Numbers are per rendered target view; minor elementwise
work (depth regression, compositing, softmax) is excluded, so MFU is a
slight lower bound.

Peak numbers default to TPU v5e (197 TFLOP/s bf16, 819 GB/s HBM) and can
be overridden with BOOST_PEAK_TFLOPS / BOOST_PEAK_GBPS for other chips.
"""

from __future__ import annotations

import dataclasses
import os


def _conv2d(h, w, cin, cout, k):
    return 2 * h * w * cin * cout * k * k


def _conv3d(d, h, w, cin, cout, k=3):
    return 2 * d * h * w * cin * cout * k ** 3


def fpn_flops(H, W, n_views):
    """FeatureNet (models/feature_net.py): 6 conv stages + FPN merges."""
    f = 0
    f += _conv2d(H, W, 3, 8, 3) + _conv2d(H, W, 8, 8, 3)
    f += _conv2d(H // 2, W // 2, 8, 16, 5) + _conv2d(H // 2, W // 2, 16, 16, 3)
    f += _conv2d(H // 4, W // 4, 16, 32, 5) + _conv2d(H // 4, W // 4, 32, 32, 3)
    f += _conv2d(H // 4, W // 4, 32, 32, 1)  # toplayer
    f += _conv2d(H // 2, W // 2, 16, 32, 1) + _conv2d(H, W, 8, 32, 1)  # lats
    f += _conv2d(H // 2, W // 2, 32, 16, 3) + _conv2d(H, W, 32, 8, 3)  # smooth
    return n_views * f


def warp_flops(D, Hv, Wv, Hs, Ws, C, window_h, n_cv, s_cv):
    """Fused warp-variance (ops/pallas/warp_variance.py): per output row one
    (window_h*C, Ws) x (Ws, Wv) matmul + one (C, window_h*C) x (., Wv)
    channel-selection matmul, per source view per plane."""
    whc = window_h * C
    per_row = 2 * whc * Ws * Wv + 2 * C * whc * Wv
    return n_cv * s_cv * D * Hv * per_row


def costreg_flops(D, Hv, Wv, cin, deep: bool):
    """MinCostRegNet (deep=False) / CostRegNet (models/cost_reg_net.py)."""
    f = _conv3d(D, Hv, Wv, cin, 8)
    f += _conv3d(D // 2, Hv // 2, Wv // 2, 8, 16)
    f += _conv3d(D // 2, Hv // 2, Wv // 2, 16, 16)
    f += _conv3d(D // 4, Hv // 4, Wv // 4, 16, 32)
    f += _conv3d(D // 4, Hv // 4, Wv // 4, 32, 32)
    if deep:
        f += _conv3d(D // 8, Hv // 8, Wv // 8, 32, 64) * 2
        f += _conv3d(D // 4, Hv // 4, Wv // 4, 64, 32)  # deconv to /4
    f += _conv3d(D // 2, Hv // 2, Wv // 2, 32, 16)
    f += _conv3d(D, Hv, Wv, 16, 8)
    f += _conv3d(D, Hv, Wv, 8, 8) + _conv3d(D, Hv, Wv, 8, 1)
    return f


def img_sample_flops(H_r, W_r, Ns, Hs, Ws, Cp, window_h, n_cv, s_cv,
                     window_w=0):
    """Fused row sampler (ops/pallas/img_sample.py): per target row one
    (window_h*Cp, Wk) x (Wk, T) matmul + the channel selection, T = W_r*Ns;
    Wk = the per-chunk x-window (lane-padded source width when 0)."""
    whc = window_h * Cp
    T = W_r * Ns
    ws_pad = -(-Ws // 128) * 128
    wk = min(-(-window_w // 128) * 128, ws_pad) if window_w else ws_pad
    per_row = 2 * whc * wk * T + 2 * Cp * whc * T
    return n_cv * s_cv * H_r * per_row


def img_sample_bytes(H_r, W_r, Ns, Hs, Ws, Cp, window_h, n_cv, s_cv,
                     itemsize=2.0):
    """Actual HBM traffic of the fused row sampler's band-per-row DMA mode:
    each target row re-fetches its (window_h*Cp, W_pad) source band (bands
    of neighboring rows overlap, so this is ~window_h x the one-pass image
    read the naive count assumes), plus the kernel-layout output."""
    ws_pad = -(-Ws // 128) * 128
    band = window_h * Cp * ws_pad * itemsize
    out = W_r * Ns * Cp * 4.0
    return n_cv * s_cv * H_r * (band + out)


def nerf_head_flops(N, Ns, S, C):
    """NeRFHead + Agg (models/nerf_head.py); C = feat_ch incl. RGB."""
    per_sample = 0
    per_sample += S * 2 * 4 * C  # view_fc
    per_sample += S * 2 * C * 32 + 2 * (2 * C) * 32  # global_fc split
    per_sample += S * 2 * 32 + 2 * 32 * 16  # agg_w + fc
    per_sample += 2 * 24 * 64 + 2 * 64  # lr0 + sigma
    per_sample += 2 * 88 * 64 + S * 2 * (C + 4) * 64 + S * 2 * 64  # color
    return N * Ns * per_sample


@dataclasses.dataclass
class Roofline:
    flops: float
    bytes: float

    @property
    def intensity(self):
        return self.flops / max(self.bytes, 1)


def flagship_render_costs(H, W, n_views=6, k_best=4, s_cv=3, cas=None):
    """Per-view FLOPs/bytes of the BoostENeRF fused render (bench.py
    geometry). Returns {stage: Roofline} plus a 'total'."""
    if cas is None:
        from boostmvsnerfs_tpu.models.enerf import CascadeConfig

        cas = CascadeConfig(k_best=k_best)
    stages = {}
    stages["fpn"] = Roofline(
        fpn_flops(H, W, n_views),
        n_views * H * W * (3 + 8 + 32 // 4 + 16 // 2) * 4.0,
    )
    # level 0: feats H/4 x W/4 x 32, volume D0 at 1/8
    D0, D1 = cas.volume_planes
    Hv0, Wv0 = int(H * 0.125), int(W * 0.125)
    Hv1, Wv1 = H // 2, W // 2
    stages["warp0"] = Roofline(
        warp_flops(D0, Hv0, Wv0, H // 4, W // 4, 32, cas.pallas_window_h[0],
                   k_best, s_cv),
        k_best * (s_cv * (H // 4) * (W // 4) * 32 * 2.0
                  + D0 * Hv0 * Wv0 * (32 + 1) * 4.0),
    )
    stages["warp1"] = Roofline(
        warp_flops(D1, Hv1, Wv1, H // 2, W // 2, 16, cas.pallas_window_h[1],
                   k_best, s_cv),
        k_best * (s_cv * (H // 2) * (W // 2) * 16 * 2.0
                  + D1 * Hv1 * Wv1 * (16 + 1) * 4.0),
    )
    act0 = D0 * Hv0 * Wv0
    act1 = D1 * Hv1 * Wv1
    stages["costreg0"] = Roofline(
        k_best * costreg_flops(D0, Hv0, Wv0, 32, deep=False),
        k_best * act0 * (32 + 8 + 8 + 1) * 4.0 * 2,
    )
    stages["costreg1"] = Roofline(
        k_best * costreg_flops(D1, Hv1, Wv1, 16, deep=True),
        k_best * act1 * (16 + 8 + 8 + 1) * 4.0 * 2,
    )
    # render level 1 (full res, Ns=2): image sampling + NeRF head.
    # Levels with render_if=False build their volume but never render
    # (the reference evaluates with render_if [False, True]:
    # configs/exps/evaluate/enerf/base_eval.yaml) — their sample/NeRF
    # terms are excluded so the count matches the executed program.
    if cas.render_if[1]:
        Ns1 = cas.num_samples[1]
        stages["sample1"] = Roofline(
            img_sample_flops(H, W, Ns1, H, W, 16, cas.pallas_img_window_h[1],
                             k_best, s_cv,
                             window_w=cas.pallas_img_window_w[1]),
            img_sample_bytes(H, W, Ns1, H, W, 16,
                             cas.pallas_img_window_h[1], k_best, s_cv),
        )
        stages["nerf1"] = Roofline(
            k_best * nerf_head_flops(H * W, Ns1, s_cv, 8 + 3),
            k_best * H * W * Ns1 * s_cv * (8 + 3 + 4) * 4.0,
        )
    # render level 0 (quarter res, Ns=8) on 32+3-ch features
    if cas.render_if[0]:
        Ns0 = cas.num_samples[0]
        stages["sample0"] = Roofline(
            img_sample_flops(H // 4, W // 4, Ns0, H // 4, W // 4, 48,
                             cas.pallas_img_window_h[0], k_best, s_cv,
                             window_w=cas.pallas_img_window_w[0]),
            img_sample_bytes(H // 4, W // 4, Ns0, H // 4, W // 4, 48,
                             cas.pallas_img_window_h[0], k_best, s_cv),
        )
        stages["nerf0"] = Roofline(
            k_best * nerf_head_flops((H // 4) * (W // 4), Ns0, s_cv, 32 + 3),
            k_best * (H // 4) * (W // 4) * Ns0 * s_cv * (32 + 3 + 4) * 4.0,
        )
    stages["total"] = Roofline(
        sum(s.flops for s in stages.values()),
        sum(s.bytes for s in stages.values()),
    )
    return stages


def peaks():
    """(peak FLOP/s, peak HBM B/s) for the current chip; defaults to v5e."""
    tflops = float(os.environ.get("BOOST_PEAK_TFLOPS", 197.0))
    gbps = float(os.environ.get("BOOST_PEAK_GBPS", 819.0))
    return tflops * 1e12, gbps * 1e9


def speed_of_light(H, W, seconds, **kw):
    """MFU and roofline speed-of-light fraction for one rendered view.

    sol_pct = achieved / max(compute-bound, bandwidth-bound) limit — 100%
    means the render runs at the roofline for its arithmetic intensity."""
    costs = flagship_render_costs(H, W, **kw)["total"]
    peak_f, peak_b = peaks()
    mfu = costs.flops / seconds / peak_f
    t_limit = max(costs.flops / peak_f, costs.bytes / peak_b)
    return {
        "mfu": mfu,
        "sol_pct": t_limit / seconds,
        "gflops_per_view": costs.flops / 1e9,
        "gbytes_per_view": costs.bytes / 1e9,
    }


def mvsnerf_render_costs(H, W, k_best=4, s_cv=3, D=32, pad=24,
                         mlp_width=128, mlp_depth=6):
    """Per-view FLOPs/bytes of the BoostMVSNeRF fused render
    (models/boost_mvsnerf.py at the reference mvsnerf protocol:
    one padded cost volume of D planes per selected combo, D samples per
    ray, Renderer_ours MLP; reference lib/networks/mvsnerf/network.py).
    """
    h, w = H // 4, W // 4
    hp, wp = h + 2 * pad, w + 2 * pad
    stages = {}
    # feature net: 8 stride-halving conv blocks 3->8->16->32 + toplayer
    f = _conv2d(H, W, 3, 8, 3) + _conv2d(H, W, 8, 8, 3)
    f += _conv2d(H // 2, W // 2, 8, 16, 5) + 2 * _conv2d(H // 2, W // 2, 16, 16, 3)
    f += _conv2d(h, w, 16, 32, 5) + 2 * _conv2d(h, w, 32, 32, 3)
    f += _conv2d(h, w, 32, 32, 1)
    stages["features"] = Roofline(s_cv * 2 * f, s_cv * H * W * 3 * 4.0)
    # plane-sweep warp of feats+rgb into the padded volume (windowed XLA
    # matmuls, full source width): (window_h*C, w) x (w, wp) per row
    warp = 2 * (32 + 3) * 32 * w * wp * hp * D * (s_cv - 1)
    stages["warp"] = Roofline(
        k_best * warp,
        k_best * D * hp * wp * (9 + 32) * 4.0,
    )
    # 3D U-Net 41ch -> 8ch over (D, hp, wp)
    cr = _conv3d(D, hp, wp, 41, 8)
    cr += 2 * _conv3d(D // 2, hp // 2, wp // 2, 8, 16)
    cr += 2 * _conv3d(D // 4, hp // 4, wp // 4, 16, 32)
    cr += 2 * _conv3d(D // 8, hp // 8, wp // 8, 32, 64)
    cr += _conv3d(D // 4, hp // 4, wp // 4, 64, 32)
    cr += _conv3d(D // 2, hp // 2, wp // 2, 32, 16)
    cr += _conv3d(D, hp, wp, 16, 8)
    stages["costreg"] = Roofline(
        k_best * cr, k_best * D * hp * wp * (41 + 8) * 4.0 * 2
    )
    # renderer MLP over N*D samples: pts 63 -> width, depth-1 hidden
    # layers (skip re-injects 63 at layer 4), pts_bias 20 -> width,
    # alpha/feature/views/rgb heads
    n_pts = H * W * D
    per = 2 * (63 * mlp_width + (mlp_depth - 1) * mlp_width * mlp_width
               + 63 * mlp_width + 20 * mlp_width + mlp_width
               + mlp_width * mlp_width + (mlp_width + 3) * mlp_width
               + mlp_width * 3)
    stages["mlp"] = Roofline(
        k_best * n_pts * per,
        k_best * n_pts * (63 + 20 + 3 + 4) * 4.0,
    )
    # per-sample volume + color lookups (counted as bytes; gather FLOPs
    # are negligible next to the MLP)
    stages["sampling"] = Roofline(
        0.0, k_best * n_pts * (8 + s_cv * 4) * 4.0 * 2
    )
    stages["total"] = Roofline(
        sum(s.flops for s in stages.values()),
        sum(s.bytes for s in stages.values()),
    )
    return stages


def mvsnerf_speed_of_light(H, W, seconds, **kw):
    costs = mvsnerf_render_costs(H, W, **kw)["total"]
    peak_f, peak_b = peaks()
    mfu = costs.flops / seconds / peak_f
    t_limit = max(costs.flops / peak_f, costs.bytes / peak_b)
    return {
        "mfu": mfu,
        "sol_pct": t_limit / seconds,
        "gflops_per_view": costs.flops / 1e9,
    }
