"""Benchmark: novel-view render throughput of the flagship fused model.

Measures rays/sec (final cascade level) for the BoostENeRF K=4 fused render
at the Free-dataset evaluation geometry (480x736, 6 source views, k_best=4,
render_if [False, True] — reference configs/exps/evaluate/enerf_ours/
{base,free}_eval.yaml) on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` compares against the most recent value stored in
bench_baseline.json (self-relative until reference-hardware numbers exist —
the reference repo publishes none, see BASELINE.md).

Measurement protocol (drift-controlled):
* value = median frame time over BENCH_ITERS frames (min/max spread also
  reported — the shared dev chip drifts +/-10% between sessions).
* ``mfu`` counts the FLOPs of the program that actually ran (calibrated
  sampler windows when BENCH_CALIBRATE=1); ``mfu_endpoint`` counts the
  endpoint-safe windows' FLOPs for comparison with pre-r4 reports.
* BENCH_AB='{"pallas_img_window_h": [16, 64]}' interleaves a second window
  variant A/B/A/B within the same session so lever comparisons are immune
  to session-level drift; its throughput is reported under "ab".
"""

import json
import os
import time

import jax
import jax.numpy as jnp


def _sync_all(out):
    """block_until_ready alone is unreliable on the axon remote backend for
    freshly compiled executables — force a tiny host transfer per leaf."""
    import numpy as np

    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(jax.device_get(leaf.ravel()[0]))
    return out


def _sync_frame(out):
    """Per-iteration sync: one host fetch of the FINAL stage's output.

    Executables dispatch in order on the single TPU core, so the last
    blend stage's rgb completing implies the whole frame completed. A
    per-leaf fetch costs one tunnel round-trip per output (10 leaves —
    measured ~250ms/frame of pure RTT on the axon backend), which is
    measurement overhead, not render time."""
    import numpy as np

    leaf = out["rgb_level1"] if "rgb_level1" in out else (
        jax.tree_util.tree_leaves(out)[-1]
    )
    jax.block_until_ready(leaf)
    np.asarray(jax.device_get(leaf.ravel()[0]))
    return out


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


def main():
    import dataclasses as _dc
    import sys

    from boostmvsnerfs_tpu.models.boost_enerf import BoostENeRF
    from boostmvsnerfs_tpu.models.enerf import CascadeConfig
    from boostmvsnerfs_tpu.utils.compile_cache import enable_compile_cache
    from boostmvsnerfs_tpu.utils.init_utils import init_variables
    from boostmvsnerfs_tpu.utils.synthetic import make_scene_batch

    enable_compile_cache()

    H, W = int(os.environ.get("BENCH_H", 480)), int(os.environ.get("BENCH_W", 736))
    n_views = 6
    k_best = 4
    iters = int(os.environ.get("BENCH_ITERS", 8))
    # the reference evaluates the cascade with only the fine level rendered
    # (configs/exps/evaluate/enerf/base_eval.yaml render_if [False, True]);
    # BENCH_RENDER_ALL=1 renders both levels (the training-time cascade)
    render_if = (
        (True, True) if os.environ.get("BENCH_RENDER_ALL") == "1"
        else (False, True)
    )

    cas = CascadeConfig(k_best=k_best, render_if=render_if)
    np_batch = make_scene_batch(
        B=1, n_views=n_views, H=H, W=W, boost=True, k_best=k_best, seed=0,
        rig="forward",  # Free-dataset-like forward trajectory (BASELINE.md)
    )

    variables = init_variables(BoostENeRF(cas=cas), np_batch)
    endpoint_cas = cas
    if os.environ.get("BENCH_AUTOTUNE", "1") == "1":
        # per-scene kernel-window tuning — a one-time setup pass like the
        # reference's view-selection preprocessing. The default calibrated
        # mode runs the volume stages once and tunes the sampler windows
        # against the ACTUAL per-ray depth bounds (exactly the production
        # bounds — sampler windows don't affect the depth maps); the
        # endpoint mode (BENCH_CALIBRATE=0) stays sound knowing cameras
        # only
        from boostmvsnerfs_tpu.utils.autotune import (
            tune_cascade_windows,
            tune_cascade_windows_calibrated,
        )

        endpoint_cas = tune_cascade_windows(np_batch, cas)
        if os.environ.get("BENCH_CALIBRATE", "1") == "1":
            cas = tune_cascade_windows_calibrated(np_batch, cas, variables)
        else:
            cas = endpoint_cas
        if os.environ.get("BENCH_WINDOWS"):
            # explicit override for A/B window experiments:
            # '{"pallas_img_window_h": [16, 64], ...}'
            over = {
                k: tuple(v) if isinstance(v, list) else v
                for k, v in json.loads(os.environ["BENCH_WINDOWS"]).items()
            }
            cas = _dc.replace(cas, **over)
        print("# autotuned windows:",
              {"warp_h": cas.pallas_window_h,
               "img_h": cas.pallas_img_window_h,
               "img_w": cas.pallas_img_window_w,
               "chunk_bands": cas.pallas_img_chunk_bands},
              file=sys.stderr)

    variants = {"main": cas}
    if os.environ.get("BENCH_AB"):
        over = {
            k: tuple(v) if isinstance(v, list) else v
            for k, v in json.loads(os.environ["BENCH_AB"]).items()
        }
        variants["ab"] = _dc.replace(cas, **over)

    batch = {k: jnp.asarray(v) for k, v in np_batch.items()}
    # init on CPU with a tiny batch — a full-res model.init would compile
    # the monolithic forward (utils/init_utils.py); params don't depend on
    # the tuned windows, so the calibration-time variables are reused
    variables = jax.device_put(variables)

    fwds = {}
    for name, v_cas in variants.items():
        model = BoostENeRF(cas=v_cas)
        if os.environ.get("BENCH_MODE", "staged") == "staged":
            from boostmvsnerfs_tpu.parallel.staged import StagedENeRF

            fuse = os.environ.get("BENCH_FUSE", "level")
            fwds[name] = StagedENeRF(
                model,
                fuse_levels=fuse == "level",
                fuse_frame=fuse == "frame",
            )
        else:
            fwds[name] = jax.jit(
                lambda v, b, m=model: m.apply(v, b, False)
            )
    # warm-up / compile (full-leaf sync: every executable provably ran);
    # with the persistent compilation cache warm this is seconds, not
    # minutes (utils/compile_cache.py)
    t0 = time.perf_counter()
    for fwd in fwds.values():
        _sync_all(fwd(variables, batch))
    warmup_s = time.perf_counter() - t0

    # interleave variants within the session so A/B deltas are measured
    # under identical chip/tunnel conditions. Two timings per variant:
    # per-frame-sync latency (includes one tunnel round-trip per frame —
    # ~100ms of measurement overhead on the axon backend, not render
    # time) and pipelined throughput (BENCH_DEPTH frames dispatched
    # back-to-back, one sync — the frames/second the executor actually
    # sustains rendering a trajectory, the workload the fps claim is
    # about).
    depth = int(os.environ.get("BENCH_DEPTH", 6))
    times = {name: [] for name in fwds}
    lat = {name: [] for name in fwds}
    for _ in range(iters):
        for name, fwd in fwds.items():
            t0 = time.perf_counter()
            _sync_frame(fwd(variables, batch))
            lat[name].append(time.perf_counter() - t0)
        for name, fwd in fwds.items():
            t0 = time.perf_counter()
            out = None
            for _ in range(depth):
                out = fwd(variables, batch)
            _sync_frame(out)
            times[name].append((time.perf_counter() - t0) / depth)

    n_rays = batch["ray_idx_1"].shape[1]
    dt = _median(times["main"])
    rays_per_sec = n_rays / dt

    baseline_file = os.path.join(os.path.dirname(__file__), "bench_baseline.json")
    vs_baseline = 1.0
    if os.path.exists(baseline_file):
        try:
            with open(baseline_file) as f:
                prev = json.load(f).get("rays_per_sec")
            if prev:
                vs_baseline = rays_per_sec / prev
        except Exception:
            pass
    else:
        with open(baseline_file, "w") as f:
            json.dump({"rays_per_sec": rays_per_sec, "H": H, "W": W,
                       "fps": 1.0 / dt}, f)

    from boostmvsnerfs_tpu.utils.roofline import speed_of_light

    sol = speed_of_light(H, W, dt, n_views=n_views, k_best=k_best, cas=cas)
    sol_ep = speed_of_light(
        H, W, dt, n_views=n_views, k_best=k_best, cas=endpoint_cas
    )
    out = {
        "metric": "boost_enerf_render_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs_baseline, 4),
        "fps": round(1.0 / dt, 3),
        # headline MFU counts the FLOPs the executed program actually ran
        # (calibrated windows); endpoint MFU uses the camera-only-safe
        # window FLOP count (the pre-r5 numerator)
        "mfu": round(sol["mfu"], 4),
        "mfu_endpoint": round(sol_ep["mfu"], 4),
        "sol_pct": round(sol["sol_pct"], 4),
        "gflops_per_view": round(sol["gflops_per_view"], 1),
        "frame_ms": {
            "median": round(dt * 1e3, 2),
            "min": round(min(times["main"]) * 1e3, 2),
            "max": round(max(times["main"]) * 1e3, 2),
        },
        # single-frame latency including the per-frame tunnel round-trip
        "frame_ms_latency": round(_median(lat["main"]) * 1e3, 2),
        "warmup_s": round(warmup_s, 1),
    }
    if "ab" in times:
        dt_ab = _median(times["ab"])
        out["ab"] = {
            "rays_per_sec": round(n_rays / dt_ab, 1),
            "frame_ms_median": round(dt_ab * 1e3, 2),
            "speedup_vs_main": round(dt_ab and dt / dt_ab, 4),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
