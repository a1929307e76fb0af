"""Measure bf16-conv eval throughput + quality delta vs the f32 pipeline.

Runs the staged flagship render (BoostENeRF K=4, Free eval geometry) twice —
conv_dtype float32 vs bfloat16 — and reports per-frame time for each plus
the PSNR between the two rendered images (the bf16 policy's quality cost,
cf. docs/PARITY.md AMP recipe).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync_frame(out):
    leaf = out["rgb_level1"]
    jax.block_until_ready(leaf)
    np.asarray(jax.device_get(leaf.ravel()[0]))
    return out


def run(conv_dtype, np_batch, iters=6):
    import dataclasses

    from boostmvsnerfs_tpu.models.boost_enerf import BoostENeRF
    from boostmvsnerfs_tpu.models.enerf import CascadeConfig
    from boostmvsnerfs_tpu.utils.autotune import tune_cascade_windows
    from boostmvsnerfs_tpu.utils.init_utils import init_variables

    cas = CascadeConfig(k_best=4)
    cas = tune_cascade_windows(np_batch, cas)
    cas = dataclasses.replace(cas, conv_dtype=conv_dtype)
    model = BoostENeRF(cas=cas)
    batch = {k: jnp.asarray(v) for k, v in np_batch.items()}
    variables = jax.device_put(init_variables(model, np_batch))
    from boostmvsnerfs_tpu.parallel.staged import StagedENeRF

    staged = StagedENeRF(model)
    sync_frame(staged(variables, batch))  # compile
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = sync_frame(staged(variables, batch))
        times.append(time.perf_counter() - t0)
    return min(times), np.asarray(out["rgb_level1"])


def main():
    from boostmvsnerfs_tpu.utils.synthetic import make_scene_batch

    H, W = 480, 736
    np_batch = make_scene_batch(
        B=1, n_views=6, H=H, W=W, boost=True, k_best=4, seed=0, rig="forward"
    )
    t32, rgb32 = run("float32", np_batch)
    t16, rgb16 = run("bfloat16", np_batch)
    mse = float(np.mean((rgb32 - rgb16) ** 2))
    psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
    print(
        f"f32 {t32*1e3:.1f}ms/frame  bf16-conv {t16*1e3:.1f}ms/frame  "
        f"speedup {t32/t16:.2f}x  agreement {psnr:.1f} dB PSNR"
    )


if __name__ == "__main__":
    main()
