"""Production-path parity at evaluation geometry (runs on the real TPU).

The golden reference-parity suite pins the exact paths (gather sampling,
f32) at 64x96; the path bench.py actually measures is Pallas warp + fused
row sampler + fused NeRF head + bf16 interpolation at 480x736 with
autotuned windows. This closes the chain: it renders the SAME scene and
weights through both paths at >=240x368 and reports the PSNR between them
(vs the reference semantics transitively through
tests/test_reference_parity.py's gather-path golden tests).

Usage: python scripts/check_prod_parity.py [H W] (default 240 368)
Prints one JSON line {"metric": "prod_path_parity_psnr", ...}; exits
nonzero when below the bf16 parity budget (45 dB).
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    H = int(sys.argv[1]) if len(sys.argv) > 1 else 240
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 368

    from boostmvsnerfs_tpu.models.boost_enerf import BoostENeRF
    from boostmvsnerfs_tpu.models.enerf import CascadeConfig
    from boostmvsnerfs_tpu.parallel.staged import StagedENeRF
    from boostmvsnerfs_tpu.utils.autotune import (
        tune_cascade_windows_calibrated,
    )
    from boostmvsnerfs_tpu.utils.init_utils import init_variables
    from boostmvsnerfs_tpu.utils.synthetic import make_scene_batch

    cas = CascadeConfig(k_best=4)
    np_batch = make_scene_batch(
        B=1, n_views=6, H=H, W=W, boost=True, k_best=4, seed=0,
        rig="forward",
    )
    variables = init_variables(BoostENeRF(cas=cas), np_batch)
    batch = {k: jnp.asarray(v) for k, v in np_batch.items()}

    # production path: Pallas kernels, bf16 interpolation, calibrated
    # autotuned windows — exactly bench.py's configuration
    prod_cas = tune_cascade_windows_calibrated(np_batch, cas, variables)
    prod = StagedENeRF(BoostENeRF(cas=prod_cas))(variables, batch)

    # exact path: XLA gathers, float32 everywhere
    exact_cas = dataclasses.replace(
        cas,
        warp_mode="gather",
        eval_sampling="gather",
        eval_head="xla",
        warp_dtype="float32",
        conv_dtype="float32",
    )
    exact = StagedENeRF(BoostENeRF(cas=exact_cas))(variables, batch)

    out = {}
    ok = True
    for lvl in (0, 1):
        g = np.asarray(prod[f"rgb_level{lvl}"])
        e = np.asarray(exact[f"rgb_level{lvl}"])
        mse = float(np.mean((g - e) ** 2))
        psnr = float(10 * np.log10(1.0 / max(mse, 1e-12)))
        out[f"psnr_level{lvl}"] = round(psnr, 2)
        ok = bool(ok and psnr > 45)
    print(
        json.dumps(
            {
                "metric": "prod_path_parity_psnr",
                "height": H,
                "width": W,
                "backend": jax.default_backend(),
                "windows": {
                    "warp_h": list(prod_cas.pallas_window_h),
                    "img_h": list(prod_cas.pallas_img_window_h),
                    "img_w": list(prod_cas.pallas_img_window_w),
                    "chunk_bands": list(prod_cas.pallas_img_chunk_bands),
                },
                **out,
                "pass": ok,
            }
        )
    )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
