"""Host data-pipeline throughput harness.

Measures steady-state loader batches/s at several worker counts over a
synthetic on-disk LLFF scene at DTU-pretrain-like decode cost, and compares
it to a supplied train-step time — the loader must not starve the TPU
(reference multi-worker DataLoader, lib/datasets/make_dataset.py:81-104).

  python scripts/bench_loader.py [--height 512 --width 640 --images 32]
                                 [--step-ms 120]  # train step to beat
Prints ONE JSON line with batches/s per worker count.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import imageio.v2 as imageio  # noqa: E402
import numpy as np  # noqa: E402


def write_scene(root, scene, n, H, W):
    rng = np.random.default_rng(11)
    os.makedirs(os.path.join(root, scene, "images_2"), exist_ok=True)
    pb = np.zeros((n, 17), np.float64)
    for i in range(n):
        angle = 0.2 * i
        c2w = np.eye(4)
        c2w[:3, 3] = [3 * np.sin(angle), 0.1, 3 * np.cos(angle)]
        m = np.zeros((3, 5))
        m[:3, 1] = c2w[:3, 0]
        m[:3, 0] = c2w[:3, 1]
        m[:3, 2] = -c2w[:3, 2]
        m[:3, 3] = c2w[:3, 3]
        m[0, 4], m[1, 4], m[2, 4] = H * 2, W * 2, 100.0
        pb[i, :15] = m.reshape(-1)
        pb[i, 15:] = [2.0, 8.0]
        img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        imageio.imwrite(
            os.path.join(root, scene, "images_2", f"{i:04d}.png"), img
        )
    np.save(os.path.join(root, scene, "poses_bounds.npy"), pb)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--images", type=int, default=32)
    ap.add_argument("--batches", type=int, default=24)
    ap.add_argument("--step-ms", type=float, default=0.0,
                    help="train-step time to compare against (ms)")
    args = ap.parse_args()

    from boostmvsnerfs_tpu.data.free import FreeDataset
    from boostmvsnerfs_tpu.data.loader import Loader
    from boostmvsnerfs_tpu.models.enerf import CascadeConfig

    tmp = tempfile.mkdtemp(prefix="bench_loader_")
    write_scene(tmp, "grass", args.images, args.height, args.width)
    cas = CascadeConfig(
        train_img=(False, False), num_rays=(4096, 32768)
    )
    ds = FreeDataset(
        tmp, "train", cas, input_h_w=(args.height, args.width),
        scenes=["grass"],
    )

    result = {"metric": "loader_batches_per_sec", "height": args.height,
              "width": args.width, "per_workers": {}}
    for workers in (1, 2, 4, 8):
        loader = Loader(
            ds, batch_size=1, shuffle=True, ep_iter=args.batches,
            num_workers=workers,
        )
        it = iter(loader)
        next(it)  # warm the pool / page cache
        t0 = time.perf_counter()
        n = 0
        for _ in it:
            n += 1
        dt = time.perf_counter() - t0
        result["per_workers"][str(workers)] = round(n / dt, 2)

    if args.step_ms > 0:
        best = max(result["per_workers"].values())
        result["step_ms"] = args.step_ms
        result["keeps_up"] = bool(best >= 1000.0 / args.step_ms)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
