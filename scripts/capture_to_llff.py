"""COLMAP sparse model -> LLFF poses_bounds.npy (imgs2poses equivalent).

The reference custom-capture pipeline (BoostMVSNeRFs_DEMO.ipynb) runs COLMAP
then LLFF's imgs2poses.py to produce the poses_bounds.npy the Free/custom
datasets read. This does the same conversion from a COLMAP sparse/0 binary
model using boostmvsnerfs_tpu.utils.colmap.

Usage:
  python scripts/capture_to_llff.py <scene_dir>          # expects
      <scene_dir>/sparse/0/{cameras,images,points3D}.bin
  python scripts/capture_to_llff.py <scene_dir> --model <model_dir>

Optionally pre-seed a COLMAP database with known PINHOLE intrinsics so the
mapper skips self-calibration:
  python scripts/capture_to_llff.py <scene_dir> --init-db fx fy cx cy W H
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from boostmvsnerfs_tpu.utils.colmap import (  # noqa: E402
    colmap_to_poses_bounds,
    read_model,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene_dir")
    ap.add_argument("--model", default=None,
                    help="COLMAP model dir (default <scene>/sparse/0)")
    ap.add_argument("--init-db", nargs=6, type=float, default=None,
                    metavar=("FX", "FY", "CX", "CY", "W", "H"),
                    help="create database.db with fixed PINHOLE intrinsics")
    args = ap.parse_args()

    if args.init_db is not None:
        from boostmvsnerfs_tpu.utils.colmap_db import ColmapDB

        fx, fy, cx, cy, w, h = args.init_db
        db_path = os.path.join(args.scene_dir, "database.db")
        names = sorted(
            os.path.basename(p)
            for p in glob.glob(os.path.join(args.scene_dir, "images", "*"))
        )
        with ColmapDB.create(db_path) as db:
            cam = db.add_camera("PINHOLE", int(w), int(h),
                                [fx, fy, cx, cy], prior_focal=True)
            for name in names:
                db.add_image(name, cam)
        print(f"seeded {db_path} with {len(names)} images (PINHOLE)")
        if args.model is None and not os.path.isdir(
            os.path.join(args.scene_dir, "sparse", "0")
        ):
            return  # db seeding only; run COLMAP next, then re-invoke

    model_dir = args.model or os.path.join(args.scene_dir, "sparse", "0")
    cams, images, pts = read_model(model_dir)
    pb = colmap_to_poses_bounds(cams, images, pts)
    out = os.path.join(args.scene_dir, "poses_bounds.npy")
    np.save(out, pb)
    print(f"wrote {out}: {pb.shape[0]} poses, "
          f"bounds [{pb[:, -2].min():.3f}, {pb[:, -1].max():.3f}]")


if __name__ == "__main__":
    main()
