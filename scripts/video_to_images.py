"""Extract frames from a capture video (reference scripts/mp4toimgs.py).

Usage: python scripts/video_to_images.py <video.mp4> <out_dir> [--every N]
Writes out_dir/images/%06d.jpg ready for COLMAP feature extraction.
"""

import argparse
import os

import cv2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("video")
    ap.add_argument("out_dir")
    ap.add_argument("--every", type=int, default=1,
                    help="keep every Nth frame")
    ap.add_argument("--max-frames", type=int, default=0)
    args = ap.parse_args()

    img_dir = os.path.join(args.out_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    cap = cv2.VideoCapture(args.video)
    if not cap.isOpened():
        raise SystemExit(f"cannot open {args.video}")
    idx = kept = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if idx % args.every == 0:
            cv2.imwrite(os.path.join(img_dir, f"{kept:06d}.jpg"), frame)
            kept += 1
            if args.max_frames and kept >= args.max_frames:
                break
        idx += 1
    cap.release()
    print(f"wrote {kept} frames to {img_dir}")


if __name__ == "__main__":
    main()
