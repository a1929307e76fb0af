"""One-shot offline converter for the pretrained metric/loss weights.

Run ONCE on any host where ``torchvision`` (and optionally ``lpips``) are
installed — this zero-egress container cannot download them — then copy
the emitted .npz files next to the workspace and point the config at them:

    python scripts/convert_metric_weights.py --out-dir weights/

    # in the experiment config (or CLI opts):
    vgg_weights: weights/vgg16_features.npz        # perceptual loss
    lpips_weights:
      vgg: weights/vgg16_features.npz              # LPIPS backbone
      lin: weights/lpips_vgg_lin.npz               # LPIPS linear heads

The converters themselves are numerically proven against torch oracles on
random weights in-tree (tests/test_lpips_converter.py, tests/test_perceptual.py);
this script only performs the weight download + layout conversion that the
container's missing egress blocks. Reference usage of these weights:
lib/train/losses/vgg_perceptual_loss.py:8-11 and lib/evaluators/enerf.py:25.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="weights")
    ap.add_argument("--skip-lpips", action="store_true",
                    help="convert only the torchvision VGG16 backbone")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    from boostmvsnerfs_tpu.eval.vgg import convert_torchvision_weights

    vgg_path = os.path.join(args.out_dir, "vgg16_features.npz")
    convert_torchvision_weights(vgg_path)
    print(f"wrote {vgg_path}")

    if not args.skip_lpips:
        from boostmvsnerfs_tpu.eval.lpips import convert_lpips_weights

        lin_path = os.path.join(args.out_dir, "lpips_vgg_lin.npz")
        convert_lpips_weights(lin_path)
        print(f"wrote {lin_path}")

    print("done — set cfg.vgg_weights / cfg.lpips_weights to these paths")


if __name__ == "__main__":
    main()
