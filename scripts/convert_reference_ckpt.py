"""Convert a reference BoostMVSNeRFs .pth checkpoint into this framework's
checkpoint layout so `run.py --type evaluate` picks it up directly.

Usage:
  python scripts/convert_reference_ckpt.py <latest.pth> <trained_model_dir> \
      [--levels 2]

The output directory should match cfg.trained_model_dir for the experiment
(e.g. $workspace/trained_model/pretrain/enerf).
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("pth")
    ap.add_argument("out_dir")
    ap.add_argument("--family", choices=("enerf", "mvsnerf"),
                    default="enerf",
                    help="checkpoint family: enerf (also enerf_ours) or "
                         "mvsnerf (also mvsnerf_ours)")
    ap.add_argument("--levels", type=int, default=2)
    ap.add_argument("--mlp-depth", type=int, default=6)
    ap.add_argument("--no-viewdir-agg", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from boostmvsnerfs_tpu.train.checkpoint import CheckpointManager
    from boostmvsnerfs_tpu.utils.port_weights import (
        load_torch_checkpoint,
        port_enerf,
        port_mvsnerf,
    )

    sd = load_torch_checkpoint(args.pth)
    if args.family == "mvsnerf":
        variables = port_mvsnerf(sd, mlp_depth=args.mlp_depth)
    else:
        variables = port_enerf(
            sd, num_levels=args.levels, viewdir_agg=not args.no_viewdir_agg
        )
    n_params = sum(
        v.size for v in jax.tree_util.tree_leaves(variables["params"])
    )
    print(f"ported {n_params:,} parameters")

    mgr = CheckpointManager(args.out_dir)
    mgr.save(variables, epoch=0, latest=True)
    print(f"saved to {mgr.latest_path()}")


if __name__ == "__main__":
    main()
