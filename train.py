"""Training entry point (reference train_net.py equivalent).

Usage: python train.py --cfg_file configs/exps/pretrain/enerf/dtu_pretrain.yaml [key value ...]
Multi-host: launched once per host; jax.distributed initializes from env.
"""

import argparse
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", required=True)
    parser.add_argument("--distributed", action="store_true")
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = parser.parse_args()

    if args.distributed or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        import jax

        jax.distributed.initialize()

    from boostmvsnerfs_tpu.config import make_cfg
    from boostmvsnerfs_tpu.runner import run_train
    from boostmvsnerfs_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    cfg = make_cfg(args.cfg_file, args.opts)
    run_train(cfg)


if __name__ == "__main__":
    main()
