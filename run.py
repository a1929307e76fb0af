"""Type-dispatched runs (reference run.py equivalent).

Usage: python run.py --type {dataset,network,preprocess,evaluate,visualize} \
       --cfg_file configs/... [key value ...]
"""

import argparse
import time


def run_dataset(cfg):
    """Loader smoke test (reference run.py:5-12)."""
    import tqdm

    from boostmvsnerfs_tpu.data import make_dataset
    from boostmvsnerfs_tpu.data.loader import Loader

    dataset = make_dataset(cfg, "test")
    loader = Loader(dataset, batch_size=1)
    for _ in tqdm.tqdm(loader):
        pass


def run_network(cfg):
    """Forward-latency smoke test (reference run.py:14-37)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from boostmvsnerfs_tpu.data import make_dataset
    from boostmvsnerfs_tpu.data.loader import Loader
    from boostmvsnerfs_tpu import runner

    model = runner.make_network(cfg)
    dataset = make_dataset(cfg, "test")
    variables = runner._init_or_load(
        cfg, model, dataset, runner.requires_view_selection(cfg)
    )
    loader = Loader(dataset, batch_size=1)
    boost = runner.requires_view_selection(cfg)
    vs = runner.load_view_selection(cfg) if boost else None
    fwd = jax.jit(lambda v, b: model.apply(v, b, False))
    times = []
    for i, np_batch in enumerate(loader):
        if boost:
            np_batch = runner.attach_boost_inputs(np_batch, vs, cfg)
        batch = {k: jnp.asarray(v) for k, v in np_batch.items() if k != "meta"}
        t0 = time.perf_counter()
        runner.host_sync(fwd(variables, batch))
        times.append(time.perf_counter() - t0)
        if i >= 20:
            break
    print(f"network latency: {np.mean(times[1:]) * 1000:.1f} ms "
          f"(fps {1.0 / np.mean(times[1:]):.2f})")


def run_preprocess(cfg):
    """View-selection preprocessing (reference run.py:39-69)."""
    from boostmvsnerfs_tpu.data import make_dataset
    from boostmvsnerfs_tpu.data.loader import Loader
    from boostmvsnerfs_tpu import runner

    model = runner.make_network(cfg)
    test_ds = make_dataset(cfg, "test")
    variables = runner._init_or_load(cfg, model, test_ds, boost=True)
    loaders = [Loader(test_ds, 1)]
    try:
        loaders.insert(0, Loader(make_dataset(cfg, "train"), 1))
    except Exception:
        pass
    out = runner.run_view_selection(cfg, model, variables, loaders)
    print(f"view selection written for {len(out)} target views")


def run_evaluate(cfg):
    from boostmvsnerfs_tpu import runner

    runner.run_evaluate(cfg)


def run_visualize(cfg):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from boostmvsnerfs_tpu.data import make_dataset
    from boostmvsnerfs_tpu.data.loader import Loader
    from boostmvsnerfs_tpu.eval.visualizer import Visualizer
    from boostmvsnerfs_tpu.models.enerf import CascadeConfig
    from boostmvsnerfs_tpu import runner

    cas = CascadeConfig.from_cfg(cfg["enerf"])
    model = runner.make_network(cfg)
    dataset = make_dataset(cfg, "test")
    boost = runner.requires_view_selection(cfg)
    variables = runner._init_or_load(cfg, model, dataset, boost)
    loader = Loader(dataset, batch_size=1)
    vs = runner.load_view_selection(cfg) if boost else None
    vis = Visualizer(cas, cfg["result_dir"], write_video=cfg.get("write_video", True),
                     fps=int(cfg.get("fps", 10)))
    fwd = jax.jit(lambda v, b: model.apply(v, b, False))
    for np_batch in loader:
        if boost:
            np_batch = runner.attach_boost_inputs(np_batch, vs, cfg)
        batch = {k: jnp.asarray(v) for k, v in np_batch.items() if k != "meta"}
        out = runner.host_sync(fwd(variables, batch))
        vis.visualize({k: np.asarray(v) for k, v in out.items()}, np_batch)
    vis.summarize()


def run_gui(cfg):
    """Interactive browser viewer (reference lib/interactive/ equivalent;
    see boostmvsnerfs_tpu/interactive/server.py and docs/VIEWER.md)."""
    from boostmvsnerfs_tpu.interactive.server import run_gui as _run

    _run(cfg, port=int(cfg.get("gui_port", 8008)),
         host=cfg.get("gui_host", "127.0.0.1"))


def run_path(cfg):
    """Render a novel camera trajectory to video (reference render_path)."""
    from boostmvsnerfs_tpu import runner

    runner.render_novel_path(
        cfg,
        n_frames=int(cfg.get("render_num", 30)),
        path_type=cfg.get("path_type", "interpolate"),
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", required=True)
    parser.add_argument("--type", required=True,
                        choices=["dataset", "network", "preprocess", "evaluate",
                                 "visualize", "path", "gui"])
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = parser.parse_args()

    from boostmvsnerfs_tpu.config import make_cfg
    from boostmvsnerfs_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    cfg = make_cfg(args.cfg_file, args.opts)
    globals()[f"run_{args.type}"](cfg)


if __name__ == "__main__":
    main()
