"""Experiment runner: network factory, view-selection preprocessing,
evaluation, visualization, and the training loop.

The TPU-native equivalent of the reference entry points ``run.py`` and
``train_net.py``: type-dispatched runs (reference run.py:164-165), the
view-selection offline pass writing ``view_selection.json``
(run.py:39-69), evaluation with per-scene metrics + FPS (run.py:87-129),
and the epoch training loop with checkpoint/resume (train_net.py:19-70).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from boostmvsnerfs_tpu.data import make_dataset
from boostmvsnerfs_tpu.data.loader import Loader
from boostmvsnerfs_tpu.models.boost_enerf import (
    BoostENeRF,
    search_k_best,
    view_combinations,
)
from boostmvsnerfs_tpu.models.enerf import CascadeConfig, ENeRF


# ---------------------------------------------------------------------------
# factories
# ---------------------------------------------------------------------------

def make_network(cfg):
    """Model from cfg.network_module (registry replacing the reference's
    imp.load_source factory, lib/networks/make_network.py:3-10)."""
    name = cfg["network_module"].rsplit(".", 1)[-1]
    cas = CascadeConfig.from_cfg(cfg["enerf"])
    if name == "boost_enerf":
        return BoostENeRF(cas=cas)
    if name == "boost_mvsnerf":
        from boostmvsnerfs_tpu.models.boost_mvsnerf import BoostMVSNeRF

        return BoostMVSNeRF(cfg=_mvsnerf_cfg(cfg))
    if name == "mvsnerf":
        return _mvsnerf_model(cfg)
    if name == "enerf":
        return ENeRF(cas=cas)
    if name == "enerf_composite":
        from boostmvsnerfs_tpu.models.variants import CompositeENeRF

        node = cfg.get("composite", {})
        return CompositeENeRF(
            cas=cas,
            num_fg_layers=int(node.get("num_fg_layers", 1)),
            fg_hw=tuple(node.get("fg_hw", (64, 64))),
            bg_planes=tuple(node.get("bg_planes", (16, 4))),
            white_bkgd=bool(cfg.get("enerf", {}).get("white_bkgd", False)),
        )
    if name == "enerf_human":
        from boostmvsnerfs_tpu.models.variants import HumanENeRF

        return HumanENeRF(cas=cas)
    raise ValueError(f"unknown network module: {cfg['network_module']}")


def _mvsnerf_model(cfg):
    from boostmvsnerfs_tpu.models.mvsnerf import MVSNeRF

    return MVSNeRF(cfg=_mvsnerf_cfg(cfg))


def _mvsnerf_cfg(cfg):
    from boostmvsnerfs_tpu.models.mvsnerf import MVSNeRFConfig

    return MVSNeRFConfig.from_cfg(cfg)


def requires_view_selection(cfg) -> bool:
    name = cfg.get("network_module", "").rsplit(".", 1)[-1]
    return bool(cfg.get("enerf", {}).get("require_view_selection", False)) or \
        name.startswith("boost_")


def to_device_batch(np_batch: dict) -> dict:
    return {
        k: jnp.asarray(v) for k, v in np_batch.items() if k != "meta"
    } | {"meta": np_batch["meta"]}


def host_sync(tree):
    """Force completion of a device computation (block_until_ready is not
    reliable on freshly compiled executables on the axon remote backend)."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "ravel"):
            np.asarray(jax.device_get(leaf.ravel()[0]))
    return tree


def frame_sync(out):
    """Completion sync for ONE forward's outputs at a single-element cost.

    Executables dispatch in order on a device, so one element of the
    final-level rgb (queued last) completing implies the frame completed;
    a per-leaf fetch (host_sync) pays ~10 tunnel round-trips per frame on
    the axon backend — measurement overhead, not render time."""
    leaf = None
    for name in ("rgb_level1", "rgb_level0"):
        if isinstance(out, dict) and name in out:
            leaf = out[name]
            break
    if leaf is None:
        leaf = jax.tree_util.tree_leaves(out)[-1]
    jax.block_until_ready(leaf)
    np.asarray(jax.device_get(leaf.ravel()[0]))
    return out


# ---------------------------------------------------------------------------
# view selection (offline pass -> view_selection.json)
# ---------------------------------------------------------------------------

def view_selection_path(cfg) -> str:
    return os.path.join(cfg["result_dir"], "view_selection.json")


def make_mask_fn(cfg, model):
    """jit ONE combo's coverage cascade; the combo ids are a traced input so
    all C(N,3) combos reuse a single compiled program (jitting
    forward_view_selection whole would unroll 20 cascades into one
    monolithic program — pathological for the remote compiler). For
    ENeRF-family models the cascade itself runs through the staged jits."""
    from boostmvsnerfs_tpu.models.enerf import ENeRF as _ENeRF

    if isinstance(model, _ENeRF) and cfg.get("execution", "staged") == "staged":
        from boostmvsnerfs_tpu.parallel.staged import StagedENeRF

        staged = StagedENeRF(model)

        def mask_fn(v, b, c):
            return staged.coverage_mask(v, b, c)

        return mask_fn
    return jax.jit(
        lambda v, b, c: model.apply(
            v, b, c, method=type(model).combo_coverage_mask
        )
    )


def greedy_select(mask_fn, variables, batch, combos_j, k: int) -> np.ndarray:
    """Greedy coverage selection for one batch: (B, k) combo ids, padded
    with repeats to exactly k entries (static shapes downstream).

    All combo mask renders are dispatched asynchronously before the single
    host sync: JAX queues the device work, so host dispatch latency overlaps
    with compute instead of paying one device round-trip per combo
    (C(6,3) = 20 per target view)."""
    pending = [
        mask_fn(variables, batch, combos_j[c])
        for c in range(combos_j.shape[0])
    ]
    masks = np.stack(
        [np.asarray(m) for m in map(host_sync, pending)]
    )  # (n_combos, B, H, W)
    out = []
    for b in range(masks.shape[1]):
        picks = search_k_best(masks[:, b], k)
        while len(picks) < k:
            picks.append(picks[-1])
        out.append(picks)
    return np.asarray(out, np.int32)


def run_view_selection(cfg, model, variables, loaders) -> dict:
    """Greedy per-target-view combo selection over train+test loaders,
    cached to view_selection.json (reference run.py:39-69 +
    boost_enerf/network.py:97-121)."""
    n_input = int(cfg["enerf"].get("cost_volume_input_views", 3))
    k = int(cfg["enerf"]["cas_config"]["k_best"])
    mask_fn = make_mask_fn(cfg, model)

    # combo tables are built per batch view count: train loaders can carry
    # fewer source views than test_input_views (the reference likewise
    # derives combinations from the batch, boost_enerf/network.py:99)
    combo_cache: dict[int, jnp.ndarray] = {}

    results = {}
    for loader in loaders:
        for np_batch in loader:
            batch = {
                k: jnp.asarray(v) for k, v in np_batch.items() if k != "meta"
            }
            n_views = int(np_batch["all_src_inps"].shape[1])
            if n_views not in combo_cache:
                combo_cache[n_views] = jnp.asarray(
                    view_combinations(n_views, n_input)
                )
            picks = greedy_select(
                mask_fn, variables, batch, combo_cache[n_views], k
            )
            for b, meta in enumerate(np_batch["meta"]):
                key = f"{meta['scene']}_{meta['tar_view']}"
                results[key] = [int(i) for i in picks[b]]
    os.makedirs(cfg["result_dir"], exist_ok=True)
    with open(view_selection_path(cfg), "w") as f:
        json.dump(results, f)
    return results


def load_view_selection(cfg) -> dict:
    with open(view_selection_path(cfg)) as f:
        return json.load(f)


def attach_boost_inputs(np_batch, view_selection, cfg):
    """Add combos table + per-sample k_best ids to a batch.

    Cached selections can reference a larger combo table than this batch's
    (train loaders may carry fewer source views than the view-selection
    pass saw, e.g. under the view-count sampler); out-of-range ids clamp
    into this batch's table rather than indexing out of bounds.
    """
    n_views = np_batch["all_src_inps"].shape[1]
    n_input = int(cfg["enerf"].get("cost_volume_input_views", 3))
    combos = view_combinations(n_views, n_input)
    np_batch["combos"] = combos
    k_best = [
        view_selection[f"{m['scene']}_{m['tar_view']}"] for m in np_batch["meta"]
    ]
    np_batch["k_best"] = np.minimum(
        np.asarray(k_best, np.int32), len(combos) - 1
    )
    return np_batch


# ---------------------------------------------------------------------------
# evaluation
# ---------------------------------------------------------------------------

def run_evaluate(cfg, model=None, variables=None):
    from boostmvsnerfs_tpu.eval.evaluator import Evaluator

    cas = CascadeConfig.from_cfg(cfg["enerf"])
    model = model or make_network(cfg)
    dataset = make_dataset(cfg, "test")
    # multi-host eval shards target views across processes (the reference's
    # DistributedSampler semantics, lib/datasets/samplers.py:103-159)
    loader = Loader(
        dataset,
        batch_size=int(cfg["test"]["batch_size"]),
        num_processes=jax.process_count(),
        process_index=jax.process_index(),
    )

    boost = requires_view_selection(cfg)
    vs = None
    if boost:
        if not os.path.exists(view_selection_path(cfg)):
            vs_model = model
            if variables is None:
                variables = _init_or_load(cfg, model, dataset, boost)
            run_view_selection(cfg, vs_model, variables, [loader])
        vs = load_view_selection(cfg)

    if variables is None:
        variables = _init_or_load(cfg, model, dataset, boost)

    # per-scene sampler-window tuning on the first batch's cameras (the
    # bench's calibrated mode; a setup pass like view selection)
    if cfg.get("autotune_windows", True):
        first = next(iter(loader), None)
        if first is not None:
            fb = attach_boost_inputs(dict(first), vs, cfg) if boost else first
            model = autotune_model(cfg, model, fb, variables=variables)

    lpips_fn, lpips_key = _load_lpips(cfg)
    evaluator = Evaluator(
        cas,
        eval_lpips=bool(cfg.get("eval_lpips", False)),
        lpips_fn=lpips_fn,
        lpips_key=lpips_key,
        eval_depth=bool(cfg["enerf"].get("eval_depth", False)),
        eval_center=bool(cfg["enerf"].get("eval_center", False)),
        save_result=bool(cfg.get("save_result", False)),
        result_dir=cfg.get("result_dir"),
    )
    fwd = make_forward(cfg, model)

    mesh = None
    mesh_cfg = cfg.get("mesh", {})
    n_rays_axis = int(mesh_cfg.get("rays", 1)) if mesh_cfg else 1
    if n_rays_axis > 1:
        from boostmvsnerfs_tpu.parallel import mesh as mesh_lib

        mesh = mesh_lib.make_mesh(
            n_data=int(mesh_cfg.get("data", 1)), n_rays=n_rays_axis
        )

    from boostmvsnerfs_tpu.utils.profiling import device_trace

    net_times = []
    # cfg.profile_dir: write a jax.profiler device trace of the eval loop
    # (TPU-native equivalent of the reference's cuda-sync perf_timer,
    # lib/utils/net_utils.py:31-70)
    with device_trace(cfg.get("profile_dir")):
        for np_batch in loader:
            if boost:
                np_batch = attach_boost_inputs(np_batch, vs, cfg)
            batch = to_device_batch(np_batch)
            dev_batch = {k: v for k, v in batch.items() if k != "meta"}
            if mesh is not None:
                from boostmvsnerfs_tpu.parallel.mesh import shard_batch

                dev_batch = shard_batch(mesh, dev_batch)
            # land the batch on device BEFORE the network timer: the
            # reference's FPS likewise times the net forward after data
            # loading (reference run.py:112-129) — on the axon tunnel the
            # ~25MB image upload would otherwise dominate the timing
            dev_batch = {
                k: jax.block_until_ready(v) for k, v in dev_batch.items()
            }
            t0 = time.perf_counter()
            out = frame_sync(fwd(variables, dev_batch))
            net_times.append(time.perf_counter() - t0)
            evaluator.evaluate(
                {k: np.asarray(v) for k, v in out.items()}, np_batch
            )
    ret = evaluator.summarize()
    if len(net_times) > 1:
        fps = 1.0 / float(np.mean(net_times[1:]))
        print(f"FPS: {fps:.3f}")
        ret["fps"] = fps
    return ret


def autotune_model(cfg, model, np_batch, variables=None):
    """Per-scene sampler-window tuning before the eval loop (the bench's
    calibrated mode — utils/autotune.py): a one-time setup pass like the
    reference's view-selection preprocessing. Tunes on the first batch's
    cameras with a safety margin (``autotune_margin`` rows, default 4) for
    the scene's remaining target views; disable with
    ``autotune_windows: false``."""
    if not cfg.get("autotune_windows", True):
        return model
    margin = int(cfg.get("autotune_margin", 4))
    from boostmvsnerfs_tpu.models.enerf import ENeRF as _ENeRF
    from boostmvsnerfs_tpu.models.mvsnerf import MVSNeRF as _MVSNeRF

    batch = {k: np.asarray(v) for k, v in np_batch.items() if k != "meta"}
    if isinstance(model, _ENeRF):
        from boostmvsnerfs_tpu.utils.autotune import (
            tune_cascade_windows,
            tune_cascade_windows_calibrated,
        )

        if variables is not None and cfg.get("autotune_calibrate", True):
            cas = tune_cascade_windows_calibrated(
                batch, model.cas, variables, margin=margin
            )
        else:
            cas = tune_cascade_windows(batch, model.cas, margin=margin)
        return model.clone(cas=cas)
    if isinstance(model, _MVSNeRF):
        from boostmvsnerfs_tpu.utils.autotune import tune_mvsnerf_windows

        return model.clone(
            cfg=tune_mvsnerf_windows(batch, model.cfg, margin=margin)
        )
    return model


def make_forward(cfg, model):
    """Inference callable: staged per-stage jits for ENeRF-family models
    (fast compiles at full resolution), monolithic jit otherwise."""
    from boostmvsnerfs_tpu.models.enerf import ENeRF as _ENeRF

    if cfg.get("execution", "staged") == "staged" and isinstance(model, _ENeRF):
        from boostmvsnerfs_tpu.parallel.staged import StagedENeRF

        return StagedENeRF(model)
    from boostmvsnerfs_tpu.models.mvsnerf import MVSNeRF as _MVSNeRF

    if cfg.get("execution", "staged") == "staged" and isinstance(
        model, _MVSNeRF
    ):
        # row-block chunked executor: the monolithic mvsnerf forward
        # materializes ~20GB of per-sample features at real eval geometry
        from boostmvsnerfs_tpu.parallel.staged import StagedMVSNeRF

        return StagedMVSNeRF(model)
    return jax.jit(lambda v, b: model.apply(v, b, False))


def _lpips_available(cfg) -> bool:
    w = cfg.get("lpips_weights", {})
    return bool(w) and os.path.exists(w.get("vgg", "")) and os.path.exists(
        w.get("lin", "")
    )


def _load_lpips(cfg):
    """LPIPS metric fn + report key.

    With converted official weights (cfg.lpips_weights) the metric is the
    calibrated LPIPS of the reference evaluator
    (lib/evaluators/enerf.py:25,81-87). Without them (this container has no
    egress) the full pipeline still runs on deterministic fixture weights,
    reported as 'lpips_uncalibrated' so the numbers are never mistaken for
    published LPIPS.
    """
    if not cfg.get("eval_lpips", False):
        return None, "lpips"
    if _lpips_available(cfg):
        from boostmvsnerfs_tpu.eval.lpips import load_lpips

        w = cfg["lpips_weights"]
        return jax.jit(load_lpips(w["vgg"], w["lin"]).__call__), "lpips"
    from boostmvsnerfs_tpu.eval.lpips import fixture_lpips

    return jax.jit(fixture_lpips().__call__), "lpips_uncalibrated"


def _init_or_load(cfg, model, dataset, boost):
    """Initialize params (cheaply, on CPU at tiny spatial size — see
    utils/init_utils.py) and restore trained weights if available."""
    from boostmvsnerfs_tpu.train.checkpoint import CheckpointManager
    from boostmvsnerfs_tpu.utils.init_utils import init_variables

    np_batch = Loader(dataset, batch_size=1).__iter__().__next__()
    if boost:
        n_views = np_batch["all_src_inps"].shape[1]
        n_input = int(cfg["enerf"].get("cost_volume_input_views", 3))
        np_batch["combos"] = view_combinations(n_views, n_input)
        k = int(cfg["enerf"]["cas_config"]["k_best"])
        np_batch["k_best"] = np.zeros((1, k), np.int32)
    np_batch = {k: v for k, v in np_batch.items() if k != "meta"}
    variables = init_variables(model, np_batch)
    mgr = CheckpointManager(cfg["trained_model_dir"])
    restored = mgr.restore(variables)
    if restored is not None:
        variables = restored
        print(f"loaded weights from {mgr.latest_path()}")
    else:
        print("WARNING: no trained weights found; using random init")
    return variables


def render_novel_path(cfg, n_frames: int = 60, path_type: str = "interpolate"):
    """Render a novel camera trajectory (reference cfg.render_path flow):
    cameras interpolated/spiraled through the test views, source views chosen
    nearest per frame, frames written by the Visualizer."""
    from boostmvsnerfs_tpu.data.base import nearest_src_views
    from boostmvsnerfs_tpu.eval.visualizer import Visualizer
    from boostmvsnerfs_tpu.models.enerf import CascadeConfig
    from boostmvsnerfs_tpu.utils import camera_paths

    cas = CascadeConfig.from_cfg(cfg["enerf"])
    model = make_network(cfg)
    dataset = make_dataset(cfg, "test")
    boost = requires_view_selection(cfg)
    variables = _init_or_load(cfg, model, dataset, boost)
    fwd = make_forward(cfg, model)

    scene = next(iter(dataset.scene_infos))
    info = dataset.scene_infos[scene]
    c2ws = np.asarray(info["c2ws"])
    anchor_ids = sorted({m[1] for m in dataset.metas if m[0] == scene})
    anchors = c2ws[anchor_ids]
    if path_type == "spiral":
        path = camera_paths.spiral_path(anchors, n_frames)
    else:
        path = camera_paths.interpolate_path(anchors, n_frames)

    n_views = int(cfg["enerf"]["test_input_views"])
    vis = Visualizer(cas, cfg["result_dir"],
                     write_video=cfg.get("write_video", True),
                     fps=int(cfg.get("fps", 10)))
    base_sample = dataset.get_sample(0)
    H = base_sample["src_inps"].shape[1]
    W = base_sample["src_inps"].shape[2]

    mask_fn = None
    if boost:
        mask_fn = make_mask_fn(cfg, model)

    for fi, c2w in enumerate(path):
        order = nearest_src_views(c2ws, c2w, n_views, exclude_self=False)
        # reuse dataset plumbing: craft a meta on the fly
        dataset.metas = [(scene, int(order[0]), [int(i) for i in order])]
        s = dataset.get_sample(0)
        s["tar_ext"] = np.linalg.inv(c2w).astype(np.float32)
        np_batch = {k: (np.asarray(v)[None] if not isinstance(v, dict) else v)
                    for k, v in s.items() if k != "meta"}
        np_batch["meta"] = [s["meta"]]
        if boost:
            combos = view_combinations(n_views, int(
                cfg["enerf"].get("cost_volume_input_views", 3)))
            np_batch["combos"] = combos
            # novel path frames have no cached selection: run the greedy
            # coverage selection per frame with the same compiled combo
            # cascade as the offline preprocess (the paper's view selection,
            # reference lib/networks/boost_enerf/network.py:71-95)
            k = int(cfg["enerf"]["cas_config"]["k_best"])
            dev_sel = {
                k2: jnp.asarray(v) for k2, v in np_batch.items()
                if k2 != "meta"
            }
            np_batch["k_best"] = greedy_select(
                mask_fn, variables, dev_sel, jnp.asarray(combos), k
            )
        dev = {k: jnp.asarray(v) for k, v in np_batch.items() if k != "meta"}
        out = host_sync(fwd(variables, dev))
        np_batch["meta"][0].update({"scene": scene, "tar_view": fi})
        vis.visualize({k: np.asarray(v) for k, v in out.items()}, np_batch)
    vis.summarize()


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------

def run_train(cfg):
    from boostmvsnerfs_tpu.parallel.train import (
        TrainState,
        create_train_state,
        make_train_step,
    )
    from boostmvsnerfs_tpu.train.checkpoint import CheckpointManager, load_pretrain
    from boostmvsnerfs_tpu.train.recorder import Recorder
    from boostmvsnerfs_tpu.train.schedule import make_optimizer

    # numerical-guard parity: the reference leaves anomaly detection / NaN
    # traps enabled in places (lib/networks/mvsnerf/network.py:8,
    # lib/networks/enerf/network.py:110-111); the JAX analog is opt-in
    if cfg.get("debug_nans"):
        jax.config.update("jax_debug_nans", True)

    cas = CascadeConfig.from_cfg(cfg["enerf"])
    model = make_network(cfg)
    train_ds = make_dataset(cfg, "train")
    sampler_meta = cfg["train"].get("sampler_meta", {})
    loader = Loader(
        train_ds,
        batch_size=int(cfg["train"]["batch_size"]),
        shuffle=True,
        ep_iter=int(cfg.get("ep_iter", -1)),
        input_views_num=sampler_meta.get("input_views_num"),
        input_views_prob=sampler_meta.get("input_views_prob"),
        num_processes=jax.process_count(),
        process_index=jax.process_index(),
        num_workers=int(cfg["train"].get("num_workers", 4)),
        # per-batch random target resolution (reference 'image_size'
        # batch sampler, lib/datasets/samplers.py:38-75)
        image_size_meta=(
            dict(sampler_meta)
            if cfg["train"].get("batch_sampler") == "image_size"
            else None
        ),
    )
    ep_iter = len(loader)
    tx = make_optimizer(cfg["train"], ep_iter)

    boost = requires_view_selection(cfg)
    vs = None
    if boost:
        if not os.path.exists(view_selection_path(cfg)):
            ds_test = make_dataset(cfg, "test")
            tmp_vars = _init_or_load(cfg, model, ds_test, boost)
            run_view_selection(
                cfg, model, tmp_vars,
                [Loader(train_ds, 1), Loader(ds_test, 1)],
            )
        vs = load_view_selection(cfg)

    first = next(iter(Loader(train_ds, batch_size=int(cfg["train"]["batch_size"]))))
    if boost:
        first = attach_boost_inputs(first, vs, cfg)
    init_batch = {k: v for k, v in first.items() if k != "meta"}
    from boostmvsnerfs_tpu.utils.init_utils import init_variables

    state = create_train_state(
        model, tx, None, variables=init_variables(model, init_batch)
    )

    mgr = CheckpointManager(cfg["trained_model_dir"])
    recorder = Recorder(cfg.get("record_dir"), enabled=jax.process_index() == 0)
    begin_epoch = 0
    restored = mgr.restore(state) if cfg.get("resume", True) else None
    if restored is not None:
        state = restored
        begin_epoch = int(np.asarray(state.step)) // max(ep_iter, 1)
        print(f"resumed at epoch {begin_epoch}")
    elif cfg.get("pretrain"):
        pre_dir = os.path.join(
            cfg["workspace"], "trained_model", "pretrain", cfg["pretrain"]
        )
        pre = load_pretrain(pre_dir, {"params": state.params,
                                      "batch_stats": state.batch_stats})
        if pre is not None:
            state = state.replace(params=pre["params"],
                                  batch_stats=pre["batch_stats"])
            print(f"warm start from {pre_dir}")

    # VGG16 perceptual loss for full-image training (reference
    # lib/train/losses/enerf.py:30-38); active when converted torchvision
    # weights are provided (zero-egress container: convert offline)
    perceptual_fn, image_hw = None, None
    vgg_npz = cfg.get("vgg_weights", "")
    if vgg_npz and os.path.exists(vgg_npz) and any(cas.train_img[: cas.num]):
        from boostmvsnerfs_tpu.eval.vgg import load_vgg_params, perceptual_loss_fn

        perceptual_fn = perceptual_loss_fn(load_vgg_params(vgg_npz))
        H, W = first["src_inps"].shape[2:4]
        image_hw = tuple(
            (int(H * cas.render_scale[i]), int(W * cas.render_scale[i]))
            for i in range(cas.num)
        )
        print(f"perceptual loss enabled (VGG16 weights: {vgg_npz})")

    step_fn = make_train_step(
        model, tx, perceptual_fn=perceptual_fn, image_hw=image_hw
    )
    epochs = int(cfg["train"]["epoch"])
    log_interval = int(cfg.get("log_interval", 20))
    eval_ep = int(cfg.get("eval_ep", 0))
    for epoch in range(begin_epoch, epochs):
        loader.set_epoch(epoch)
        t_ep = time.time()
        for it, np_batch in enumerate(loader):
            if boost:
                np_batch = attach_boost_inputs(np_batch, vs, cfg)
            batch = {k: jnp.asarray(v) for k, v in np_batch.items() if k != "meta"}
            state, stats = step_fn(state, batch)
            recorder.step += 1
            if it % log_interval == 0:
                host_sync(stats)
                recorder.update({k: float(v) for k, v in stats.items()})
                recorder.record("train")
                print(f"epoch {epoch} iter {it}/{ep_iter} {recorder}", flush=True)
        if jax.process_index() == 0:
            save_ep = int(cfg.get("save_ep", 1))
            latest_ep = int(cfg.get("save_latest_ep", 1))
            if (epoch + 1) % save_ep == 0 or (epoch + 1) % latest_ep == 0:
                mgr.save(state, epoch, latest=True)
            # in-training validation (reference trainer.val, train_net.py:67-68)
            if eval_ep > 0 and (epoch + 1) % eval_ep == 0 and not cfg.get(
                "skip_eval", False
            ):
                try:
                    variables = {"params": state.params,
                                 "batch_stats": state.batch_stats}
                    ret = run_evaluate(cfg, model=model, variables=variables)
                    recorder.update({f"val_{k}": v for k, v in ret.items()
                                     if np.isscalar(v)})
                    recorder.record("val")
                except Exception as e:  # validation must not kill training
                    print(f"validation failed: {e}", flush=True)
        print(f"epoch {epoch} done in {time.time()-t_ep:.1f}s", flush=True)
    return state
