"""Cheap parameter initialization.

``model.init`` runs a full forward; at evaluation resolution that is a huge
program (and on the axon remote-compile backend a monolithic full-res
compile can take tens of minutes / stall the compile service). Convolutional
parameters are independent of spatial size, so init runs on CPU with a tiny
synthetic batch of the same structure.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from boostmvsnerfs_tpu.utils.synthetic import make_scene_batch


def init_variables(model, example_batch: dict | None = None, seed: int = 0):
    """Initialize model variables cheaply on CPU.

    If ``example_batch`` is given, a structurally identical tiny batch is
    derived from it (same key set / ranks / static axes); otherwise a
    default synthetic batch is built from the model config.
    """
    cpu = jax.devices("cpu")[0]
    small = _shrink_batch(model, example_batch)
    init_model = _cpu_init_model(model)
    with jax.default_device(cpu):
        small = {k: jnp.asarray(v) for k, v in small.items()}
        return init_model.init(jax.random.PRNGKey(seed), small, False)


def _cpu_init_model(model):
    """Clone with the XLA warp path: the Pallas kernel cannot lower for the
    CPU device init runs on, and the warp carries no parameters, so the
    clone's variables are identical."""
    import dataclasses

    cas = getattr(model, "cas", None)
    if cas is not None:
        repl = {}
        # init with every level rendered so the parameter tree is complete
        # regardless of eval-time render_if (the reference evaluates with
        # render_if [False, True] but its checkpoints hold both heads)
        if not all(cas.render_if[: cas.num]):
            repl["render_if"] = (True,) * len(cas.render_if)
        if getattr(cas, "warp_mode", None) == "pallas":
            repl["warp_mode"] = "windowed"
        if getattr(cas, "eval_sampling", None) == "pallas":
            repl["eval_sampling"] = "structured"
        if getattr(cas, "eval_head", None) == "pallas":
            repl["eval_head"] = "xla"
        if repl:
            return model.clone(cas=dataclasses.replace(cas, **repl))
        return model
    cfg = getattr(model, "cfg", None)
    if cfg is not None and getattr(cfg, "eval_sampling", None) == "pallas":
        return model.clone(cfg=dataclasses.replace(cfg, eval_sampling="gather"))
    return model


def _shrink_batch(model, example_batch):
    from boostmvsnerfs_tpu.models.enerf import ENeRF

    if isinstance(model, ENeRF):
        cas = model.cas
        boost = example_batch is not None and "all_src_inps" in example_batch \
            or hasattr(model, "combo_coverage_mask")
        n_views = (
            example_batch["all_src_inps"].shape[1]
            if example_batch is not None and "all_src_inps" in example_batch
            else (example_batch["src_inps"].shape[1] if example_batch else 3)
        )
        # smallest size compatible with the cascade's stride tree
        return make_scene_batch(
            B=1, n_views=n_views, H=64, W=96,
            render_scales=cas.render_scale[: cas.num],
            boost=boost, k_best=cas.k_best,
            input_views=cas.cost_volume_input_views, seed=0,
        )
    # MVSNeRF family
    cfg = model.cfg
    b = make_scene_batch(
        B=1,
        n_views=(
            example_batch["all_src_inps"].shape[1]
            if example_batch is not None and "all_src_inps" in example_batch
            else cfg.n_views
        ),
        H=64, W=96, render_scales=(1.0,), boost=True,
        k_best=cfg.k_best, input_views=cfg.cost_volume_input_views, seed=0,
    )
    import numpy as np

    n = b["all_src_inps"].shape[1]
    b["depth_ranges"] = np.tile(
        np.array([1.5, 5.0], np.float32), (1, n, 1)
    )
    return b
