"""Learning-rate schedules and optimizer construction (optax).

Mirrors the reference recipes:
* Adam with per-config lr/eps/weight_decay (reference lib/train/optimizer.py)
* exponential decay ``lr * gamma^(epoch / decay_epochs)`` stepped per epoch
  (reference lib/utils/optimizer/lr_scheduler.py:68-75) — the ENeRF recipe is
  gamma=0.5 / 50 epochs (configs/exps/pretrain/enerf/dtu_pretrain.yaml:68-71)
* multi-step decay at milestones
* gradient value clipping at 40 (reference lib/train/trainers/trainer.py:61
  ``clip_grad_value_(40)``)
"""

from __future__ import annotations

import optax


def make_lr_schedule(train_cfg: dict, ep_iter: int):
    """Schedule over *steps*; epoch = step // ep_iter (matching the
    reference's per-epoch scheduler.step())."""
    base = float(train_cfg["lr"])
    sched = train_cfg.get("scheduler", {"type": "exponential", "gamma": 0.5,
                                        "decay_epochs": 50})
    stype = sched.get("type", "exponential")
    gamma = float(sched.get("gamma", 0.5))
    if stype == "exponential":
        decay_epochs = float(sched.get("decay_epochs", 50))

        def schedule(step):
            epoch = step // max(ep_iter, 1)
            return base * gamma ** (epoch / decay_epochs)

        return schedule
    if stype == "multi_step":
        milestones = list(sched.get("milestones", []))

        def schedule(step):
            import jax.numpy as jnp

            epoch = step // max(ep_iter, 1)
            passed = sum(
                jnp.asarray(epoch >= m, jnp.float32) for m in milestones
            )
            return base * gamma**passed

        return schedule
    if stype == "warmup_multi_step":
        # reference lib/utils/optimizer/lr_scheduler.py:7-50
        # WarmupMultiStepLR: linear (or constant) warmup over warmup_iters
        # epochs into multi-step decay (bisect_right milestones semantics:
        # the decay applies from the milestone epoch onward)
        milestones = list(sched.get("milestones", []))
        warmup_factor = float(sched.get("warmup_factor", 1.0 / 3))
        warmup_iters = int(sched.get("warmup_iters", 5))
        warmup_method = sched.get("warmup_method", "linear")
        if warmup_method not in ("constant", "linear"):
            raise ValueError(f"unknown warmup_method: {warmup_method}")

        def schedule(step):
            import jax.numpy as jnp

            epoch = step // max(ep_iter, 1)
            if warmup_method == "constant":
                wf = jnp.where(epoch < warmup_iters, warmup_factor, 1.0)
            else:
                alpha = jnp.minimum(epoch / max(warmup_iters, 1), 1.0)
                wf = warmup_factor * (1.0 - alpha) + alpha
            passed = sum(
                jnp.asarray(epoch >= m, jnp.float32) for m in milestones
            )
            return base * wf * gamma**passed

        return schedule
    raise ValueError(f"unknown scheduler type: {stype}")


def make_optimizer(train_cfg: dict, ep_iter: int) -> optax.GradientTransformation:
    schedule = make_lr_schedule(train_cfg, ep_iter)
    opt_name = train_cfg.get("optim", "adam")
    eps = float(train_cfg.get("eps", 1e-8))
    wd = float(train_cfg.get("weight_decay", 0.0))
    if opt_name == "adam":
        base = (
            optax.adamw(schedule, eps=eps, weight_decay=wd)
            if wd > 0
            else optax.adam(schedule, eps=eps)
        )
    elif opt_name == "radam":
        # rectified Adam (reference lib/utils/optimizer/radam.py; threshold
        # rho >= 5 with SGD degeneration below, matching
        # degenerated_to_sgd=True); weight decay is the reference's
        # uncoupled lr*wd*param term via optax.add_decayed_weights
        base = optax.radam(schedule, eps=eps, threshold=5.0)
        if wd > 0:
            base = optax.chain(optax.add_decayed_weights(wd), base)
    elif opt_name == "sgd":
        base = optax.sgd(schedule, momentum=0.9)
    else:
        raise ValueError(f"unknown optimizer: {opt_name}")
    return optax.chain(optax.clip(40.0), base)
