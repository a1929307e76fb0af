"""Optimizer/scheduler parity: RAdam against the reference's own radam.py,
and the WarmupMultiStepLR schedule against its bisect semantics
(reference lib/utils/optimizer/{radam.py, lr_scheduler.py:7-50})."""

import importlib.util

import jax.numpy as jnp
import numpy as np
import torch

from boostmvsnerfs_tpu.train.schedule import make_lr_schedule, make_optimizer


def _load_ref_radam():
    spec = importlib.util.spec_from_file_location(
        "ref_radam", "/root/reference/lib/utils/optimizer/radam.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.RAdam


def test_radam_matches_reference(rng):
    RefRAdam = _load_ref_radam()
    lr = 5e-4
    w0 = rng.normal(0, 1, (4, 3)).astype(np.float32)
    grads = [rng.normal(0, 1, (4, 3)).astype(np.float32) for _ in range(12)]

    p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = RefRAdam([p], lr=lr, eps=1e-8)
    for g in grads:
        p.grad = torch.from_numpy(g.copy())
        opt.step()
    want = p.detach().numpy()

    tx = make_optimizer(
        {"lr": lr, "optim": "radam", "eps": 1e-8,
         # constant lr: decay far beyond the 12 steps
         "scheduler": {"type": "multi_step", "milestones": [10**6],
                       "gamma": 0.5}},
        ep_iter=1,
    )
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = {"w": params["w"] + updates["w"]}
    got = np.asarray(params["w"])
    # the only semantic difference is eps placement (reference adds eps to
    # sqrt(nu) pre-bias-correction); negligible at eps=1e-8
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_radam_early_steps_degenerate_to_sgd(rng):
    """rho < 5 during the first steps: both implementations take
    bias-corrected momentum SGD steps."""
    RefRAdam = _load_ref_radam()
    lr = 1e-3
    w0 = rng.normal(0, 1, (8,)).astype(np.float32)
    g = rng.normal(0, 1, (8,)).astype(np.float32)

    p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = RefRAdam([p], lr=lr, eps=1e-8)
    p.grad = torch.from_numpy(g.copy())
    opt.step()
    want = p.detach().numpy()

    tx = make_optimizer(
        {"lr": lr, "optim": "radam", "eps": 1e-8,
         "scheduler": {"type": "multi_step", "milestones": [10**6],
                       "gamma": 0.5}},
        ep_iter=1,
    )
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
    got = np.asarray(params["w"] + updates["w"])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_warmup_multi_step_schedule():
    base = 1e-2
    sched = make_lr_schedule(
        {"lr": base,
         "scheduler": {"type": "warmup_multi_step", "gamma": 0.1,
                       "milestones": [8, 11], "warmup_factor": 1.0 / 3,
                       "warmup_iters": 5, "warmup_method": "linear"}},
        ep_iter=1,
    )

    # reference get_lr: base * warmup * gamma^bisect_right(milestones, epoch)
    from bisect import bisect_right

    for epoch in range(14):
        wf = 1.0
        if epoch < 5:
            alpha = epoch / 5
            wf = (1.0 / 3) * (1 - alpha) + alpha
        want = base * wf * 0.1 ** bisect_right([8, 11], epoch)
        got = float(sched(jnp.asarray(epoch)))
        np.testing.assert_allclose(got, want, rtol=1e-6, err_msg=f"ep{epoch}")


def test_warmup_constant_method():
    sched = make_lr_schedule(
        {"lr": 1.0,
         "scheduler": {"type": "warmup_multi_step", "gamma": 0.5,
                       "milestones": [100], "warmup_factor": 0.25,
                       "warmup_iters": 3, "warmup_method": "constant"}},
        ep_iter=2,
    )
    # ep_iter=2: steps 0..5 are epochs 0..2 (warmup), step 6 is epoch 3
    assert float(sched(jnp.asarray(0))) == 0.25
    assert float(sched(jnp.asarray(5))) == 0.25
    assert float(sched(jnp.asarray(6))) == 1.0
