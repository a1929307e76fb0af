"""Multi-device tests on the 8-way virtual CPU mesh: sharded rendering
equivalence and the distributed train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boostmvsnerfs_tpu.models.enerf import CascadeConfig, ENeRF
from boostmvsnerfs_tpu.parallel import mesh as mesh_lib
from boostmvsnerfs_tpu.parallel.train import (
    create_train_state,
    make_eval_step,
    make_train_step,
    place,
)
from boostmvsnerfs_tpu.train.schedule import make_optimizer
from tests.helpers import make_batch

pytestmark = pytest.mark.slow

TEST_CAS = CascadeConfig(volume_planes=(16, 8), num_samples=(8, 2), warp_dtype="float32")


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    batch = {
        k: jnp.asarray(v)
        for k, v in make_batch(rng, full_image=False, num_rays=(64, 128)).items()
    }
    model = ENeRF(cas=TEST_CAS)
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    return model, variables, batch


def test_mesh_shapes():
    m = mesh_lib.make_mesh(n_data=2, n_rays=4, devices=jax.devices("cpu"))
    assert m.shape == {"data": 2, "rays": 4}
    m2 = mesh_lib.make_mesh(devices=jax.devices("cpu"))
    assert m2.shape == {"data": 1, "rays": 8}


def test_sharded_eval_matches_single_device(setup):
    model, variables, batch = setup
    eval_step = make_eval_step(model)
    want = eval_step(variables, batch)

    m = mesh_lib.make_mesh(devices=jax.devices("cpu"))
    sharded = mesh_lib.shard_batch(m, batch)
    got = eval_step(variables, sharded)
    np.testing.assert_allclose(
        np.asarray(got["rgb_level1"]), np.asarray(want["rgb_level1"]),
        rtol=1e-4, atol=1e-5,
    )


def test_train_step_decreases_loss(setup):
    model, variables, batch = setup
    tx = make_optimizer({"lr": 5e-4, "optim": "adam", "eps": 1e-8}, ep_iter=100)
    state = create_train_state(model, tx, batch)
    step = make_train_step(model, tx)
    losses = []
    for _ in range(3):
        state, stats = step(state, batch)
        losses.append(float(stats["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert int(state.step) == 3


@pytest.fixture(scope="module")
def boost_setup():
    """Flagship model: BoostENeRF with K=4 fused cost volumes, 6 views."""
    from boostmvsnerfs_tpu.models.boost_enerf import BoostENeRF
    from boostmvsnerfs_tpu.utils.synthetic import make_scene_batch

    np_batch = make_scene_batch(
        B=1, n_views=6, H=32, W=64, boost=True, k_best=4,
        with_targets=True, seed=11,
    )
    batch = {k: jnp.asarray(v) for k, v in np_batch.items()}
    model = BoostENeRF(
        cas=CascadeConfig(
            volume_planes=(16, 8), num_samples=(8, 2), k_best=4,
            warp_dtype="float32",
        )
    )
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    return model, variables, batch


def test_boost_sharded_eval_matches_single_device(boost_setup):
    """The fused K=4 boost render sharded over the rays axis must equal the
    single-device render (the paper-core model on a mesh, reference
    lib/networks/boost_enerf/network.py:189-222)."""
    model, variables, batch = boost_setup
    eval_step = make_eval_step(model)
    want = eval_step(variables, batch)

    m = mesh_lib.make_mesh(devices=jax.devices("cpu"))
    sharded = mesh_lib.shard_batch(m, batch)
    got = eval_step(variables, sharded)
    for k in ("rgb_level1", "depth_level1"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]),
            rtol=1e-4, atol=1e-5, err_msg=k,
        )


def test_boost_train_step_mesh_matches_single_device(boost_setup):
    """The mesh-pinned boost train step (make_train_step(mesh=...)) must
    match the unsharded step: loss and updated params."""
    model, _, batch = boost_setup
    tx = make_optimizer({"lr": 5e-4, "optim": "adam", "eps": 1e-8}, ep_iter=100)
    state = create_train_state(model, tx, batch)

    ref_step = make_train_step(model, tx)
    ref_state, ref_stats = ref_step(state, batch)

    m = mesh_lib.make_mesh(n_data=1, n_rays=8, devices=jax.devices("cpu"))
    state_s, batch_s = place(m, state, batch)
    step = make_train_step(model, tx, mesh=m)
    new_state, stats = step(state_s, batch_s)

    np.testing.assert_allclose(
        float(stats["loss"]), float(ref_stats["loss"]), rtol=1e-4
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(new_state.params),
        jax.tree_util.tree_leaves(ref_state.params),
    ):
        # atol = lr scale: GSPMD collectives reorder f32 reductions, and
        # adam normalizes tiny gradient noise up to a fraction of one step
        # (full-image training takes the structured sampling path, whose
        # sharded resize matmuls reduce in a different order)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-4
        )


def test_train_step_sharded_runs(setup):
    model, _, batch = setup
    tx = make_optimizer({"lr": 5e-4, "optim": "adam", "eps": 1e-8}, ep_iter=100)
    state = create_train_state(model, tx, batch)
    m = mesh_lib.make_mesh(n_data=1, n_rays=8, devices=jax.devices("cpu"))
    state_s, batch_s = place(m, state, batch)
    step = make_train_step(model, tx)
    new_state, stats = step(state_s, batch_s)
    assert np.isfinite(float(stats["loss"]))

    # sharded gradients must match the single-device step (SyncBN + psum parity)
    ref_state, ref_stats = step(state, batch)
    np.testing.assert_allclose(
        float(stats["loss"]), float(ref_stats["loss"]), rtol=1e-4
    )
    a = jax.tree_util.tree_leaves(new_state.params)[0]
    b = jax.tree_util.tree_leaves(ref_state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-6)


def test_syncbn_gspmd_global_stats():
    """SyncBN parity under GSPMD: BatchNorm batch statistics computed with
    the batch axis sharded over the mesh equal single-device statistics.

    The reference wraps networks in torch SyncBatchNorm under DDP
    (lib/train/trainers/trainer.py:15-22). Here no axis_name plumbing is
    needed in the jit train path: jnp reductions over a sharded batch are
    global by construction under GSPMD — this test pins that property
    (models expose bn_axis_name only for shard_map/pmap-style use)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from boostmvsnerfs_tpu.models.blocks import ConvBnReLU

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((8, 6, 6, 3)), jnp.float32)
    block = ConvBnReLU(4, (3, 3), (1, 1))
    variables = block.init(jax.random.PRNGKey(0), x, True)

    def step(v, xs):
        out, mut = block.apply(v, xs, True, mutable=["batch_stats"])
        return out, mut["batch_stats"]

    ref_out, ref_stats = jax.jit(step)(variables, x)

    m = mesh_lib.make_mesh(n_data=8, n_rays=1, devices=jax.devices("cpu"))
    xs = jax.device_put(x, NamedSharding(m, P("data")))
    vs = jax.device_put(variables, NamedSharding(m, P()))
    out, stats = jax.jit(step)(vs, xs)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(stats),
                    jax.tree_util.tree_leaves(ref_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_blocked_train_step_matches_plain(boost_setup):
    """Ray-blocked remat train step (make_blocked_train_step) must produce
    the same loss, gradients (via updated params), and BN stats as the
    plain step — the blocks only change WHEN activations exist, not the
    math. Checked for the flagship boost model and the plain ENeRF."""
    from boostmvsnerfs_tpu.parallel.train import make_blocked_train_step

    model, variables, batch = boost_setup
    tx = make_optimizer({"lr": 5e-4, "optim": "adam", "eps": 1e-8},
                        ep_iter=100)
    s0 = create_train_state(model, tx, batch, variables=variables)
    plain = make_train_step(model, tx)
    blocked = make_blocked_train_step(model, tx, ray_blocks=4)

    sp, stp = plain(s0, batch)
    sb, stb = blocked(s0, batch)
    np.testing.assert_allclose(
        float(stb["loss"]), float(stp["loss"]), rtol=1e-5
    )
    for (kp, lp), (kb, lb) in zip(
        jax.tree_util.tree_leaves_with_path(sp.params),
        jax.tree_util.tree_leaves_with_path(sb.params),
    ):
        np.testing.assert_allclose(
            np.asarray(lb), np.asarray(lp), rtol=2e-3, atol=2e-6,
            err_msg=str(kp),
        )
    for (kp, lp), (kb, lb) in zip(
        jax.tree_util.tree_leaves_with_path(sp.batch_stats),
        jax.tree_util.tree_leaves_with_path(sb.batch_stats),
    ):
        np.testing.assert_allclose(
            np.asarray(lb), np.asarray(lp), rtol=1e-4, atol=1e-6,
            err_msg=str(kp),
        )


def test_warp_plane_streaming_matches_plain(boost_setup):
    """Plane-block-streamed windowed-warp backward (warp_remat_planes)
    must not change the training math: same loss and updated params as
    the unstreamed step."""
    import dataclasses

    from boostmvsnerfs_tpu.models.boost_enerf import BoostENeRF

    model, variables, batch = boost_setup
    tx = make_optimizer({"lr": 5e-4, "optim": "adam", "eps": 1e-8},
                        ep_iter=100)
    s0 = create_train_state(model, tx, batch, variables=variables)
    want, stw = make_train_step(model, tx)(s0, batch)

    streamed = BoostENeRF(
        cas=dataclasses.replace(model.cas, warp_remat_planes=(2, 2))
    )
    got, stg = make_train_step(streamed, tx)(s0, batch)
    np.testing.assert_allclose(
        float(stg["loss"]), float(stw["loss"]), rtol=1e-6
    )
    for (kp, lw), (_, lg) in zip(
        jax.tree_util.tree_leaves_with_path(want.params),
        jax.tree_util.tree_leaves_with_path(got.params),
    ):
        np.testing.assert_allclose(
            np.asarray(lg), np.asarray(lw), rtol=2e-3, atol=2e-6,
            err_msg=str(kp),
        )
