"""Aux network variants: composite fg/bg layered rendering, masked human
variant, interp-upsample CostRegNet, image-feature-only head, ResUNet
(reference lib/networks/enerf/{network_composite,network_human,nerf_,
cost_reg_net_,res_unet}.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from boostmvsnerfs_tpu.models.enerf import CascadeConfig, ENeRF
from boostmvsnerfs_tpu.models.variants import (
    CompositeENeRF,
    HumanENeRF,
    composite_outputs,
)
from boostmvsnerfs_tpu.utils.synthetic import make_scene_batch

import pytest

pytestmark = pytest.mark.slow

CAS = CascadeConfig(
    depth_inv=(True, False),
    volume_planes=(16, 8),
    num_samples=(4, 2),
    warp_mode="windowed",
    eval_sampling="structured",
)


def _batch(rng, H=64, W=64, n_views=3, L=1):
    np_batch = make_scene_batch(B=1, n_views=n_views, H=H, W=W, seed=3)
    batch = {k: jnp.asarray(v) for k, v in np_batch.items()}
    nf = np.asarray(np_batch["near_far"])  # (B, 2)
    # per-layer near/far (L fg layers + bg): narrow fg bands inside bg
    layers = [nf * np.array([1.2, 0.8]) for _ in range(L)] + [nf]
    batch["near_far"] = jnp.asarray(np.stack(layers, 1), jnp.float32)
    # crop origins quantized to 8 (1/min(volume_scale)) per the module doc
    batch["bbox"] = jnp.asarray(
        np.tile(np.array([[8, 8]], np.int32), (1, L, 1)).reshape(1, L, 2)
    )
    return batch


def test_composite_forward_shapes(rng):
    batch = _batch(rng)
    model = CompositeENeRF(cas=CAS, num_fg_layers=1, fg_hw=(32, 32))
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    out = jax.jit(lambda v, b: model.apply(v, b, False))(variables, batch)
    H, W = 64, 64
    for i, r_s in enumerate(CAS.render_scale):
        rgb = np.asarray(out[f"rgb_level{i}"])
        assert rgb.shape == (1, int(H * r_s) * int(W * r_s), 3)
        assert np.isfinite(rgb).all()
        depth = np.asarray(out[f"depth_level{i}"])
        assert np.isfinite(depth).all()


def test_composite_two_layers_and_grads(rng):
    batch = _batch(rng, L=2)
    model = CompositeENeRF(cas=CAS, num_fg_layers=2, fg_hw=(32, 32))
    variables = model.init(jax.random.PRNGKey(1), batch, False)
    out = model.apply(variables, batch, False)
    assert np.isfinite(np.asarray(out["rgb_level1"])).all()

    # the merged integral is differentiable end to end (fine-tuning path)
    def loss(params):
        o = model.apply(
            {**variables, "params": params}, batch, True,
            mutable=["batch_stats"],
        )[0]
        return jnp.mean(o["rgb_level1"] ** 2)

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # fg layer-1 parameters receive gradient (both layers render)
    flat = {
        "/".join(str(p) for p in path): np.abs(np.asarray(v)).sum()
        for path, v in jax.tree_util.tree_leaves_with_path(g)
    }
    assert any("fg_1" in k and s > 0 for k, s in flat.items())


def test_composite_outputs_zero_fg_equals_bg_only(rng):
    """A fg layer with zero sigma contributes nothing: the merged render
    equals compositing the bg alone (alpha=0 samples are transparent)."""
    from boostmvsnerfs_tpu.ops.render import composite as plain_composite

    B, n, Ns = 1, 6 * 8, 3
    bg_raw = jnp.asarray(
        np.random.default_rng(0).uniform(0.1, 1.0, (B, n, Ns, 4)), jnp.float32
    )
    bg_z = jnp.broadcast_to(
        jnp.linspace(2.0, 3.0, Ns)[None, None], (B, n, Ns)
    )
    fg = {
        "net_output": jnp.zeros((B, 2 * 4, 2, 4)),
        "z_vals": jnp.ones((B, 2 * 4, 2)),
    }
    out = composite_outputs(
        [fg], {"net_output": bg_raw, "z_vals": bg_z},
        jnp.zeros((B, 1, 2), jnp.int32), (2, 4), (6, 8),
    )
    want = plain_composite(bg_raw, bg_z, softmax_depth=False)
    np.testing.assert_allclose(
        np.asarray(out["rgb"]), np.asarray(want["rgb"]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out["depth"]), np.asarray(want["depth"]), atol=1e-6
    )


def test_human_mask_at_box(rng):
    np_batch = make_scene_batch(B=1, n_views=3, H=32, W=64, seed=5)
    batch = {k: jnp.asarray(v) for k, v in np_batch.items()}
    model = HumanENeRF(cas=CAS)
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    base = model.apply(variables, batch, False)

    mask = np.zeros((1, 32, 64), np.float32)
    mask[:, 8:20, 10:40] = 1.0
    batch["mask_at_box"] = jnp.asarray(mask)
    out = model.apply(variables, batch, False)
    rgb = np.asarray(out["rgb_level1"]).reshape(32, 64, 3)
    ref = np.asarray(base["rgb_level1"]).reshape(32, 64, 3)
    assert np.abs(rgb[0, 0]).max() == 0.0  # outside mask -> zero
    np.testing.assert_allclose(rgb[10, 20], ref[10, 20], atol=1e-6)
    # level-0 output is untouched
    np.testing.assert_allclose(
        np.asarray(out["rgb_level0"]), np.asarray(base["rgb_level0"]),
        atol=1e-6,
    )


def test_interp_upsample_cost_reg(rng):
    from boostmvsnerfs_tpu.models.cost_reg_net import CostRegNet

    x = jnp.asarray(rng.standard_normal((1, 8, 16, 16, 8)), jnp.float32)
    net = CostRegNet(interp_upsample=True)
    variables = net.init(jax.random.PRNGKey(0), x, False)
    feat, logits = net.apply(variables, x, False)
    assert feat.shape == (1, 8, 16, 16, 8)
    assert logits.shape == (1, 8, 16, 16)
    assert np.isfinite(np.asarray(feat)).all()


def test_resize_trilinear_matches_torch():
    import pytest

    torch = pytest.importorskip("torch")
    from boostmvsnerfs_tpu.ops.sampling import resize_trilinear

    rng = np.random.default_rng(0)
    vol = rng.standard_normal((1, 4, 6, 5, 3)).astype(np.float32)
    got = np.asarray(resize_trilinear(jnp.asarray(vol), 8, 12, 10))
    t = torch.from_numpy(vol).permute(0, 4, 1, 2, 3)  # NCDHW
    want = torch.nn.functional.interpolate(
        t, size=(8, 12, 10), mode="trilinear", align_corners=True
    ).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_no_vox_feat_head(rng):
    from boostmvsnerfs_tpu.models.nerf_head import NeRFHead

    vox = jnp.asarray(rng.standard_normal((2, 5, 8)), jnp.float32)
    img = jnp.asarray(rng.standard_normal((2, 5, 3, 35 + 4)), jnp.float32)
    head = NeRFHead(feat_ch=35, use_vox_feat=False)
    variables = head.init(jax.random.PRNGKey(0), vox, img)
    # lr0 consumes only the 16-dim aggregated image feature
    # (reference nerf_.py:13)
    assert variables["params"]["lr0"]["kernel"].shape[0] == 16
    out = head.apply(variables, vox, img)
    assert out.shape == (2, 5, 4)
    # vox features are ignored entirely
    out2 = head.apply(variables, vox * 100.0, img)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))


def test_res_unet(rng):
    from boostmvsnerfs_tpu.models.feature_net import ResUNet

    x = jnp.asarray(rng.standard_normal((2, 32, 48, 3)), jnp.float32)
    net = ResUNet()
    variables = net.init(jax.random.PRNGKey(0), x, False)
    out = net.apply(variables, x, False)
    assert out["level_0"].shape == (2, 8, 12, 32)
    assert np.isfinite(np.asarray(out["level_0"])).all()


def test_human_train_smoke_mask_patch_sampling(rng):
    """HumanENeRF fine-tune smoke with the ZJU-MoCap-style ray recipe:
    foreground-weighted + patch ray sampling (reference
    lib/datasets/enerf_utils.py:5-51, cfg.enerf.sample_on_mask /
    num_patchs) feeding one gradient step."""
    import optax

    from boostmvsnerfs_tpu.data.base import sample_train_pixels
    from boostmvsnerfs_tpu.parallel.train import (
        create_train_state,
        make_train_step,
    )

    H, W = 32, 64
    cas = dataclasses.replace(
        CAS,
        train_img=(False, False),
        num_rays=(32, 64),
        num_patchs=(0, 2),
        patch_size=(-1, 4),
        sample_on_mask=True,
    )
    np_batch = make_scene_batch(B=1, n_views=3, H=H, W=W, seed=7)
    msk = np.zeros((H, W), bool)
    msk[8:20, 10:40] = True
    srng = np.random.default_rng(11)
    for i, scale in enumerate((0.25, 1.0)):
        H_r, W_r = int(H * scale), int(W * scale)
        msk_i = msk[:: int(1 / scale) or 1, :: int(1 / scale) or 1][
            :H_r, :W_r
        ]
        idx = sample_train_pixels(
            srng, H_r, W_r, cas.num_rays[i], msk_i,
            sample_on_mask=cas.sample_on_mask,
            num_patchs=cas.num_patchs[i], patch_size=cas.patch_size[i],
        )
        np_batch[f"ray_idx_{i}"] = idx[None]
        np_batch[f"rgb_{i}"] = np.random.default_rng(13).uniform(
            0, 1, (1, idx.shape[0], 3)
        ).astype(np.float32)
    batch = {k: jnp.asarray(v) for k, v in np_batch.items()}
    assert batch["ray_idx_1"].shape[1] == 64 + 2 * 16

    model = HumanENeRF(cas=cas)
    tx = optax.adam(1e-4)
    state = create_train_state(model, tx, batch)
    step = make_train_step(model, tx)
    state, stats = step(state, batch)
    assert np.isfinite(float(stats["loss"]))
    assert int(state.step) == 1
