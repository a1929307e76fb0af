"""MVSNeRF attention renderer variants vs the ACTUAL reference modules
(lib/networks/mvsnerf/network.py:77-148 MultiHeadAttention, :391-469
Renderer_attention, :231-311 Renderer_color_fusion), with ported weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from boostmvsnerfs_tpu.models.mvsnerf import (  # noqa: E402
    MVSNeRFConfig,
    MultiHeadAttention,
    RendererAttention,
    RendererColorFusion,
)
from tests.ref_loader import load_reference_mvsnerf  # noqa: E402

pytestmark = pytest.mark.slow


def _t2j(t):
    return jnp.asarray(t.detach().numpy())


def _dense(sd, name):
    p = {"kernel": _t2j(sd[f"{name}.weight"]).T}
    if f"{name}.bias" in sd:
        p["bias"] = _t2j(sd[f"{name}.bias"])
    return p


def _mha_params(sd, prefix):
    return {
        "w_qs": _dense(sd, f"{prefix}.w_qs"),
        "w_ks": _dense(sd, f"{prefix}.w_ks"),
        "w_vs": _dense(sd, f"{prefix}.w_vs"),
        "fc": _dense(sd, f"{prefix}.fc"),
        "layer_norm": {
            "scale": _t2j(sd[f"{prefix}.layer_norm.weight"]),
            "bias": _t2j(sd[f"{prefix}.layer_norm.bias"]),
        },
    }


def test_multi_head_attention_matches_reference(rng):
    ref = load_reference_mvsnerf()
    torch.manual_seed(0)
    ref_mha = ref.mvsnerf_network.MultiHeadAttention(4, 12, 4, 4)
    ref_mha.eval()

    x = rng.standard_normal((8, 3, 12)).astype(np.float32)
    mask = (rng.uniform(size=(8, 3, 1)) > 0.3).astype(np.float32)
    with torch.no_grad():
        want, _ = ref_mha(
            torch.from_numpy(x), torch.from_numpy(x), torch.from_numpy(x),
            mask=torch.from_numpy(mask),
        )

    mha = MultiHeadAttention(4, 12, 4, 4)
    sd = {f"m.{k}": v for k, v in ref_mha.state_dict().items()}
    params = {"params": _mha_params(sd, "m")}
    got, _ = mha.apply(
        params, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x),
        jnp.asarray(mask),
    )
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5
    )


def _renderer_inputs(rng, n_ray=16, n_samp=4, pts_ch=63, v=3):
    pts = rng.standard_normal((n_ray, n_samp, pts_ch)).astype(np.float32)
    feat = rng.standard_normal((n_ray, n_samp, 8 + 4 * v)).astype(np.float32)
    # per-view mask channel in {0, 1} like build_color_volume's in-mask
    feat4 = feat[..., 8:].reshape(n_ray, n_samp, v, 4)
    feat4[..., 3] = (rng.uniform(size=(n_ray, n_samp, v)) > 0.3).astype(
        np.float32
    )
    feat[..., 8:] = feat4.reshape(n_ray, n_samp, 4 * v)
    views = rng.standard_normal((n_ray, n_samp, 3)).astype(np.float32)
    return pts, feat, views


def test_renderer_attention_matches_reference(rng):
    """net_type='v1': view-attention color fusion + additive-bias trunk.
    The reference ties pts_linears 1..D-1 to ONE module ([m]*(D-1),
    network.py:442); porting copies the shared tensor into each pts_{i}."""
    ref = load_reference_mvsnerf()
    torch.manual_seed(1)
    D, W = 6, 128
    ref_r = ref.mvsnerf_network.Renderer_attention(
        D=D, W=W, input_ch=63, input_ch_views=3, output_ch=4,
        input_ch_feat=20, skips=[4], use_viewdirs=True,
    )
    ref_r.eval()

    pts, feat, views = _renderer_inputs(rng)
    with torch.no_grad():
        want = ref_r(
            torch.from_numpy(np.concatenate([pts, feat, views], -1))
        ).numpy()

    sd = ref_r.state_dict()
    params = {
        "color_attention": _mha_params(sd, "color_attention"),
        "weight_out": _dense(sd, "weight_out"),
        "pts_bias": _dense(sd, "pts_bias"),
        "alpha": _dense(sd, "alpha_linear"),
        "feature": _dense(sd, "feature_linear"),
        "views_0": _dense(sd, "views_linears.0"),
        "rgb": _dense(sd, "rgb_linear"),
    }
    for i in range(D):
        params[f"pts_{i}"] = _dense(sd, f"pts_linears.{i}")

    cfg = MVSNeRFConfig(mlp_depth=D, mlp_width=W, net_type="v1")
    got = RendererAttention(cfg).apply(
        {"params": params},
        jnp.asarray(pts.reshape(1, -1, 63)),
        jnp.asarray(feat.reshape(1, -1, 20)),
        jnp.asarray(views.reshape(1, -1, 3)),
    )
    np.testing.assert_allclose(
        np.asarray(got)[0].reshape(want.shape[0], want.shape[1], 4),
        want[..., :4],  # reference appends its fused colors twice; its
        rtol=1e-4, atol=1e-5,  # compositing reads raw[..., :4] only
    )


def test_renderer_color_fusion_matches_reference(rng):
    ref = load_reference_mvsnerf()
    torch.manual_seed(2)
    D, W = 6, 128
    ref_r = ref.mvsnerf_network.Renderer_color_fusion(
        D=D, W=W, input_ch=63, input_ch_views=3, output_ch=4,
        input_ch_feat=20, skips=[4], use_viewdirs=True,
    )
    ref_r.eval()

    pts, feat, views = _renderer_inputs(rng)
    with torch.no_grad():
        want = ref_r(
            torch.from_numpy(np.concatenate([pts, feat, views], -1))
        ).numpy()

    sd = ref_r.state_dict()
    params = {
        "ray_attention": _mha_params(sd, "ray_attention"),
        "pts_bias": _dense(sd, "pts_bias"),
        "alpha": _dense(sd, "alpha_linear.0"),
        "feature": _dense(sd, "feature_linear.0"),
        "rgb_out": _dense(sd, "rgb_out.0"),
    }
    for i in range(D):
        params[f"pts_{i}"] = _dense(sd, f"pts_linears.{i}")

    cfg = MVSNeRFConfig(
        mlp_depth=D, mlp_width=W, net_type="color_fusion"
    )
    got = RendererColorFusion(cfg).apply(
        {"params": params},
        jnp.asarray(pts.reshape(1, -1, 63)),
        jnp.asarray(feat.reshape(1, -1, 20)),
        jnp.asarray(views.reshape(1, -1, 3)),
    )
    np.testing.assert_allclose(
        np.asarray(got)[0].reshape(want.shape[0], want.shape[1], 4),
        want[..., :4], rtol=1e-4, atol=1e-5,
    )


def test_renderer_linear_matches_reference(rng):
    """net_type='v2' (Renderer_linear, reference network.py:471-544):
    Renderer_ours trunk + skips but with an ADDITIVE pts_bias."""
    from boostmvsnerfs_tpu.models.mvsnerf import RendererMLP

    ref = load_reference_mvsnerf()
    torch.manual_seed(3)
    D, W = 6, 128
    ref_r = ref.mvsnerf_network.Renderer_linear(
        D=D, W=W, input_ch=63, input_ch_views=3, output_ch=4,
        input_ch_feat=20, skips=[4], use_viewdirs=True,
    )
    ref_r.eval()

    pts, feat, views = _renderer_inputs(rng)
    with torch.no_grad():
        want = ref_r(
            torch.from_numpy(np.concatenate([pts, feat, views], -1))
        ).numpy()

    sd = ref_r.state_dict()
    params = {
        "pts_bias": _dense(sd, "pts_bias"),
        "alpha": _dense(sd, "alpha_linear"),
        "feature": _dense(sd, "feature_linear"),
        "views_0": _dense(sd, "views_linears.0"),
        "rgb": _dense(sd, "rgb_linear"),
    }
    for i in range(D):
        params[f"pts_{i}"] = _dense(sd, f"pts_linears.{i}")

    cfg = MVSNeRFConfig(mlp_depth=D, mlp_width=W, net_type="v2")
    got = RendererMLP(cfg, additive_bias=True).apply(
        {"params": params},
        jnp.asarray(pts.reshape(1, -1, 63)),
        jnp.asarray(feat.reshape(1, -1, 20)),
        jnp.asarray(views.reshape(1, -1, 3)),
    )
    np.testing.assert_allclose(
        np.asarray(got)[0].reshape(want.shape[0], want.shape[1], 4),
        want, rtol=1e-4, atol=1e-5,
    )


def test_mvsnerf_net_type_variants_forward(rng):
    """The full MVSNeRF model runs end to end with each renderer head."""
    import dataclasses

    from tests.test_mvsnerf import _mvs_batch  # reuse the synthetic batch

    batch = _mvs_batch(rng)
    from boostmvsnerfs_tpu.models.mvsnerf import MVSNeRF

    for net_type in ("v1", "v2", "color_fusion"):
        cfg = dataclasses.replace(
            MVSNeRFConfig(
                num_samples=8, eval_sampling="gather", net_type=net_type
            ),
        )
        model = MVSNeRF(cfg=cfg)
        variables = model.init(jax.random.PRNGKey(0), batch, False)
        out = model.apply(variables, batch, False)
        rgb = np.asarray(out["rgb_level0"])
        assert np.isfinite(rgb).all(), net_type
