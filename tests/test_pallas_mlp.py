"""Fused Pallas renderer MLP vs the flax module."""

import jax
import jax.numpy as jnp
import numpy as np

from boostmvsnerfs_tpu.models.mvsnerf import MVSNeRFConfig, RendererMLP
from boostmvsnerfs_tpu.ops.pallas.mlp import fused_renderer_mlp

INTERPRET = jax.devices()[0].platform != "tpu"


def _setup(rng, B=2, N=700):
    cfg = MVSNeRFConfig()
    mlp = RendererMLP(cfg)
    pts = jnp.asarray(rng.standard_normal((B, N, 63)), jnp.float32)
    feat = jnp.asarray(rng.standard_normal((B, N, 20)), jnp.float32)
    dirs = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    params = mlp.init(jax.random.PRNGKey(0), pts, feat, dirs)
    return cfg, mlp, params, pts, feat, dirs


def test_fused_mlp_matches_flax_f32(rng):
    cfg, mlp, params, pts, feat, dirs = _setup(rng)
    want = mlp.apply(params, pts, feat, dirs)
    got = fused_renderer_mlp(
        params, pts, feat, dirs, depth=cfg.mlp_depth, skips=cfg.skips,
        block=512, compute_dtype=jnp.float32, interpret=INTERPRET,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )


def test_fused_mlp_bf16_close(rng):
    cfg, mlp, params, pts, feat, dirs = _setup(rng)
    want = mlp.apply(params, pts, feat, dirs)
    got = fused_renderer_mlp(
        params, pts, feat, dirs, depth=cfg.mlp_depth, skips=cfg.skips,
        block=512, interpret=INTERPRET,
    )
    err = np.abs(np.asarray(got) - np.asarray(want))
    assert err.mean() < 0.02, err.mean()


def test_fused_mlp_encode_in_kernel_matches_host_encoding(rng):
    """encode_freqs: the in-kernel positional encoding (wide-op VMEM
    construction) must be bit-identical to encoding on the host and
    feeding the 63ch tensor in (models/mvsnerf.positional_encoding)."""
    from boostmvsnerfs_tpu.models.mvsnerf import positional_encoding

    cfg, mlp, params, _, feat, dirs = _setup(rng)
    B, N = feat.shape[:2]
    uvd = jnp.asarray(
        np.random.default_rng(3).uniform(0, 1, (B, N, 3)), jnp.float32
    )
    enc = positional_encoding(uvd, cfg.pos_freqs)
    want = fused_renderer_mlp(
        params, enc, feat, dirs, depth=cfg.mlp_depth, skips=cfg.skips,
        block=512, compute_dtype=jnp.float32, interpret=INTERPRET,
    )
    got = fused_renderer_mlp(
        params, uvd, feat, dirs, depth=cfg.mlp_depth, skips=cfg.skips,
        block=512, compute_dtype=jnp.float32, interpret=INTERPRET,
        encode_freqs=cfg.pos_freqs,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
