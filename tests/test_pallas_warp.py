"""Fused Pallas warp-variance kernel vs the gather-based reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boostmvsnerfs_tpu.ops import cost_volume
from boostmvsnerfs_tpu.ops.pallas.warp_variance import (
    fused_warp_variance,
    fused_warp_variance_diff,
    warp_variance_bwd_fits,
    warp_variance_coverage,
)
from tests.test_windowed_warp import _setup

INTERPRET = jax.devices()[0].platform != "tpu"


def _batched_setup(rng, S=3, **kw):
    feats, pms, dvs = [], [], []
    for s in range(S):
        f, p, d = _setup(rng, **kw)
        feats.append(f)
        pms.append(p)
        dvs.append(d)
    return (
        jnp.stack(feats)[None],  # (1, S, Hs, Ws, C)
        jnp.stack(pms)[None],  # (1, S, 3, 4)
        dvs[0][None],  # (1, D, Ht, Wt)
    )


@pytest.mark.parametrize("row_block", [0, 4])
def test_fused_matches_variance_volume(rng, row_block):
    feats, pms, dv = _batched_setup(rng)
    want = jax.vmap(cost_volume.variance_volume)(feats, pms, dv)
    miss = warp_variance_coverage(feats.shape[2:], pms[0, 0], dv[0], 32)
    assert float(miss) == 0.0
    got = fused_warp_variance(
        feats, pms, dv, window_h=32, row_block=row_block,
        compute_dtype=jnp.float32, interpret=INTERPRET,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )


def test_fused_bf16_close(rng):
    feats, pms, dv = _batched_setup(rng)
    want = jax.vmap(cost_volume.variance_volume)(feats, pms, dv)
    got = fused_warp_variance(
        feats, pms, dv, window_h=32, compute_dtype=jnp.bfloat16,
        interpret=INTERPRET,
    )
    err = np.abs(np.asarray(got) - np.asarray(want))
    scale = np.abs(np.asarray(want)).mean() + 1e-3
    assert err.mean() / scale < 0.05


def test_fused_vjp_matches_windowed_grads(rng):
    """The custom-VJP (Pallas forward + Pallas backward) must match the
    gradients of the XLA windowed path w.r.t. both the source features and
    the depth hypotheses (the reference detaches only near_far, so depth
    gradients flow through the warp — lib/networks/enerf/utils.py:150)."""
    feats, pms, dv = _batched_setup(rng)
    # spatially-varying depth so the depth cotangent is non-trivial
    dv = dv * (1.0 + 0.01 * jnp.sin(jnp.arange(dv.size).reshape(dv.shape)))
    assert warp_variance_bwd_fits(*feats.shape[1:])
    ct = jnp.asarray(
        np.random.default_rng(5).standard_normal(
            (1,) + dv.shape[1:] + (feats.shape[-1],)
        ).astype(np.float32)
    )

    def loss_ref(f, d):
        v = jax.vmap(
            lambda a, b, c: cost_volume.variance_volume_windowed(
                a, b, c, window_h=32, window_w=48
            )
        )(f, pms, d)
        return jnp.sum(v * ct)

    def loss_pl(f, d):
        v = fused_warp_variance_diff(f, pms, d, 32, jnp.float32, INTERPRET)
        return jnp.sum(v * ct)

    np.testing.assert_allclose(
        float(loss_pl(feats, dv)), float(loss_ref(feats, dv)), rtol=1e-4
    )
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(feats, dv)
    g_pl = jax.grad(loss_pl, argnums=(0, 1))(feats, dv)
    for a, b, name in [
        (g_ref[0], g_pl[0], "d_src_feats"),
        (g_ref[1], g_pl[1], "d_depth_values"),
    ]:
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-6
        np.testing.assert_allclose(
            b / scale, a / scale, atol=2e-5, err_msg=name
        )


def test_fused_handles_out_of_image(rng):
    """Shifted camera pushes many taps out of the source image; zeros
    padding must match the gather path."""
    feats, pms, dv = _batched_setup(rng)
    pms = pms.at[:, :, 0, 3].add(40.0)  # large x shift
    want = jax.vmap(cost_volume.variance_volume)(feats, pms, dv)
    miss = warp_variance_coverage(feats.shape[2:], pms[0, 0], dv[0], 32)
    assert float(miss) == 0.0
    got = fused_warp_variance(
        feats, pms, dv, window_h=32, compute_dtype=jnp.float32,
        interpret=INTERPRET,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )
