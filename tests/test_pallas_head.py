"""Fused Pallas ENeRF head vs the flax path (interpret mode on CPU).

The fused head consumes the rows layout (channels in sublanes, samples in
lanes): feat (B, S, R, Cp, T) with true channels feat_ch zero-padded to Cp,
dirs (B, S, R, 4, T), vox (B, R, 8, T); it returns (B, R, 4, T).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boostmvsnerfs_tpu.models.nerf_head import NeRFHead


def _mk(feat_ch, S=3, B=2, R=3, T=40, Cp=None, seed=0, **kw):
    rng = np.random.default_rng(seed)
    Cp = Cp or feat_ch
    head = NeRFHead(feat_ch=feat_ch, **kw)
    vox_rows = jnp.asarray(rng.standard_normal((B, R, 8, T)), jnp.float32)
    feat_rows = np.zeros((B, S, R, Cp, T), np.float32)
    feat_rows[:, :, :, :feat_ch] = rng.standard_normal((B, S, R, feat_ch, T))
    feat_rows = jnp.asarray(feat_rows)
    dirs_rows = jnp.asarray(rng.standard_normal((B, S, R, 4, T)), jnp.float32)

    # flax-layout equivalents: (B, N=R*T, 1, ...) with samples flattened
    def flat(rows, C):  # (B, S, R, C, T) -> (B, R*T, S, C)
        return jnp.moveaxis(rows, (1, 4), (3, 2)).reshape(B, R * T, S, C)

    ifrd = jnp.concatenate(
        [flat(feat_rows[:, :, :, :feat_ch], feat_ch), flat(dirs_rows, 4)],
        axis=-1,
    )
    vox = jnp.moveaxis(vox_rows, 2, 3).reshape(B, R * T, 8)
    variables = head.init(jax.random.PRNGKey(seed), vox, ifrd)
    return head, variables, vox_rows, feat_rows, dirs_rows, vox, ifrd


def _run(head, variables, vox_rows, feat_rows, dirs_rows, **kw):
    out = head.apply(
        variables, vox_rows, feat_rows, dirs_rows, interpret=True,
        method=NeRFHead.fused, **kw,
    )  # (B, R, 4, T)
    B, R, _, T = out.shape
    return jnp.moveaxis(out, 2, 3).reshape(B, R * T, 4)


@pytest.mark.parametrize("feat_ch,Cp", [(19, 20), (35, 36)])
def test_fused_head_matches_flax(feat_ch, Cp):
    head, variables, vr, fr, dr, vox, ifrd = _mk(feat_ch, Cp=Cp)
    ref = head.apply(variables, vox, ifrd)
    out = _run(head, variables, vr, fr, dr)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_head_no_vox():
    head, variables, vr, fr, dr, vox, ifrd = _mk(
        35, use_vox_feat=False, seed=1
    )
    ref = head.apply(variables, vox, ifrd)
    out = _run(head, variables, None, fr, dr)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_head_no_viewdir():
    head, variables, vr, fr, dr, vox, ifrd = _mk(
        11, viewdir_agg=False, seed=2
    )
    ref = head.apply(variables, vox, ifrd)
    out = _run(head, variables, vr, fr, dr)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_head_row_blocks():
    """R not a multiple of row_block exercises the auto-shrink."""
    head, variables, vr, fr, dr, vox, ifrd = _mk(19, R=5, seed=3)
    ref = head.apply(variables, vox, ifrd)
    out = _run(head, variables, vr, fr, dr, row_block=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
