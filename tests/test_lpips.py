"""LPIPS numeric parity against a torch oracle built from the SAME weights.

The lpips package itself is not installed in this container (and the
official pretrained weights cannot be fetched — no egress), so the oracle
reconstructs the lpips-VGG computation with torch ops exactly as the
package defines it (scaling layer -> VGG16 relu1_2..relu5_3 -> channel
unit-normalization -> squared diff -> non-negative 1x1 heads -> spatial
mean -> sum over layers; lpips/lpips.py + lpips/pretrained_networks.py),
sharing weights with our JAX implementation. This pins conv padding,
maxpool, normalization, and head semantics; calibrated values additionally
need the converted official weights (eval/lpips.py convert_lpips_weights).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from boostmvsnerfs_tpu.eval.lpips import _SCALE, _SHIFT, fixture_lpips
from boostmvsnerfs_tpu.eval.vgg import SLICE_ENDS, VGG16_CFG


def _torch_vgg_feats(x, params):
    """x: (B, 3, H, W); params: flax param dict {conv{i}: {kernel, bias}}."""
    outs = []
    conv_i = 0
    for v in VGG16_CFG:
        if v == "M":
            x = F.max_pool2d(x, 2, 2)
        else:
            w = torch.from_numpy(
                np.asarray(params[f"conv{conv_i}"]["kernel"])
            ).permute(3, 2, 0, 1)  # HWIO -> OIHW
            b = torch.from_numpy(np.asarray(params[f"conv{conv_i}"]["bias"]))
            x = F.relu(F.conv2d(x, w, b, padding=1))
            conv_i += 1
            if conv_i in SLICE_ENDS:
                outs.append(x)
    return outs


def _torch_lpips(a, b, lp):
    """lpips package forward with lp's weights; a/b (B, H, W, 3) in [-1,1]."""
    shift = torch.from_numpy(_SHIFT).view(1, 3, 1, 1)
    scale = torch.from_numpy(_SCALE).view(1, 3, 1, 1)

    def prep(img):
        t = torch.from_numpy(np.asarray(img)).permute(0, 3, 1, 2)
        return (t - shift) / scale

    fa = _torch_vgg_feats(prep(a), lp.vgg_variables["params"])
    fb = _torch_vgg_feats(prep(b), lp.vgg_variables["params"])
    total = torch.zeros(a.shape[0])
    for xa, xb, w in zip(fa, fb, lp.lin_weights):
        na = xa / (xa.square().sum(1, keepdim=True).sqrt() + 1e-10)
        nb = xb / (xb.square().sum(1, keepdim=True).sqrt() + 1e-10)
        d = (na - nb) ** 2
        wt = torch.from_numpy(np.asarray(w)).view(1, -1, 1, 1)
        total = total + (d * wt).sum(1).mean(dim=(1, 2))
    return total


@pytest.mark.parametrize("hw", [(32, 32), (48, 64)])
def test_lpips_matches_torch_oracle(rng, hw):
    lp = fixture_lpips(seed=0)
    H, W = hw
    a = rng.uniform(-1, 1, (2, H, W, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, H, W, 3)).astype(np.float32)
    got = np.asarray(lp(jnp.asarray(a), jnp.asarray(b)))
    want = _torch_lpips(a, b, lp).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_lpips_zero_for_identical(rng):
    lp = fixture_lpips(seed=0)
    a = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    assert float(lp(jnp.asarray(a), jnp.asarray(a))[0]) == 0.0


def test_fixture_lpips_deterministic():
    a = np.linspace(-1, 1, 1 * 32 * 32 * 3, dtype=np.float32).reshape(
        1, 32, 32, 3
    )
    b = -a
    v1 = float(fixture_lpips(seed=0)(jnp.asarray(a), jnp.asarray(b))[0])
    v2 = float(fixture_lpips(seed=0)(jnp.asarray(a), jnp.asarray(b))[0])
    assert v1 == v2 and np.isfinite(v1) and v1 > 0
