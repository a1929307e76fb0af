"""Numeric proof of the offline LPIPS/VGG weight converters.

The calibrated torchvision-VGG16 + lpips linear-head weights cannot exist in
this zero-egress container, so the converters
(eval/vgg.convert_torchvision_weights, eval/lpips.convert_lpips_weights)
can only run offline. This test proves the conversion + our LPIPS math are
correct without any pretrained data: it builds RANDOM-weight torch modules
in the exact torchvision/lpips layouts, stubs the two packages so the real
converter code paths run unmodified, and asserts our LPIPS equals a
hand-written torch implementation of the lpips-package formula
(scaling layer -> VGG16 relu1_2..relu5_3 -> channel unit-normalize ->
squared diff -> non-negative 1x1 heads -> spatial mean -> layer sum;
reference usage: lib/evaluators/enerf.py:25,81-87).
"""

import sys
import types

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from boostmvsnerfs_tpu.eval.lpips import _SCALE, _SHIFT, load_lpips
from boostmvsnerfs_tpu.eval.vgg import VGG16_CFG, convert_torchvision_weights


def _torch_vgg16_features(seed: int) -> nn.Sequential:
    """torchvision .features layout: Conv2d/ReLU pairs + MaxPool2d."""
    torch.manual_seed(seed)
    layers, cin = [], 3
    for v in VGG16_CFG:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(cin, v, 3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            cin = v
    return nn.Sequential(*layers)


_RELU_ENDS = (4, 9, 16, 23, 30)  # torchvision indices after relu1_2..relu5_3
_CHANS = (64, 128, 256, 512, 512)


def _torch_lpips_oracle(features, lins, a, b):
    """The lpips package's forward, written out (lpips/lpips.py)."""
    shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(_SCALE).view(1, 3, 1, 1)

    def feats(x):
        x = (x - shift) / scale
        outs, start = [], 0
        for end in _RELU_ENDS:
            for i in range(start, end):
                x = features[i](x)
            outs.append(x)
            start = end
        return outs

    def unit(x):
        return x / (torch.sqrt(torch.sum(x**2, 1, keepdim=True)) + 1e-10)

    total = 0.0
    for xa, xb, w in zip(feats(a), feats(b), lins):
        d = (unit(xa) - unit(xb)) ** 2
        total = total + F.conv2d(d, w).mean(dim=(2, 3))
    return total.reshape(-1)


@pytest.fixture
def converted(tmp_path):
    """Run BOTH real converters against stubbed packages with random
    weights; return (our LPIPS, torch features, torch lin weights)."""
    features = _torch_vgg16_features(0).eval()
    rng = np.random.default_rng(1)
    lins = [
        torch.from_numpy(
            rng.uniform(0.0, 2.0 / c, (1, c, 1, 1)).astype(np.float32)
        )
        for c in _CHANS
    ]

    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")

    def vgg16(weights=None):
        m = types.SimpleNamespace()
        m.features = features
        return m

    tv_models.vgg16 = vgg16
    tv.models = tv_models

    lpips_mod = types.ModuleType("lpips")

    class _FakeLPIPS:
        def __init__(self, net="vgg"):
            assert net == "vgg"
            self.lins = [
                types.SimpleNamespace(
                    model=[None, types.SimpleNamespace(weight=w)]
                )
                for w in lins
            ]

    lpips_mod.LPIPS = _FakeLPIPS

    saved = {k: sys.modules.get(k) for k in
             ("torchvision", "torchvision.models", "lpips")}
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tv_models
    sys.modules["lpips"] = lpips_mod
    try:
        from boostmvsnerfs_tpu.eval.lpips import convert_lpips_weights

        vgg_npz = str(tmp_path / "vgg.npz")
        lin_npz = str(tmp_path / "lin.npz")
        convert_torchvision_weights(vgg_npz)
        convert_lpips_weights(lin_npz)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return load_lpips(vgg_npz, lin_npz), features, lins


def test_lpips_matches_torch_oracle(converted):
    ours, features, lins = converted
    rng = np.random.default_rng(7)
    a = rng.uniform(-1, 1, (2, 3, 32, 48)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.2, a.shape), -1, 1).astype(np.float32)

    with torch.no_grad():
        want = _torch_lpips_oracle(
            features, lins, torch.from_numpy(a), torch.from_numpy(b)
        ).numpy()

    got = np.asarray(
        ours(
            jnp.asarray(a.transpose(0, 2, 3, 1)),
            jnp.asarray(b.transpose(0, 2, 3, 1)),
        )
    ).reshape(-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_lpips_zero_for_identical_inputs(converted):
    ours, _, _ = converted
    rng = np.random.default_rng(9)
    a = jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(ours(a, a)), 0.0, atol=1e-6)
