"""VGG16 feature extractor + perceptual loss tests (random weights)."""

import jax
import jax.numpy as jnp
import numpy as np

from boostmvsnerfs_tpu.eval.vgg import (
    VGG16Features,
    normalize_imagenet,
    perceptual_loss_fn,
)
from boostmvsnerfs_tpu.train.loss import enerf_loss
import pytest

pytestmark = pytest.mark.slow


def test_vgg_feature_shapes(rng):
    model = VGG16Features()
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(variables, x)
    shapes = [tuple(o.shape) for o in outs]
    assert shapes == [
        (1, 64, 64, 64),
        (1, 32, 32, 128),
        (1, 16, 16, 256),
        (1, 8, 8, 512),
        (1, 4, 4, 512),
    ]


def test_perceptual_loss_zero_for_identical(rng):
    model = VGG16Features()
    x = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), normalize_imagenet(x))
    fn = perceptual_loss_fn(variables)
    assert float(fn(x, x)) == 0.0
    y = jnp.clip(x + 0.1, 0, 1)
    assert float(fn(x, y)) > 0.0


def test_enerf_loss_with_perceptual(rng):
    h, w = 8, 12
    gt = jnp.asarray(rng.uniform(0, 1, (1, h * w, 3)).astype(np.float32))
    out = {"rgb_level0": gt + 0.05, "rgb_level1": gt + 0.02}
    batch = {"rgb_0": gt, "rgb_1": gt}

    calls = []

    def fake_perceptual(a, b):
        calls.append((a.shape, b.shape))
        return jnp.mean(jnp.abs(a - b))

    loss, stats = enerf_loss(
        out, batch, (0.1, 1.0), 2, (True, True),
        perceptual_fn=fake_perceptual, image_hw=((h, w), (h, w)),
        train_img=(False, True),
    )
    assert np.isfinite(float(loss))
    # perceptual applied only at levels with train_img=True
    assert len(calls) == 1
    assert "perceptual_loss_1" in stats and "perceptual_loss_0" not in stats
