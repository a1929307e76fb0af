"""VGG16 feature extractor (flax) for the perceptual loss and LPIPS.

The reference relies on torchvision's pretrained VGG16 for its perceptual
loss (lib/train/losses/vgg_perceptual_loss.py:4-44) and on the lpips package
(lib/evaluators/enerf.py:25). This module defines the same conv topology in
channels-last flax; pretrained weights are loaded from an .npz produced by
``convert_torchvision_weights`` (run where torchvision weights are
available — this container has no network egress).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# VGG16 feature config: conv channel per layer, 'M' = maxpool
VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
             512, 512, 512, "M"]

# slice boundaries used by both the perceptual loss (torchvision features
# [:4], [4:9], [9:16], [16:23]) and LPIPS-VGG (relu1_2 .. relu5_3)
SLICE_ENDS = (2, 4, 7, 10, 13)  # in units of conv layers


class VGG16Features(nn.Module):
    """Returns activations after relu1_2, relu2_2, relu3_3, relu4_3, relu5_3."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        outs = []
        conv_i = 0
        block_convs = 0
        for v in VGG16_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding="SAME", name=f"conv{conv_i}")(x)
                x = nn.relu(x)
                conv_i += 1
                if conv_i in SLICE_ENDS:
                    outs.append(x)
        return outs


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def normalize_imagenet(img01: jnp.ndarray) -> jnp.ndarray:
    """[0,1] RGB -> imagenet-normalized (reference
    lib/train/losses/vgg_perceptual_loss.py:12-14, 24-25)."""
    return (img01 - IMAGENET_MEAN) / IMAGENET_STD


def load_vgg_params(npz_path: str) -> dict:
    """Load converted torchvision weights: arrays named conv{i}_kernel (HWIO)
    and conv{i}_bias."""
    data = np.load(npz_path)
    params = {}
    i = 0
    while f"conv{i}_kernel" in data:
        params[f"conv{i}"] = {
            "kernel": jnp.asarray(data[f"conv{i}_kernel"]),
            "bias": jnp.asarray(data[f"conv{i}_bias"]),
        }
        i += 1
    return {"params": params}


def convert_torchvision_weights(out_path: str):  # pragma: no cover
    """One-shot converter: torchvision VGG16 state dict -> npz (OIHW->HWIO)."""
    import torch
    import torchvision

    sd = torchvision.models.vgg16(weights="IMAGENET1K_V1").features.state_dict()
    arrays = {}
    conv_i = 0
    for k in sorted(sd, key=lambda s: int(s.split(".")[0])):
        if k.endswith("weight"):
            w = sd[k].numpy().transpose(2, 3, 1, 0)  # OIHW -> HWIO
            arrays[f"conv{conv_i}_kernel"] = w
        elif k.endswith("bias"):
            arrays[f"conv{conv_i}_bias"] = sd[k].numpy()
            conv_i += 1
    np.savez(out_path, **arrays)


def perceptual_loss_fn(vgg_variables, n_blocks: int = 4):
    """Build perceptual_fn(pred01, tar01) -> scalar: mean L1 over the first
    ``n_blocks`` VGG feature slices (reference vgg_perceptual_loss.py:27-43,
    feature_layers=[0, 1, 2, 3])."""
    model = VGG16Features()

    def fn(pred, tar):
        fp = model.apply(vgg_variables, normalize_imagenet(pred))
        ft = model.apply(vgg_variables, normalize_imagenet(tar))
        loss = 0.0
        for a, b in list(zip(fp, ft))[:n_blocks]:
            loss = loss + jnp.mean(jnp.abs(a - b))
        return loss

    return fn
