"""Parity tests for resampling ops against torch CPU reference semantics
(F.grid_sample / F.interpolate with align_corners=True)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from boostmvsnerfs_tpu.ops import sampling


def _torch_grid_sample_2d(img_hwc, xy, padding_mode):
    """xy in pixel units -> torch normalized grid, align_corners=True."""
    H, W, C = img_hwc.shape
    t_img = torch.from_numpy(img_hwc).permute(2, 0, 1)[None]  # (1,C,H,W)
    gx = xy[..., 0] / ((W - 1) / 2.0) - 1.0
    gy = xy[..., 1] / ((H - 1) / 2.0) - 1.0
    grid = torch.from_numpy(np.stack([gx, gy], -1))[None, None]  # (1,1,N,2)
    out = F.grid_sample(
        t_img, grid, mode="bilinear", padding_mode=padding_mode, align_corners=True
    )
    return out[0, :, 0].permute(1, 0).numpy()  # (N, C)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_sample_2d_matches_torch(rng, padding_mode):
    H, W, C = 13, 17, 5
    img = rng.standard_normal((H, W, C)).astype(np.float32)
    # coords spanning in-range, boundary, and far out-of-range
    xy = rng.uniform(-5, max(H, W) + 5, size=(400, 2)).astype(np.float32)
    want = _torch_grid_sample_2d(img, xy, padding_mode)
    got = np.asarray(
        sampling.grid_sample_2d(jnp.asarray(img), jnp.asarray(xy), padding_mode)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_sample_3d_matches_torch(rng, padding_mode):
    D, H, W, C = 7, 9, 11, 4
    vol = rng.standard_normal((D, H, W, C)).astype(np.float32)
    xyz = rng.uniform(-2, max(D, H, W) + 2, size=(300, 3)).astype(np.float32)

    t_vol = torch.from_numpy(vol).permute(3, 0, 1, 2)[None]  # (1,C,D,H,W)
    gx = xyz[..., 0] / ((W - 1) / 2.0) - 1.0
    gy = xyz[..., 1] / ((H - 1) / 2.0) - 1.0
    gz = xyz[..., 2] / ((D - 1) / 2.0) - 1.0
    grid = torch.from_numpy(np.stack([gx, gy, gz], -1))[None, None, None]
    want = (
        F.grid_sample(
            t_vol, grid, mode="bilinear", padding_mode=padding_mode, align_corners=True
        )[0, :, 0, 0]
        .permute(1, 0)
        .numpy()
    )
    got = np.asarray(
        sampling.grid_sample_3d(jnp.asarray(vol), jnp.asarray(xyz), padding_mode)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape_out", [(26, 34), (6, 8), (13, 17)])
def test_resize_bilinear_matches_torch(rng, shape_out):
    H, W, C = 13, 17, 3
    img = rng.standard_normal((H, W, C)).astype(np.float32)
    t = torch.from_numpy(img).permute(2, 0, 1)[None]
    want = (
        F.interpolate(t, size=shape_out, mode="bilinear", align_corners=True)[0]
        .permute(1, 2, 0)
        .numpy()
    )
    got = np.asarray(sampling.resize_bilinear(jnp.asarray(img), *shape_out))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_resize_bilinear_batched(rng):
    img = rng.standard_normal((2, 3, 8, 10, 4)).astype(np.float32)
    out = np.asarray(sampling.resize_bilinear(jnp.asarray(img), 16, 20))
    assert out.shape == (2, 3, 16, 20, 4)
    # per-slice equality with unbatched path
    single = np.asarray(sampling.resize_bilinear(jnp.asarray(img[1, 2]), 16, 20))
    np.testing.assert_allclose(out[1, 2], single, rtol=1e-6, atol=1e-6)
