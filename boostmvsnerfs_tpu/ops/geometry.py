"""Camera geometry core: projective matrices and on-device ray generation.

Pure jnp, no learnable state. Semantics match the reference:
* projection-matrix composition — reference lib/networks/enerf/utils.py:35-55
  (``get_proj_mats``),
* ray construction from intrinsics/extrinsics — reference
  lib/datasets/enerf_utils.py:25-71 (``build_rays``), which the reference runs
  on CPU dataloader workers; here rays are generated on device under jit so
  only camera matrices cross the host->device boundary.

Conventions: extrinsics ``ext`` are world->camera (w2c) 4x4; intrinsics are
3x3; image coordinates are (x, y) pixel units with align-corners semantics
(pixel centers at integer coordinates, valid range [0, W-1] x [0, H-1]).
"""

from __future__ import annotations

import jax.numpy as jnp


def scale_ixt(ixt: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Scale the first two rows of (...,3,3) intrinsics by ``scale``."""
    return ixt.at[..., :2, :].multiply(scale)


def proj_mats(
    src_ixts: jnp.ndarray,  # (B, S, 3, 3)
    src_exts: jnp.ndarray,  # (B, S, 4, 4) w2c
    tar_ixt: jnp.ndarray,  # (B, 3, 3)
    tar_ext: jnp.ndarray,  # (B, 4, 4) w2c
    src_scale: float,
    tar_scale: float,
) -> jnp.ndarray:
    """Target-pixel+depth -> source-pixel projective matrices, (B, S, 3, 4).

    Composition mirrors reference lib/networks/enerf/utils.py:35-55: the
    source projection ``K_s [R_s|t_s]`` is right-multiplied by the inverse of
    the target projection promoted to 4x4 with a [0,0,0,1] row.
    """
    src_ixts = scale_ixt(src_ixts, src_scale)
    tar_ixt = scale_ixt(tar_ixt, tar_scale)

    src_projs = src_ixts @ src_exts[..., :3, :]  # (B, S, 3, 4)

    tar_proj = tar_ixt @ tar_ext[..., :3, :]  # (B, 3, 4)
    bottom = jnp.zeros_like(tar_proj[..., :1, :]).at[..., 0, 3].set(1.0)
    tar_proj4 = jnp.concatenate([tar_proj, bottom], axis=-2)  # (B, 4, 4)
    tar_proj_inv = jnp.linalg.inv(tar_proj4)  # (B, 4, 4)

    return src_projs @ tar_proj_inv[:, None]  # (B, S, 3, 4)


def pixel_grid(H: int, W: int, dtype=jnp.float32) -> jnp.ndarray:
    """(H, W, 2) grid of (x, y) pixel coordinates."""
    x = jnp.arange(W, dtype=dtype)
    y = jnp.arange(H, dtype=dtype)
    xx, yy = jnp.meshgrid(x, y)
    return jnp.stack([xx, yy], axis=-1)


def rays_from_pixels(
    tar_ixt: jnp.ndarray,  # (B, 3, 3), already at render scale
    tar_ext: jnp.ndarray,  # (B, 4, 4) w2c
    xy: jnp.ndarray,  # (B, N, 2) pixel coordinates (x, y)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Ray origins and (unnormalized) directions for target pixels.

    Matches reference lib/datasets/enerf_utils.py:55-58: direction is
    ``[x, y, 1] @ inv(K)^T @ R_c2w^T`` (NOT normalized — the volume rendering
    z-values parameterize camera-frame depth, not euclidean distance).
    """
    c2w = jnp.linalg.inv(tar_ext)  # (B, 4, 4)
    ray_o = c2w[:, :3, 3]  # (B, 3)
    ones = jnp.ones_like(xy[..., :1])
    xy1 = jnp.concatenate([xy, ones], axis=-1)  # (B, N, 3)
    ixt_inv = jnp.linalg.inv(tar_ixt)  # (B, 3, 3)
    mat = jnp.swapaxes(ixt_inv, -1, -2) @ jnp.swapaxes(c2w[:, :3, :3], -1, -2)
    ray_d = xy1 @ mat  # (B, N, 3)
    N = xy.shape[1]
    return jnp.broadcast_to(ray_o[:, None], (ray_o.shape[0], N, 3)), ray_d


def flat_idx_to_xy(idx: jnp.ndarray, W: int) -> jnp.ndarray:
    """Flat row-major pixel index -> (x, y) float coordinates, (..., 2)."""
    x = (idx % W).astype(jnp.float32)
    y = (idx // W).astype(jnp.float32)
    return jnp.stack([x, y], axis=-1)


def project_points(
    world_xyz: jnp.ndarray,  # (..., 3)
    ext: jnp.ndarray,  # (B, 4, 4) w2c  (leading dims broadcast)
    ixt: jnp.ndarray,  # (B, 3, 3)
    eps: float = 1e-6,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Project world points into a camera: returns ((..., 2) xy pixels, (..., 1) depth).

    Pixel division clamps depth at ``eps`` exactly like reference
    lib/networks/enerf/utils.py:767 (``torch.clamp_min(..., 1e-6)``).
    """
    R = ext[..., :3, :3]
    t = ext[..., :3, 3]
    cam = world_xyz @ jnp.swapaxes(R, -1, -2) + t[..., None, :]
    pix = cam @ jnp.swapaxes(ixt, -1, -2)
    depth = pix[..., 2:3]
    xy = pix[..., :2] / jnp.maximum(depth, eps)
    return xy, depth


def cam_center(ext: jnp.ndarray) -> jnp.ndarray:
    """Camera center in world coordinates from a w2c extrinsic: -R^T t."""
    R = ext[..., :3, :3]
    t = ext[..., :3, 3:]
    return (-jnp.swapaxes(R, -1, -2) @ t)[..., 0]
