"""Shared synthetic-scene fixtures for model tests."""

import numpy as np


def look_at_ext(center, target=np.zeros(3), up=np.array([0.0, 1.0, 0.0])):
    """OpenCV-convention w2c: camera x right, y down, z forward (det=+1)."""
    fwd = target - center
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd], axis=0)
    t = -R @ center
    ext = np.eye(4, dtype=np.float32)
    ext[:3, :3], ext[:3, 3] = R, t
    return ext


def make_batch(rng, B=1, S=3, H=64, W=96, levels=2, render_scales=(0.25, 1.0),
               full_image=True, num_rays=(64, 128), seed_views_radius=3.0):
    """Synthetic multi-view batch in the framework's convention."""
    ixt = np.array(
        [[W * 1.2, 0.0, W / 2], [0.0, W * 1.2, H / 2], [0.0, 0.0, 1.0]],
        dtype=np.float32,
    )
    batch = {
        "src_inps": rng.uniform(-1, 1, (B, S, H, W, 3)).astype(np.float32),
        "src_exts": np.stack(
            [
                np.stack(
                    [
                        look_at_ext(
                            np.array(
                                [
                                    seed_views_radius * np.sin(0.3 * s + 0.1),
                                    0.4 * s - 0.5,
                                    seed_views_radius * np.cos(0.3 * s + 0.1),
                                ]
                            )
                        )
                        for s in range(S)
                    ]
                )
                for _ in range(B)
            ]
        ),
        "src_ixts": np.tile(ixt, (B, S, 1, 1)),
        "tar_ext": np.stack(
            [look_at_ext(np.array([0.2, 0.1, seed_views_radius]))] * B
        ),
        "tar_ixt": np.tile(ixt, (B, 1, 1)),
        "near_far": np.tile(
            np.array([1.5, 5.0], dtype=np.float32), (B, 1)
        ),
    }
    for i in range(levels):
        H_r, W_r = int(H * render_scales[i]), int(W * render_scales[i])
        if full_image:
            idx = np.tile(np.arange(H_r * W_r, dtype=np.int32), (B, 1))
        else:
            idx = rng.integers(0, H_r * W_r, (B, num_rays[i])).astype(np.int32)
        batch[f"ray_idx_{i}"] = idx
        batch[f"rgb_{i}"] = rng.uniform(0, 1, idx.shape + (3,)).astype(np.float32)
    return batch
