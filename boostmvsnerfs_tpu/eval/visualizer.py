"""Render-result visualization: per-view PNGs and color/depth videos.

Reference lib/visualizers/enerf.py:21-48: collects frames during evaluation
and writes ``color.mp4`` / ``depth.mp4`` (JET colormap on normalized depth).
"""

from __future__ import annotations

import os

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def depth_colormap(depth: np.ndarray) -> np.ndarray:
    """Normalize depth to [0,255] and apply JET (uint8 RGB)."""
    d = depth.astype(np.float32)
    lo, hi = np.nanmin(d), np.nanmax(d)
    norm = np.zeros_like(d) if hi - lo < 1e-12 else (d - lo) / (hi - lo)
    u8 = (norm * 255).astype(np.uint8)
    if cv2 is not None:
        return cv2.applyColorMap(u8, cv2.COLORMAP_JET)[..., ::-1]
    return np.stack([u8] * 3, axis=-1)


class Visualizer:
    def __init__(self, cas_cfg, result_dir: str, write_video: bool = True,
                 fps: int = 10):
        self.cas = cas_cfg
        self.result_dir = result_dir
        self.write_video = write_video
        self.fps = fps
        self.color_frames: list[np.ndarray] = []
        self.depth_frames: list[np.ndarray] = []
        os.makedirs(result_dir, exist_ok=True)

    def visualize(self, output: dict, batch: dict):
        metas = batch["meta"]
        last = self.cas.num - 1
        h, w = metas[0][f"h_{last}"], metas[0][f"w_{last}"]
        B = len(metas)
        rgb = np.asarray(output[f"rgb_level{last}"]).reshape(B, h, w, 3)
        depth = np.asarray(output[f"depth_level{last}"]).reshape(B, h, w)
        for b in range(B):
            frame = (np.clip(rgb[b], 0, 1) * 255).astype(np.uint8)
            self.color_frames.append(frame)
            self.depth_frames.append(depth_colormap(depth[b]))

    def summarize(self):
        import imageio.v2 as imageio

        if not self.color_frames:
            return
        wrote_video = False
        if self.write_video:
            try:
                imageio.mimwrite(
                    os.path.join(self.result_dir, "color.mp4"),
                    self.color_frames, fps=self.fps,
                )
                imageio.mimwrite(
                    os.path.join(self.result_dir, "depth.mp4"),
                    self.depth_frames, fps=self.fps,
                )
                wrote_video = True
            except Exception:
                pass
        if not wrote_video:
            for i, f in enumerate(self.color_frames):
                imageio.imwrite(
                    os.path.join(self.result_dir, f"color_{i:04d}.png"), f
                )
        self.color_frames, self.depth_frames = [], []
        print(f"Visualization written to {self.result_dir}")
