"""Render utilities: temporal resampling, image grids, mp4 writing.

Counterpart of reference actionmesh/render/utils.py:16-174.
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np
from PIL import Image

logger = logging.getLogger(__name__)


def resample_list(items: list, n: int) -> list:
    """Nearest-neighbor temporal resampling of a list to length n."""
    if len(items) == n:
        return list(items)
    idx = np.round(np.linspace(0, len(items) - 1, n)).astype(int)
    return [items[i] for i in idx]


def composite_rgba_on_white(frame: Image.Image) -> np.ndarray:
    """RGBA PIL image -> (H, W, 3) uint8 on white background."""
    rgba = np.asarray(frame.convert("RGBA"), np.float32) / 255.0
    rgb = rgba[..., :3] * rgba[..., 3:] + (1.0 - rgba[..., 3:])
    return (rgb * 255).astype(np.uint8)


def make_grid(images: list[np.ndarray], n_cols: int) -> np.ndarray:
    """Tile equal-size (H, W, 3) images into a grid."""
    h, w, _ = images[0].shape
    n_rows = -(-len(images) // n_cols)
    grid = np.full((n_rows * h, n_cols * w, 3), 255, np.uint8)
    for i, img in enumerate(images):
        r, c = divmod(i, n_cols)
        grid[r * h : (r + 1) * h, c * w : (c + 1) * w] = img
    return grid


def write_mp4(frames: list[np.ndarray], path: str | Path, fps: int = 8) -> None:
    """Write frames to mp4 via imageio/ffmpeg; falls back to GIF."""
    path = Path(path)
    try:
        import imageio.v2 as imageio

        writer = imageio.get_writer(str(path), fps=fps)
        for f in frames:
            writer.append_data(f)
        writer.close()
        logger.info("Wrote %s (%d frames)", path, len(frames))
    except Exception as e:
        gif_path = path.with_suffix(".gif")
        logger.warning("mp4 writing failed (%s); writing %s", e, gif_path)
        pil = [Image.fromarray(f) for f in frames]
        pil[0].save(
            gif_path, save_all=True, append_images=pil[1:],
            duration=int(1000 / fps), loop=0,
        )
