"""Mesh-sequence visualizer: 3 orbital views + input-frame column -> mp4.

Counterpart of reference actionmesh/render/visualizer.py:60-152.
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np
from PIL import Image

from actionmesh_tpu.io.mesh import Mesh
from actionmesh_tpu.render.cameras import get_uniform_cameras
from actionmesh_tpu.render.renderer import Renderer
from actionmesh_tpu.render.utils import (
    composite_rgba_on_white,
    make_grid,
    resample_list,
    write_mp4,
)

logger = logging.getLogger(__name__)


class ActionMeshVisualizer:
    def __init__(self, image_size: int = 256, n_views: int = 3, fps: int = 8):
        self.image_size = image_size
        self.n_views = n_views
        self.fps = fps
        self.renderer = Renderer(image_size=image_size)

    def render(
        self,
        meshes: list[Mesh],
        output_dir: str | Path,
        input_frames: list[Image.Image] | None = None,
        device=None,  # accepted for API parity; rendering is host-side
    ) -> Path:
        """Render the sequence to {output_dir}/grid_normal.mp4."""
        del device
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        cameras = get_uniform_cameras(self.n_views)

        frame_imgs = None
        if input_frames is not None:
            frames = resample_list(input_frames, len(meshes))
            frame_imgs = [
                np.asarray(
                    Image.fromarray(composite_rgba_on_white(f)).resize(
                        (self.image_size, self.image_size)
                    )
                )
                for f in frames
            ]

        grid_frames = []
        for t, mesh in enumerate(meshes):
            views = [self.renderer.render(mesh, cam) for cam in cameras]
            if frame_imgs is not None:
                views = [frame_imgs[t]] + views
            grid_frames.append(make_grid(views, n_cols=len(views)))

        out_path = output_dir / "grid_normal.mp4"
        write_mp4(grid_frames, out_path, fps=self.fps)
        return out_path
