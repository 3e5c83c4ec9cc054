"""Software mesh preview renderer (painter's algorithm, PIL polygon fill).

Counterpart of reference actionmesh/render/renderer.py:43-185 (pytorch3d
CUDA rasterizer + HardPhong shading + 2x supersampling AA). This renderer
serves the same non-metric preview path: depth-sorted flat-shaded triangle
fill with Lambertian + ambient lighting, 2x supersample + box downsample.
Host-only by design (previews are not on the TPU compute path).
"""

from __future__ import annotations

import numpy as np
from PIL import Image, ImageDraw

from actionmesh_tpu.io.mesh import Mesh


class Renderer:
    def __init__(
        self,
        image_size: int = 256,
        supersample: int = 2,
        background: tuple[float, float, float] = (1.0, 1.0, 1.0),
        base_color: tuple[float, float, float] = (0.55, 0.65, 0.9),
    ):
        self.image_size = image_size
        self.supersample = supersample
        self.background = background
        self.base_color = np.array(base_color)

    def render(self, mesh: Mesh, camera: dict) -> np.ndarray:
        """Render one mesh with one camera -> (H, W, 3) uint8."""
        size = self.image_size * self.supersample
        R, t, focal = camera["R"], camera["t"], camera["focal"]

        cam_pts = mesh.vertices @ R.T + t  # (V, 3), z = depth along view
        z = np.maximum(cam_pts[:, 2], 1e-6)
        x = focal * cam_pts[:, 0] / z
        y = focal * cam_pts[:, 1] / z
        px = (x * 0.5 + 0.5) * size
        py = (0.5 - y * 0.5) * size

        faces = mesh.faces
        face_depth = z[faces].mean(axis=1)
        face_normals, _ = mesh.face_normals_and_areas()

        # light from the camera direction + fixed key light
        view_dir = -R[2]  # camera forward in world, towards scene
        key = np.array([0.5, 0.3, 0.8])
        key = key / np.linalg.norm(key)
        lambert = 0.55 * np.abs(face_normals @ key) + 0.35 * np.abs(
            face_normals @ view_dir
        )
        shade = np.clip(0.25 + lambert, 0.0, 1.0)
        colors = np.clip(shade[:, None] * self.base_color * 255, 0, 255).astype(
            np.uint8
        )

        img = Image.new(
            "RGB", (size, size),
            tuple(int(c * 255) for c in self.background),
        )
        draw = ImageDraw.Draw(img)
        order = np.argsort(-face_depth)  # back to front
        tri_px = np.stack([px[faces], py[faces]], axis=-1)  # (F, 3, 2)
        for fi in order:
            p = tri_px[fi]
            draw.polygon(
                [tuple(p[0]), tuple(p[1]), tuple(p[2])],
                fill=tuple(colors[fi]),
            )

        if self.supersample > 1:
            img = img.resize(
                (self.image_size, self.image_size), Image.LANCZOS
            )
        return np.asarray(img)
