"""Stage 0 backend factory: image -> (3D latent, mesh).

The production backend is the TripoSG port (models/triposg/): a rectified-
flow image-to-3D DiT + vecset VAE + SDF grid decode + marching cubes
(reference adapter contract: actionmesh/external/triposg.py:26-205 —
returns latents (1, 2048, 64) and a mesh from one image).

When TripoSG weights are unavailable, a deterministic development stub
produces a seeded latent and a UV-sphere mesh so the Stage I/II cascade can
run end-to-end.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from actionmesh_tpu.io.mesh import Mesh

logger = logging.getLogger(__name__)


def make_uv_sphere(
    radius: float = 0.8, n_lat: int = 64, n_lon: int = 128
) -> Mesh:
    """UV sphere in the [-1, 1]^3 normalized space."""
    lat = np.linspace(0, np.pi, n_lat + 1)
    lon = np.linspace(0, 2 * np.pi, n_lon, endpoint=False)
    verts = [np.array([0.0, 0.0, radius])]
    for t in lat[1:-1]:
        for p in lon:
            verts.append(
                radius
                * np.array(
                    [np.sin(t) * np.cos(p), np.sin(t) * np.sin(p), np.cos(t)]
                )
            )
    verts.append(np.array([0.0, 0.0, -radius]))
    vertices = np.stack(verts)

    faces = []
    # top cap
    for j in range(n_lon):
        faces.append([0, 1 + j, 1 + (j + 1) % n_lon])
    # rings
    for i in range(n_lat - 2):
        ring0 = 1 + i * n_lon
        ring1 = 1 + (i + 1) * n_lon
        for j in range(n_lon):
            a, b = ring0 + j, ring0 + (j + 1) % n_lon
            c, d = ring1 + j, ring1 + (j + 1) % n_lon
            faces.append([a, c, b])
            faces.append([b, c, d])
    # bottom cap
    last = len(vertices) - 1
    ring = 1 + (n_lat - 2) * n_lon
    for j in range(n_lon):
        faces.append([last, ring + (j + 1) % n_lon, ring + j])
    return Mesh(vertices=vertices, faces=np.array(faces))


class StubImageTo3D:
    """Deterministic development stand-in for the TripoSG backend."""

    def __init__(self, latent_shape: tuple[int, int] = (2048, 64)):
        self.latent_shape = tuple(latent_shape)

    def __call__(
        self,
        image,
        seed: int = 44,
        num_inference_steps: int = 100,
        guidance_scale: float = 7.5,
    ) -> tuple[jnp.ndarray, Mesh]:
        del num_inference_steps, guidance_scale
        # Mix image content into the seed so different inputs diverge
        arr = np.asarray(image.convert("RGB").resize((32, 32)), dtype=np.uint8)
        content_hash = int(arr.sum()) & 0x7FFFFFFF
        key = jax.random.PRNGKey(seed ^ content_hash)
        latent = jax.random.normal(key, (1,) + self.latent_shape, jnp.float32)
        return latent, make_uv_sphere()


def make_image_to_3d(
    weights_dir: Optional[Path],
    latent_shape: tuple[int, int] = (2048, 64),
    dtype: jnp.dtype = jnp.bfloat16,
    device_mesh=None,
):
    """Return the TripoSG backend if weights exist, else the dev stub."""
    if weights_dir is not None and Path(weights_dir).exists():
        from actionmesh_tpu.models.triposg.pipeline import TripoSGPipeline

        logger.info("Loading TripoSG weights from %s", weights_dir)
        return TripoSGPipeline.from_pretrained(
            Path(weights_dir), dtype=dtype, device_mesh=device_mesh
        )
    logger.warning(
        "TripoSG weights not found (%s) — using the deterministic Stage-0 "
        "stub (development mode).",
        weights_dir,
    )
    return StubImageTo3D(latent_shape=latent_shape)
