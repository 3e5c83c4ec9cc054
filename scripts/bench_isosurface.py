"""Production-scale isosurface extraction timing (VERDICT r1 item 8).

Times hierarchical_extract_geometry at the reference's production setting
(dense depth 8 = 257^3 samples, refine depth 9) on a *surface-dense*
non-trivial SDF — a wavy blended two-lobe shape whose surface area is of
the same order as a real Stage-0 mesh — with the SDF evaluated as a jitted
chunked TPU program (the real path queries the VAE decoder's field the
same way). Reports dense-eval, fine-eval and host-triangulation wall time
separately.

Usage: python scripts/bench_isosurface.py [--depths 8 9]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from actionmesh_tpu.ops.isosurface import hierarchical_extract_geometry


def make_sdf():
    """Jitted wavy two-lobe SDF (non-sphere, realistic surface density)."""

    @jax.jit
    def sdf(pts):
        p = jnp.asarray(pts, jnp.float32)
        d1 = jnp.linalg.norm(p - jnp.array([0.25, 0.0, 0.1]), axis=-1) - 0.55
        d2 = jnp.linalg.norm(
            (p - jnp.array([-0.35, 0.1, -0.2])) * jnp.array([1.0, 1.4, 0.9]),
            axis=-1,
        ) - 0.45
        k = 0.15  # smooth union
        h = jnp.clip(0.5 + 0.5 * (d2 - d1) / k, 0.0, 1.0)
        d = d2 + (d1 - d2) * h - k * h * (1.0 - h)
        wave = 0.04 * jnp.sin(9 * p[..., 0]) * jnp.sin(7 * p[..., 1]) * jnp.sin(8 * p[..., 2])
        return d + wave

    return sdf


class TimedSDF:
    def __init__(self, fn):
        self.fn = fn
        self.device_time = 0.0
        self.n_pts = 0

    def __call__(self, pts):
        t0 = time.time()
        out = np.asarray(self.fn(pts))
        self.device_time += time.time() - t0
        self.n_pts += len(pts)
        return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dense", type=int, default=8)
    ap.add_argument("--refine", type=int, default=9)
    ap.add_argument("--method", default="cubes", choices=["cubes", "tetrahedra"])
    args = ap.parse_args()

    sdf = TimedSDF(make_sdf())
    # warm the two chunk shapes
    sdf(np.zeros((1 << 18, 3), np.float32))
    sdf.device_time = 0.0
    sdf.n_pts = 0

    t0 = time.time()
    verts, faces = hierarchical_extract_geometry(
        sdf,
        dense_octree_depth=args.dense,
        hierarchical_octree_depth=args.refine,
        method=args.method,
    )
    total = time.time() - t0
    tri_time = total - sdf.device_time
    print(
        f"dense {args.dense} / refine {args.refine} [{args.method}]: "
        f"V={len(verts)} F={len(faces)}"
    )
    print(
        f"total {total:.2f}s = SDF eval {sdf.device_time:.2f}s "
        f"({sdf.n_pts / 1e6:.1f}M pts) + host triangulation/welding {tri_time:.2f}s"
    )

    # decimation to the production 40k faces (host C++ QEM)
    from actionmesh_tpu.preprocessing.mesh import decimate_mesh
    from actionmesh_tpu.io.mesh import Mesh

    t1 = time.time()
    mesh = decimate_mesh(Mesh(verts, faces), target_faces=40_000)
    print(f"decimate {len(faces)} -> {mesh.n_faces} faces: {time.time() - t1:.2f}s")
    print(f"END-TO-END extraction+decimation: {time.time() - t0:.2f}s")


if __name__ == "__main__":
    main()
