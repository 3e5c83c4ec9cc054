"""Break down MeshPostprocessor.process_mesh on a production-scale mesh.

profile_stage0.py attributes ~5.7 s of the warm Stage-0 budget to
qem_process. This script regenerates a comparable ~2M-face marching-cubes
mesh from an analytic SDF (pure host — no jax, no TPU) and times each
stage of the post-process: merge_vertices, degenerate/duplicate removal,
unreferenced-vertex removal, QEM decimation, floater removal.

Usage:  python scripts/bench_meshprocess.py [--res 512]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=9)
    args = ap.parse_args()

    from actionmesh_tpu.io.mesh import Mesh
    from actionmesh_tpu.ops.isosurface import extract_geometry_dense
    from actionmesh_tpu.preprocessing import mesh as M

    # bumpy sphere — face count scales with res^2 (~2M at res 512)
    def sdf(p):
        r = np.linalg.norm(p, axis=-1)
        bump = 0.08 * np.sin(9 * p[..., 0]) * np.sin(7 * p[..., 1]) * np.sin(
            8 * p[..., 2]
        )
        return r - 0.72 + bump

    t0 = time.perf_counter()
    v, f = extract_geometry_dense(
        sdf, bounds=(-1.005,) * 3 + (1.005,) * 3, octree_depth=args.depth
    )
    print(f"extract depth={args.depth}: {time.perf_counter()-t0:.2f} s "
          f"({len(v)} verts, {len(f)} faces)")
    mesh = Mesh(vertices=v.astype(np.float32), faces=f)

    t0 = time.perf_counter()
    m1 = M.merge_vertices(mesh)
    print(f"merge_vertices:        {time.perf_counter()-t0:6.2f} s "
          f"({len(mesh.vertices)} -> {len(m1.vertices)} verts)")

    t0 = time.perf_counter()
    m2 = M.remove_degenerate_and_duplicate_faces(m1)
    print(f"degen/dup faces:       {time.perf_counter()-t0:6.2f} s "
          f"({len(m1.faces)} -> {len(m2.faces)} faces)")

    t0 = time.perf_counter()
    m3 = M.remove_unreferenced_vertices(m2)
    print(f"unreferenced verts:    {time.perf_counter()-t0:6.2f} s")

    t0 = time.perf_counter()
    m4 = M.decimate_mesh(m3, 40000)
    print(f"decimate -> 40k:       {time.perf_counter()-t0:6.2f} s "
          f"({len(m3.faces)} -> {len(m4.faces)} faces)")

    t0 = time.perf_counter()
    m5 = M.remove_floaters(m4, 0.02)
    print(f"remove_floaters:       {time.perf_counter()-t0:6.2f} s "
          f"({len(m4.faces)} -> {len(m5.faces)} faces)")

    t0 = time.perf_counter()
    full = M.MeshPostprocessor().process_mesh(mesh)
    print(f"full process_mesh:     {time.perf_counter()-t0:6.2f} s "
          f"({len(full.vertices)} verts, {len(full.faces)} faces)")


if __name__ == "__main__":
    main()
