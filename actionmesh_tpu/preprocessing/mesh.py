"""Mesh post-processing: cleanup, decimation, floaters, normalization.

TPU-native counterpart of the reference mesh processor
(reference: actionmesh/preprocessing/mesh_processor.py:20-425, which leans
on trimesh + fast_simplification C++ + scipy cKDTree). Host-side numpy; the
quadric decimation has a native C++ backend (native/) with a
vertex-clustering fallback.
"""

from __future__ import annotations

import contextlib
import dataclasses
import logging

import numpy as np

from actionmesh_tpu.io.mesh import Mesh

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def scoped_seed(seed: int):
    """Temporarily seed numpy's global RNG (mesh_processor.py:20-34)."""
    state = np.random.get_state()
    np.random.seed(seed)
    try:
        yield
    finally:
        np.random.set_state(state)


def get_mesh_features(mesh: Mesh, with_normals: bool) -> np.ndarray:
    """(V, 3|6) float32 vertex positions (+ unit normals)."""
    features = mesh.vertices.astype(np.float32)
    if with_normals:
        normals = mesh.vertex_normals.astype(np.float32)
        norm = np.linalg.norm(normals, axis=-1, keepdims=True)
        normals = normals / np.maximum(norm, 1e-12)
        features = np.concatenate([features, normals], axis=-1)
    return features


# ---------------------------------------------------------------------------
# Cleanup
# ---------------------------------------------------------------------------

def merge_vertices(mesh: Mesh, digits: int = 8) -> Mesh:
    """Merge exactly-coincident vertices (rounded to `digits`)."""
    rounded = np.round(mesh.vertices, digits)
    _, first_idx, inverse = np.unique(
        rounded, axis=0, return_index=True, return_inverse=True
    )
    new_vertices = mesh.vertices[first_idx]
    new_faces = inverse[mesh.faces]
    return Mesh(vertices=new_vertices, faces=new_faces)


def remove_degenerate_and_duplicate_faces(mesh: Mesh) -> Mesh:
    f = mesh.faces
    nondegenerate = (
        (f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2]) & (f[:, 0] != f[:, 2])
    )
    f = f[nondegenerate]
    # duplicate faces regardless of winding: sort vertex ids per face
    key = np.sort(f, axis=1)
    _, unique_idx = np.unique(key, axis=0, return_index=True)
    f = f[np.sort(unique_idx)]
    return Mesh(vertices=mesh.vertices, faces=f)


def remove_unreferenced_vertices(mesh: Mesh) -> Mesh:
    referenced = np.zeros(len(mesh.vertices), dtype=bool)
    referenced[mesh.faces.reshape(-1)] = True
    remap = np.cumsum(referenced) - 1
    return Mesh(
        vertices=mesh.vertices[referenced], faces=remap[mesh.faces]
    )


def connected_components(mesh: Mesh) -> np.ndarray:
    """Face component labels via union-find over shared vertices."""
    parent = np.arange(len(mesh.vertices))

    def find(i):
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != root:
            parent[i], i = root, parent[i]
        return root

    for face in mesh.faces:
        a = find(face[0])
        for v in face[1:]:
            b = find(v)
            if a != b:
                parent[b] = a
    roots = np.array([find(v) for v in mesh.faces[:, 0]])
    _, labels = np.unique(roots, return_inverse=True)
    return labels


def remove_floaters(mesh: Mesh, threshold: float = 0.02) -> Mesh:
    """Drop connected components whose face count is < threshold * largest.

    (reference: mesh_processor.py:288-325)
    """
    labels = connected_components(mesh)
    counts = np.bincount(labels)
    largest = counts.max()
    keep_labels = np.nonzero(counts >= threshold * largest)[0]
    keep = np.isin(labels, keep_labels)
    n_removed = int((~keep).sum())
    if n_removed:
        logger.info(
            "Removed %d floater faces in %d components",
            n_removed,
            len(counts) - len(keep_labels),
        )
    out = Mesh(vertices=mesh.vertices, faces=mesh.faces[keep])
    return remove_unreferenced_vertices(out)


# ---------------------------------------------------------------------------
# Decimation
# ---------------------------------------------------------------------------

def decimate_mesh(mesh: Mesh, target_faces: int = 40000) -> Mesh:
    """Decimate to ~target_faces.

    Prefers the native quadric-error-metric library (native/decimate);
    falls back to iterative vertex clustering, which preserves overall shape
    at the cost of less optimal triangle quality.
    """
    if mesh.n_faces <= target_faces:
        return mesh
    try:
        from actionmesh_tpu.utils.native import (
            grid_cluster_simplify,
            quadric_decimate,
        )

        verts, faces = mesh.vertices, mesh.faces
        if mesh.n_faces > max(16 * target_faces, 400_000):
            # Grid-clustering pre-pass to ~8x target faces: the greedy QEM
            # heap is serial and dominated by the input size; one sort-based
            # clustering pass removes most of it with negligible quality
            # impact at this reduction depth (QEM still does the final 8x).
            vert_target = 4 * target_faces  # verts ~= faces / 2
            res = 256
            lo = verts.min(0)
            inv = (res - 1e-9) / np.maximum(verts.max(0) - lo, 1e-30)
            cell = np.floor((verts - lo) * inv).astype(np.int64)
            occ = len(
                np.unique((cell[:, 0] * res + cell[:, 1]) * res + cell[:, 2])
            )
            res = int(np.clip(res * np.sqrt(vert_target / max(occ, 1)), 48, 1024))
            cv, cf = grid_cluster_simplify(verts, faces, res)
            if len(cf) > target_faces:  # guard: never coarser than target
                logger.info(
                    "Cluster pre-pass (res %d): %d -> %d faces",
                    res, len(faces), len(cf),
                )
                verts, faces = cv, cf

        v, f = quadric_decimate(verts, faces, target_faces)
        out = Mesh(vertices=v, faces=f)
        logger.info("Decimated %d -> %d faces (quadric)", mesh.n_faces, out.n_faces)
        return out
    except (ImportError, OSError):
        pass

    out = mesh
    lo, hi = mesh.bounds
    extent = float(np.max(hi - lo))
    # binary search a grid pitch that lands near the target face count
    pitch_lo, pitch_hi = extent / 2048, extent / 8
    for _ in range(16):
        pitch = (pitch_lo * pitch_hi) ** 0.5
        candidate = _cluster_decimate(mesh, pitch)
        if candidate.n_faces > target_faces:
            pitch_lo = pitch
        else:
            pitch_hi = pitch
        out = candidate
        if 0.8 * target_faces <= candidate.n_faces <= target_faces:
            break
    if out.n_faces > target_faces:
        out = _cluster_decimate(mesh, pitch_hi)
    logger.info("Decimated %d -> %d faces (clustering)", mesh.n_faces, out.n_faces)
    return out


def _cluster_decimate(mesh: Mesh, pitch: float) -> Mesh:
    keys = np.floor(mesh.vertices / pitch).astype(np.int64)
    _, first_idx, inverse = np.unique(
        keys, axis=0, return_index=True, return_inverse=True
    )
    # representative = mean of clustered vertices
    sums = np.zeros((len(first_idx), 3))
    counts = np.zeros(len(first_idx))
    np.add.at(sums, inverse, mesh.vertices)
    np.add.at(counts, inverse, 1)
    new_vertices = sums / counts[:, None]
    new_faces = inverse[mesh.faces]
    out = remove_degenerate_and_duplicate_faces(
        Mesh(vertices=new_vertices, faces=new_faces)
    )
    return remove_unreferenced_vertices(out)


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------

def normalize_mesh(
    mesh: Mesh, scale: float = 1.0
) -> tuple[Mesh, np.ndarray, float]:
    """Center + uniformly scale the mesh into [-scale, scale]^3.

    Returns (normalized mesh, center, scale_factor) so it can be undone.
    """
    lo, hi = mesh.bounds
    center = (lo + hi) / 2.0
    extent = float(np.max(hi - lo))
    factor = 2.0 * scale / max(extent, 1e-12)
    out = Mesh(
        vertices=(mesh.vertices - center) * factor,
        faces=mesh.faces,
        uv=mesh.uv,
        visual=mesh.visual,
    )
    return out, center, factor


def denormalize_mesh(mesh: Mesh, center: np.ndarray, factor: float) -> Mesh:
    return Mesh(
        vertices=mesh.vertices / factor + center,
        faces=mesh.faces,
        uv=mesh.uv,
        visual=mesh.visual,
    )


# ---------------------------------------------------------------------------
# Surface sampling
# ---------------------------------------------------------------------------

def sample_surface(
    mesh: Mesh, n_points: int, seed: int | None = None, with_normals: bool = True
) -> np.ndarray:
    """Uniform area-weighted surface sampling -> (n_points, 3|6)."""
    rng = np.random.default_rng(seed)
    face_normals, areas = mesh.face_normals_and_areas()
    probs = areas / areas.sum()
    face_idx = rng.choice(len(mesh.faces), size=n_points, p=probs)
    r1 = rng.random(n_points)
    r2 = rng.random(n_points)
    sqrt_r1 = np.sqrt(r1)
    u = 1.0 - sqrt_r1
    v = sqrt_r1 * (1.0 - r2)
    w = sqrt_r1 * r2
    tri = mesh.vertices[mesh.faces[face_idx]]  # (n, 3, 3)
    points = u[:, None] * tri[:, 0] + v[:, None] * tri[:, 1] + w[:, None] * tri[:, 2]
    if with_normals:
        return np.concatenate([points, face_normals[face_idx]], axis=-1).astype(
            np.float32
        )
    return points.astype(np.float32)


# ---------------------------------------------------------------------------
# Vertex merge map (texture-preserving {video+3D} mode)
# ---------------------------------------------------------------------------

def merge_and_clean_mesh(
    mesh: Mesh, merge_tol: float = 1e-6
) -> tuple[Mesh, np.ndarray, np.ndarray]:
    """Merge near-coincident vertices, keeping a map back to the originals.

    Returns (merged_mesh, vertex_merge_map (V_orig,), pre_merge_faces).
    vertex_merge_map[i] is the merged-vertex index of original vertex i so
    UV/texture topology can be re-expanded afterwards
    (reference: mesh_processor.py:37-82, pipeline_with_3d.py:229-238).
    """
    from scipy.spatial import cKDTree

    pre_merge_faces = mesh.faces.copy()
    tree = cKDTree(mesh.vertices)
    groups = tree.query_ball_point(mesh.vertices, r=merge_tol)
    merge_to = np.arange(len(mesh.vertices))
    for i, grp in enumerate(groups):
        merge_to[i] = min(grp)
    unique_ids, vertex_merge_map = np.unique(merge_to, return_inverse=True)
    merged = Mesh(
        vertices=mesh.vertices[unique_ids],
        faces=vertex_merge_map[mesh.faces],
    )
    merged = remove_degenerate_and_duplicate_faces(merged)
    return merged, vertex_merge_map, pre_merge_faces


# ---------------------------------------------------------------------------
# MeshPostprocessor
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class MeshPostprocessor:
    """Post-Stage-0 cleanup pipeline (reference: mesh_processor.py:374-425)."""

    face_decimation: int = 40000
    floaters_threshold: float = 0.02

    def process_mesh(self, mesh: Mesh, seed: int = 44) -> Mesh:
        with scoped_seed(seed):
            mesh = merge_vertices(mesh)
            mesh = remove_degenerate_and_duplicate_faces(mesh)
            mesh = remove_unreferenced_vertices(mesh)
            if self.face_decimation and mesh.n_faces > self.face_decimation:
                mesh = decimate_mesh(mesh, self.face_decimation)
            if self.floaters_threshold > 0:
                mesh = remove_floaters(mesh, self.floaters_threshold)
        return mesh
