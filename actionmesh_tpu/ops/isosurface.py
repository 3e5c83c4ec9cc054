"""Iso-surface extraction: marching cubes/tetrahedra + hierarchical refinement.

TPU-native replacement for the reference's CUDA octree/marching-cubes stack
(reference: actionmesh/external/triposg.py:174-205 uses TripoSG
``hierarchical_extract_geometry`` with dense depth 8 + refine depth 9; the
triangulation itself is library CUDA/C++). Split of labor here:

  * SDF evaluation — batched on TPU (the caller's ``sdf_fn`` is a jitted
    chunked query of the VAE decoder's cross-attention field).
  * Triangulation — on host, in C++ (ctypes, utils/native.py) with
    vectorized numpy fallbacks. Two methods:
      - ``cubes`` (default): marching cubes with a *generated* 256-case
        table (ops/mc_table.py — face-consistent tracing, watertight incl.
        ambiguous cases, consistent outward winding). Vertices lie only on
        grid edges — the reference's MC tessellation family, ~3x fewer
        triangles than tets for the same grid.
      - ``tetrahedra``: 6-tet cube decomposition (kept as an independent
        semantic cross-check; extra vertices on face/body diagonals).
    Exact vertex welding via grid-edge keys either way; decimation to 40k
    faces follows.

Hierarchical scheme: evaluate a dense coarse grid (2^d + 1 per axis), find
sign-crossing cells, re-evaluate only those cells' subdivided corners at
the fine depth, triangulate fine cells. This keeps fine-level SDF queries
proportional to surface area, not volume.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

# 6-tetrahedra decomposition of a cube around the 0-6 diagonal.
# Corner order: bit0=x, bit1=y, bit2=z (corner 3 = x+y, corner 6 = y+z, ...)
_CUBE_CORNERS = np.array(
    [
        [0, 0, 0],  # 0
        [1, 0, 0],  # 1
        [0, 1, 0],  # 2
        [1, 1, 0],  # 3
        [0, 0, 1],  # 4
        [1, 0, 1],  # 5
        [0, 1, 1],  # 6
        [1, 1, 1],  # 7
    ],
    dtype=np.int64,
)

_TETS = np.array(
    [
        [0, 1, 3, 7],
        [0, 3, 2, 7],
        [0, 2, 6, 7],
        [0, 6, 4, 7],
        [0, 4, 5, 7],
        [0, 5, 1, 7],
    ],
    dtype=np.int64,
)


def _tet_case_table() -> dict[int, list[tuple[tuple[int, int], ...]]]:
    """case id (4 inside-bits) -> list of triangles, each = 3 tet edges."""
    table: dict[int, list] = {0: [], 15: []}
    others = lambda i: [j for j in range(4) if j != i]
    # one inside
    for i in range(4):
        j, k, l = others(i)
        table[1 << i] = [(((i, j)), ((i, k)), ((i, l)))]
    # three inside (= one outside): reversed winding
    for i in range(4):
        j, k, l = others(i)
        table[15 ^ (1 << i)] = [(((i, j)), ((i, l)), ((i, k)))]
    # two inside
    for a in range(4):
        for b in range(a + 1, 4):
            c, d = [j for j in range(4) if j not in (a, b)]
            case = (1 << a) | (1 << b)
            table[case] = [
                ((a, c), (a, d), (b, d)),
                ((a, c), (b, d), (b, c)),
            ]
    return table


_TET_TABLE = _tet_case_table()


def marching_tetrahedra(
    corner_points: np.ndarray,
    corner_values: np.ndarray,
    corner_ids: np.ndarray,
    level: float = 0.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Triangulate cells given their 8 corner samples.

    Args:
        corner_points (C, 8, 3): cell corner positions.
        corner_values (C, 8): SDF values at corners.
        corner_ids (C, 8): globally unique integer ids per corner (for exact
            vertex welding across cells).
        level: iso level.

    Returns:
        (vertices (V, 3) float32, faces (F, 3) int64).
    """
    C = corner_points.shape[0]
    if C == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)

    # Native fast path: the C++ implementation has identical semantics
    # (same tet decomposition/case table/welding; equivalence-tested) and is
    # ~25x faster at production cell counts. numpy below is the fallback
    # and the semantic reference.
    if corner_ids.size and int(corner_ids.max()) < 2**31:
        try:
            from actionmesh_tpu.utils import native

            return native.marching_tetrahedra_cells(
                corner_points, corner_values, corner_ids, level
            )
        except Exception:  # toolchain-less host: use the numpy path
            pass

    # Gather per-tet data: (C, 6, 4, ...)
    tet_pts = corner_points[:, _TETS]  # (C, 6, 4, 3)
    tet_vals = corner_values[:, _TETS]  # (C, 6, 4)
    tet_ids = corner_ids[:, _TETS]  # (C, 6, 4)

    tet_pts = tet_pts.reshape(-1, 4, 3)
    tet_vals = tet_vals.reshape(-1, 4)
    tet_ids = tet_ids.reshape(-1, 4)

    inside = tet_vals < level  # (M, 4)
    case = (
        inside[:, 0].astype(np.int64)
        | (inside[:, 1] << 1)
        | (inside[:, 2] << 2)
        | (inside[:, 3] << 3)
    )

    tri_edges_a = []
    tri_edges_b = []
    tri_tets = []
    for case_id, tris in _TET_TABLE.items():
        if not tris:
            continue
        sel = np.nonzero(case == case_id)[0]
        if len(sel) == 0:
            continue
        for tri in tris:
            a_idx = np.array([e[0] for e in tri])
            b_idx = np.array([e[1] for e in tri])
            tri_edges_a.append(np.broadcast_to(a_idx, (len(sel), 3)))
            tri_edges_b.append(np.broadcast_to(b_idx, (len(sel), 3)))
            tri_tets.append(sel)

    if not tri_tets:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)

    edge_a = np.concatenate(tri_edges_a)  # (F, 3) local tet vertex idx
    edge_b = np.concatenate(tri_edges_b)
    tet_of_face = np.concatenate(tri_tets)  # (F,)

    # Interpolate crossing points for all face corners at once
    va = np.take_along_axis(tet_vals[tet_of_face], edge_a, axis=1)  # (F, 3)
    vb = np.take_along_axis(tet_vals[tet_of_face], edge_b, axis=1)
    t = (level - va) / np.where(np.abs(vb - va) < 1e-12, 1e-12, vb - va)
    t = np.clip(t, 0.0, 1.0)[..., None]
    pa = np.take_along_axis(
        tet_pts[tet_of_face], edge_a[..., None], axis=1
    )  # (F, 3, 3)
    pb = np.take_along_axis(tet_pts[tet_of_face], edge_b[..., None], axis=1)
    pts = pa + t * (pb - pa)  # (F, 3, 3)

    # Weld: a crossing is identified by its global grid-edge id pair
    ga = np.take_along_axis(tet_ids[tet_of_face], edge_a, axis=1)
    gb = np.take_along_axis(tet_ids[tet_of_face], edge_b, axis=1)
    lo = np.minimum(ga, gb)
    hi = np.maximum(ga, gb)
    edge_key = lo.astype(np.int64) * (2**31) + hi.astype(np.int64)

    flat_keys = edge_key.reshape(-1)
    uniq_keys, first_idx, inverse = np.unique(
        flat_keys, return_index=True, return_inverse=True
    )
    vertices = pts.reshape(-1, 3)[first_idx].astype(np.float32)
    faces = inverse.reshape(-1, 3)

    # drop degenerate faces (two corners welded to the same vertex)
    ok = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    return vertices, faces[ok]


def marching_cubes(
    corner_points: np.ndarray,
    corner_values: np.ndarray,
    corner_ids: np.ndarray,
    level: float = 0.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Marching cubes over pre-filtered cells (same contract as
    marching_tetrahedra). Native C++ fast path with the numpy
    implementation in ops/mc_table.py as fallback/semantic reference."""
    if corner_ids.size and int(corner_ids.max()) < 2**31:
        try:
            from actionmesh_tpu.utils import native

            return native.marching_cubes_cells(
                corner_points, corner_values, corner_ids, level
            )
        except Exception:  # toolchain-less host: numpy path
            pass
    from actionmesh_tpu.ops.mc_table import marching_cubes_cells_numpy

    return marching_cubes_cells_numpy(
        corner_points, corner_values, corner_ids, level
    )


def triangulate_cells(
    corner_points: np.ndarray,
    corner_values: np.ndarray,
    corner_ids: np.ndarray,
    level: float = 0.0,
    method: str = "cubes",
) -> tuple[np.ndarray, np.ndarray]:
    """Dispatch to the chosen cell triangulator."""
    if method == "cubes":
        return marching_cubes(corner_points, corner_values, corner_ids, level)
    if method == "tetrahedra":
        return marching_tetrahedra(
            corner_points, corner_values, corner_ids, level
        )
    raise ValueError(f"unknown triangulation method: {method}")


def _grid_points(bounds_lo, bounds_hi, resolution: int) -> np.ndarray:
    axes = [
        np.linspace(bounds_lo[i], bounds_hi[i], resolution, dtype=np.float32)
        for i in range(3)
    ]
    gx, gy, gz = np.meshgrid(*axes, indexing="ij")
    return np.stack([gx, gy, gz], axis=-1)  # (R, R, R, 3)


def extract_geometry_dense(
    sdf_fn: Callable[[np.ndarray], np.ndarray],
    bounds: tuple[float, ...] = (-1.005, -1.005, -1.005, 1.005, 1.005, 1.005),
    octree_depth: int = 8,
    level: float = 0.0,
    chunk: int = 1 << 18,
    method: str = "cubes",
) -> tuple[np.ndarray, np.ndarray]:
    """Dense-grid extraction at resolution 2^depth + 1."""
    lo, hi = np.array(bounds[:3]), np.array(bounds[3:])
    R = (1 << octree_depth) + 1
    pts = _grid_points(lo, hi, R)
    vals = _eval_chunked(sdf_fn, pts.reshape(-1, 3), chunk).reshape(R, R, R)
    return _triangulate_full_grid(pts, vals, level, method)


def _eval_chunked(sdf_fn, pts: np.ndarray, chunk: int) -> np.ndarray:
    """Evaluate sdf_fn in fixed-size chunks (tail padded, so a jitted
    sdf_fn compiles exactly once per chunk size)."""
    n = pts.shape[0]
    out = np.empty((n,), np.float32)
    for s in range(0, n, chunk):
        block = pts[s : s + chunk]
        if block.shape[0] < chunk:
            block = np.concatenate(
                [block, np.zeros((chunk - block.shape[0], 3), pts.dtype)]
            )
        vals = np.asarray(sdf_fn(block), np.float32).reshape(-1)
        out[s : s + chunk] = vals[: n - s if n - s < chunk else chunk]
    return out


def _triangulate_full_grid(pts, vals, level, method="cubes"):
    R = vals.shape[0]
    inside = vals < level
    cell_cross = np.zeros((R - 1, R - 1, R - 1), bool)
    # a cell crosses if its 8 corners are not all the same sign
    sub = lambda a: [a[:-1, :-1, :-1], a[1:, :-1, :-1], a[:-1, 1:, :-1],
                     a[1:, 1:, :-1], a[:-1, :-1, 1:], a[1:, :-1, 1:],
                     a[:-1, 1:, 1:], a[1:, 1:, 1:]]
    corners_in = np.stack(sub(inside), axis=-1)
    any_in = corners_in.any(axis=-1)
    all_in = corners_in.all(axis=-1)
    cell_cross = any_in & ~all_in

    ci, cj, ck = np.nonzero(cell_cross)
    base = np.stack([ci, cj, ck], axis=-1)  # (C, 3)
    corner_idx = base[:, None, :] + _CUBE_CORNERS[None]  # (C, 8, 3)
    flat = (
        corner_idx[..., 0] * R * R + corner_idx[..., 1] * R + corner_idx[..., 2]
    )
    corner_points = pts.reshape(-1, 3)[flat]
    corner_values = vals.reshape(-1)[flat]
    return triangulate_cells(corner_points, corner_values, flat, level, method)


def _cell_crossing_mask(inside: np.ndarray) -> np.ndarray:
    """(R, R, R) uint8 inside-mask -> (R-1,)*3 bool crossing-cell mask."""
    R = inside.shape[0]
    acc = np.zeros((R - 1,) * 3, np.uint8)
    for dx, dy, dz in _CUBE_CORNERS:
        acc += inside[dx : R - 1 + dx, dy : R - 1 + dy, dz : R - 1 + dz]
    return (acc > 0) & (acc < 8)


def _dilate_cells(mask: np.ndarray) -> np.ndarray:
    """3x3x3 box dilation of a bool cell mask (numpy shifts, no scipy)."""
    p = np.pad(mask, 1)
    out = np.zeros_like(mask)
    n = mask.shape[0]
    for dx in range(3):
        for dy in range(3):
            for dz in range(3):
                out |= p[dx : dx + n, dy : dy + n, dz : dz + n]
    return out


def hierarchical_extract_geometry(
    sdf_fn: Callable[[np.ndarray], np.ndarray],
    bounds: tuple[float, ...] = (-1.005, -1.005, -1.005, 1.005, 1.005, 1.005),
    dense_octree_depth: int = 8,
    hierarchical_octree_depth: int = 9,
    level: float = 0.0,
    chunk: int = 1 << 18,
    method: str = "cubes",
    grid_inside_fn: Optional[Callable] = None,
    ids_val_fn: Optional[Callable] = None,
    prefilter_octree_depth: Optional[int] = None,
    ids_val_coarse_fn: Optional[Callable] = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Coarse dense pass + fine re-evaluation only in surface-crossing cells.

    Matches the reference contract (dense depth 8 => 257^3 samples, refine
    depth 9) while keeping fine-level SDF queries proportional to surface
    area. Returns (vertices, faces).

    Device fast paths (both optional; fall back to chunked ``sdf_fn`` host
    callbacks when absent — BENCH_NOTES r3g measured the host round-trips
    at ~3x the device compute through the TPU tunnel):

      * ``grid_inside_fn(lo, step, Rc, level) -> int8 (>= Rc**3,)`` —
        inside-mask of the dense lattice (row-major i,j,k; entries past
        ``Rc**3`` are padding). The coarse pass only consumes signs, so
        implementations can generate points on device and return one byte
        per sample (``models/triposg/vae.query_sdf_grid_inside``).
      * ``ids_val_fn(ijk_int32 (M, 3), lo, fine_step) -> fp32 (>= M,)`` —
        field values at fine-lattice ids, M a multiple of the caller's
        internal padding (``query_sdf_at_ids``).

    ``prefilter_octree_depth`` (opt-in; < dense_octree_depth): two-level
    coarse pass. A depth-P dense sign grid locates the surface band; only
    the (dilated) crossing cells are subdivided to the dense depth, so
    dense-lattice queries drop from (2^d+1)^3 to O(surface area) — at
    P=6 / d=8 that is ~17M -> ~1M queries, the dominant decode term
    (BENCH_NOTES r3g). Features thinner than a depth-P cell that produce
    no sign change at ANY depth-P lattice point are missed (same failure
    mode as running the plain dense pass at depth P); the 1-cell dilation
    covers field wiggles at the band edge. Counterpart of the reference's
    flash octree decoder (ref:actionmesh/external/triposg.py:55-57).
    """
    lo, hi = np.array(bounds[:3]), np.array(bounds[3:])
    Rc = (1 << dense_octree_depth) + 1
    # Evaluate the coarse grid WITHOUT materializing its (Rc^3, 3) point
    # array: on this deployment first-touch page faults cost ~100x
    # steady-state memory access, so every avoided large temporary is
    # seconds of wall time. Each chunk's points generate on the fly.
    step = (hi - lo) / (Rc - 1)
    n_coarse = Rc ** 3

    def _coarse_chunk_pts(start: int, stop: int) -> np.ndarray:
        idx = np.arange(start, stop, dtype=np.int64)
        k = idx % Rc
        j = (idx // Rc) % Rc
        i = idx // (Rc * Rc)
        pts = np.empty((len(idx), 3), np.float32)
        pts[:, 0] = lo[0] + i * step[0]
        pts[:, 1] = lo[1] + j * step[1]
        pts[:, 2] = lo[2] + k * step[2]
        return pts

    def _vals_at_ids(ui, uj, uk, step_arr, fn=None) -> np.ndarray:
        """Field values at integer lattice ids on a grid of step
        ``step_arr`` anchored at ``lo`` (device fast path when given).
        ``fn`` overrides the query function — the prefilter coarse/band
        passes consume only SIGNS, so the caller may supply a reduced-
        precision variant (``ids_val_coarse_fn``); the fine pass (MC
        interpolation values) always uses the fp32 ``ids_val_fn``."""
        fn = fn or ids_val_fn
        if fn is not None:
            m = len(ui)
            m_pad = -(-m // chunk) * chunk
            ijk = np.zeros((m_pad, 3), np.int32)
            ijk[:m, 0] = ui
            ijk[:m, 1] = uj
            ijk[:m, 2] = uk
            return np.asarray(fn(ijk, lo, step_arr), np.float32)[:m]
        pts = np.empty((len(ui), 3), np.float32)
        pts[:, 0] = lo[0] + np.asarray(ui) * step_arr[0]
        pts[:, 1] = lo[1] + np.asarray(uj) * step_arr[1]
        pts[:, 2] = lo[2] + np.asarray(uk) * step_arr[2]
        return _eval_chunked(sdf_fn, pts, chunk)

    use_prefilter = (
        prefilter_octree_depth is not None
        and prefilter_octree_depth < dense_octree_depth
        and hierarchical_octree_depth > dense_octree_depth
    )
    use_sign_path = (
        grid_inside_fn is not None
        and hierarchical_octree_depth > dense_octree_depth
    )
    if use_prefilter:
        # Two-level coarse: depth-P dense signs -> band cells -> dense-depth
        # signs ONLY inside the (dilated) band.
        Rp = (1 << prefilter_octree_depth) + 1
        step_p = (hi - lo) / (Rp - 1)
        if grid_inside_fn is not None:
            inside_p = (
                np.asarray(grid_inside_fn(lo, step_p, Rp, level))[: Rp**3]
                .reshape(Rp, Rp, Rp)
                .astype(np.uint8)
            )
        else:
            pvals = _vals_at_ids(
                *np.unravel_index(np.arange(Rp**3), (Rp, Rp, Rp)), step_p,
                fn=ids_val_coarse_fn,
            )
            inside_p = (pvals.reshape(Rp, Rp, Rp) < level).view(np.uint8)
        band = _dilate_cells(_cell_crossing_mask(inside_p))
        pi, pj, pk = np.nonzero(band)
        if len(pi) == 0:
            return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)
        s0 = 1 << (dense_octree_depth - prefilter_octree_depth)
        # dense-lattice ids of the band cells' (s0+1)^3 sub-lattices
        bi = pi[:, None, None, None] * s0 + np.arange(s0 + 1)[None, :, None, None]
        bj = pj[:, None, None, None] * s0 + np.arange(s0 + 1)[None, None, :, None]
        bk = pk[:, None, None, None] * s0 + np.arange(s0 + 1)[None, None, None, :]
        band_ids = (bi * Rc + bj) * Rc + bk  # (Cp, s0+1, s0+1, s0+1)
        uniq_b, inv_b = np.unique(band_ids.reshape(-1), return_inverse=True)
        bvals = _vals_at_ids(
            uniq_b // (Rc * Rc), (uniq_b // Rc) % Rc, uniq_b % Rc, step,
            fn=ids_val_coarse_fn,
        )
        sub_in = (bvals[inv_b] < level).reshape(band_ids.shape)
        # dense-depth crossing sub-cells within the band
        acc = np.zeros(sub_in.shape[:1] + (s0, s0, s0), np.uint8)
        for dx, dy, dz in _CUBE_CORNERS:
            acc += sub_in[:, dx : s0 + dx, dy : s0 + dy, dz : s0 + dz]
        w, li, lj, lk = np.nonzero((acc > 0) & (acc < 8))
        ci = pi[w] * s0 + li
        cj = pj[w] * s0 + lj
        ck = pk[w] * s0 + lk
        # emit in global row-major cell order: the single-level pass orders
        # cells this way, so the triangulations are bit-identical
        order = np.lexsort((ck, cj, ci))
        ci, cj, ck = ci[order], cj[order], ck[order]
    elif use_sign_path:
        inside_flat = np.asarray(grid_inside_fn(lo, step, Rc, level))
        inside = (
            inside_flat[:n_coarse].reshape(Rc, Rc, Rc).astype(np.uint8)
        )
        ci, cj, ck = np.nonzero(_cell_crossing_mask(inside))
    else:
        coarse_vals = np.empty(n_coarse, np.float32)
        for start in range(0, n_coarse, chunk):
            stop = min(start + chunk, n_coarse)
            coarse_vals[start:stop] = np.asarray(
                sdf_fn(_coarse_chunk_pts(start, stop)), np.float32
            ).reshape(-1)
        coarse_vals = coarse_vals.reshape(Rc, Rc, Rc)

        if hierarchical_octree_depth <= dense_octree_depth:
            return _triangulate_full_grid(
                _grid_points(lo, hi, Rc), coarse_vals, level, method
            )
        inside = (coarse_vals < level).view(np.uint8)
        ci, cj, ck = np.nonzero(_cell_crossing_mask(inside))

    s = 1 << (hierarchical_octree_depth - dense_octree_depth)  # subdiv/axis
    if len(ci) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)

    cell_size = (hi - lo) / (Rc - 1)
    fine_R = (Rc - 1) * s + 1  # global fine grid resolution
    fine_step = cell_size / s

    # Global fine ids for welding (dedupe across neighboring cells)
    gi = ci[:, None, None, None] * s + np.arange(s + 1)[None, :, None, None]
    gj = cj[:, None, None, None] * s + np.arange(s + 1)[None, None, :, None]
    gk = ck[:, None, None, None] * s + np.arange(s + 1)[None, None, None, :]
    fine_ids = (gi * fine_R + gj) * fine_R + gk  # (C, s+1, s+1, s+1)

    # Deduplicate shared corners; positions derive from ids (no (C, s+1^3, 3)
    # fine-point array is ever built)
    uniq_ids, inv = np.unique(fine_ids.reshape(-1), return_inverse=True)
    ui = uniq_ids // (fine_R * fine_R)
    uj = (uniq_ids // fine_R) % fine_R
    uk = uniq_ids % fine_R
    uniq_vals = _vals_at_ids(ui, uj, uk, fine_step)
    fine_vals = uniq_vals[inv].reshape(fine_ids.shape).astype(np.float32)

    # Native fast path: triangulate the fine lattices directly in C++
    # (positions/weld-ids derived internally) — skips the (cells, 8, ...)
    # numpy staging below, which dominates host time at production scale.
    if fine_R ** 3 < 2 ** 31:
        try:
            from actionmesh_tpu.utils import native

            grid_fn = (
                native.marching_cubes_grid
                if method == "cubes"
                else native.marching_tetrahedra_grid
            )
            return grid_fn(
                fine_vals,
                np.stack([ci, cj, ck], axis=-1),
                lo,
                cell_size,
                fine_R,
                level,
            )
        except Exception:  # toolchain-less host: numpy fallback below
            pass

    # numpy fallback needs the explicit fine corner positions
    offs = np.arange(s + 1, dtype=np.float32) / s
    ox, oy, oz = np.meshgrid(offs, offs, offs, indexing="ij")
    local = np.stack([ox, oy, oz], axis=-1)  # (s+1, s+1, s+1, 3)
    base_pos = lo + np.stack([ci, cj, ck], -1).astype(np.float32) * cell_size
    fine_pts = (
        base_pos[:, None, None, None, :] + local[None] * cell_size
    )  # (C, s+1, s+1, s+1, 3)

    # Triangulate each fine sub-cell
    cells_per = s
    # build (C * s^3, 8, ...) corner arrays
    def cell_corners(arr):
        stacks = []
        for dx, dy, dz in _CUBE_CORNERS:
            stacks.append(
                arr[:, dx : dx + cells_per, dy : dy + cells_per, dz : dz + cells_per]
            )
        return np.stack(stacks, axis=-1)  # (C, s, s, s, 8)

    cp = np.stack(
        [
            fine_pts[:, dx : dx + cells_per, dy : dy + cells_per,
                     dz : dz + cells_per]
            for dx, dy, dz in _CUBE_CORNERS
        ],
        axis=-2,
    )  # (C, s, s, s, 8, 3)
    cv = cell_corners(fine_vals)  # (C, s, s, s, 8)
    cids = cell_corners(fine_ids)

    cp = cp.reshape(-1, 8, 3)
    cv = cv.reshape(-1, 8)
    cids = cids.reshape(-1, 8)

    # only keep crossing fine cells
    fin = cv < level
    keep = fin.any(axis=1) & ~fin.all(axis=1)
    return triangulate_cells(cp[keep], cv[keep], cids[keep], level, method)
