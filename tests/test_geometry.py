"""Geometry ops: FPS, marching tetrahedra, hierarchical extraction, mesh IO."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from actionmesh_tpu.io.mesh import Mesh, load_glb, save_glb
from actionmesh_tpu.ops import isosurface as iso
from actionmesh_tpu.utils import native as nat_mod
from actionmesh_tpu.ops.fps import farthest_point_sampling, sample_pc_grouped
from actionmesh_tpu.ops.isosurface import (
    extract_geometry_dense,
    hierarchical_extract_geometry,
)
from actionmesh_tpu.preprocessing.mesh import (
    MeshPostprocessor,
    normalize_mesh,
    remove_floaters,
    sample_surface,
)


def sphere_sdf(pts, radius=0.6):
    return np.linalg.norm(pts, axis=-1) - radius


class TestFPS:
    def test_fps_spreads_points(self):
        key = jax.random.PRNGKey(0)
        # two well-separated clusters; FPS must sample from both
        c1 = jax.random.normal(key, (1, 100, 3)) * 0.01
        c2 = c1 + 10.0
        pts = jnp.concatenate([c1, c2], axis=1)
        sampled, idx = farthest_point_sampling(pts, 8)
        assert sampled.shape == (1, 8, 3)
        from_c2 = (np.asarray(idx[0]) >= 100).sum()
        assert 2 <= from_c2 <= 6  # both clusters represented

    def test_fps_no_duplicates(self):
        pts = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 3))
        _, idx = farthest_point_sampling(pts, 16)
        for b in range(2):
            assert len(set(np.asarray(idx[b]).tolist())) == 16

    def test_grouped_sampling_shares_indices(self):
        pts = jax.random.normal(jax.random.PRNGKey(2), (4, 32, 3))  # B*T=4, T=2
        _, idx = sample_pc_grouped(pts, 8, n_grouped_frames=2)
        assert np.array_equal(np.asarray(idx[0]), np.asarray(idx[1]))
        assert np.array_equal(np.asarray(idx[2]), np.asarray(idx[3]))


class TestIsosurface:
    def test_sphere_dense(self):
        v, f = extract_geometry_dense(sphere_sdf, octree_depth=5)
        assert len(v) > 100 and len(f) > 100
        radii = np.linalg.norm(v, axis=1)
        np.testing.assert_allclose(radii, 0.6, atol=0.01)

    def test_sphere_hierarchical_matches_radius(self):
        v, f = hierarchical_extract_geometry(
            sphere_sdf, dense_octree_depth=4, hierarchical_octree_depth=6
        )
        radii = np.linalg.norm(v, axis=1)
        np.testing.assert_allclose(radii, 0.6, atol=0.005)
        # watertight-ish: every edge shared by exactly 2 faces
        mesh = Mesh(vertices=v, faces=f)
        edges = np.concatenate(
            [mesh.faces[:, [0, 1]], mesh.faces[:, [1, 2]], mesh.faces[:, [2, 0]]]
        )
        edges = np.sort(edges, axis=1)
        _, counts = np.unique(edges, axis=0, return_counts=True)
        assert (counts == 2).mean() > 0.99

    def test_hierarchical_finer_than_dense(self):
        v1, _ = extract_geometry_dense(sphere_sdf, octree_depth=4)
        v2, _ = hierarchical_extract_geometry(
            sphere_sdf, dense_octree_depth=4, hierarchical_octree_depth=6
        )
        err1 = np.abs(np.linalg.norm(v1, axis=1) - 0.6).max()
        err2 = np.abs(np.linalg.norm(v2, axis=1) - 0.6).max()
        assert err2 < err1

    def test_surface_area_close_to_analytic(self):
        v, f = hierarchical_extract_geometry(
            sphere_sdf, dense_octree_depth=4, hierarchical_octree_depth=6
        )
        mesh = Mesh(vertices=v, faces=f)
        analytic = 4 * np.pi * 0.6**2
        assert abs(mesh.area - analytic) / analytic < 0.02


class TestNativeMarchingTets:
    def test_native_matches_numpy_exactly(self):
        """The C++ triangulation must weld/triangulate identically to the
        numpy semantic reference (same counts, bijective vertex map, same
        oriented face set)."""
        import pytest

        from actionmesh_tpu.ops import isosurface as iso
        from actionmesh_tpu.utils import native as nat_mod

        try:
            nat_mod._load()
        except Exception:
            pytest.skip("native toolchain unavailable")
        from scipy.spatial import cKDTree

        R = 17
        lo, hi = np.array([-1.0] * 3), np.array([1.0] * 3)
        pts = iso._grid_points(lo, hi, R)
        vals = (
            np.linalg.norm(pts, axis=-1)
            - 0.7
            + 0.05 * np.sin(5 * pts[..., 0]) * np.cos(4 * pts[..., 1])
        ).astype(np.float32)
        corners = iso._CUBE_CORNERS
        cp = np.stack(
            [pts[dx : R - 1 + dx, dy : R - 1 + dy, dz : R - 1 + dz]
             for dx, dy, dz in corners], axis=-2,
        ).reshape(-1, 8, 3)
        ids = np.arange(R ** 3).reshape(R, R, R)
        cid = np.stack(
            [ids[dx : R - 1 + dx, dy : R - 1 + dy, dz : R - 1 + dz]
             for dx, dy, dz in corners], axis=-1,
        ).reshape(-1, 8)
        cv = np.stack(
            [vals.reshape(R, R, R)[dx : R - 1 + dx, dy : R - 1 + dy, dz : R - 1 + dz]
             for dx, dy, dz in corners], axis=-1,
        ).reshape(-1, 8)
        fin = cv < 0.0
        keep = fin.any(1) & ~fin.all(1)
        cp, cv, cid = cp[keep], cv[keep], cid[keep]

        v_nat, f_nat = nat_mod.marching_tetrahedra_cells(cp, cv, cid, 0.0)
        orig = nat_mod.marching_tetrahedra_cells
        nat_mod.marching_tetrahedra_cells = None  # force numpy fallback
        try:
            v_np, f_np = iso.marching_tetrahedra(cp, cv, cid, 0.0)
        finally:
            nat_mod.marching_tetrahedra_cells = orig

        assert v_nat.shape == v_np.shape and f_nat.shape == f_np.shape
        d, perm = cKDTree(v_np).query(v_nat)
        assert d.max() < 1e-4
        assert len(set(perm.tolist())) == len(perm)
        fa = perm[f_nat]

        def canon(f):
            m = np.argmin(f, axis=1)
            return set(
                map(tuple, np.stack([np.roll(t, -s_) for t, s_ in zip(f, m)]))
            )

        assert canon(fa) == canon(f_np)


class TestMeshOps:
    def _sphere(self):
        v, f = hierarchical_extract_geometry(
            sphere_sdf, dense_octree_depth=4, hierarchical_octree_depth=5
        )
        return Mesh(vertices=v, faces=f)

    def test_glb_roundtrip(self, tmp_path):
        mesh = self._sphere()
        path = tmp_path / "m.glb"
        save_glb(mesh, path)
        re = load_glb(path)
        assert re.n_faces == mesh.n_faces
        np.testing.assert_allclose(re.vertices, mesh.vertices, atol=1e-6)

    def test_remove_floaters(self):
        big = self._sphere()
        tiny = Mesh(
            vertices=np.array([[2, 2, 2], [2.1, 2, 2], [2, 2.1, 2]]),
            faces=np.array([[0, 1, 2]]),
        )
        combined = Mesh(
            vertices=np.concatenate([big.vertices, tiny.vertices]),
            faces=np.concatenate([big.faces, tiny.faces + big.n_vertices]),
        )
        cleaned = remove_floaters(combined, threshold=0.02)
        assert cleaned.n_faces == big.n_faces

    def test_decimation_via_postprocessor(self):
        mesh = self._sphere()
        target = mesh.n_faces // 4
        proc = MeshPostprocessor(face_decimation=target, floaters_threshold=0.0)
        out = proc.process_mesh(mesh, seed=1)
        assert out.n_faces <= target * 1.05
        # shape roughly preserved
        radii = np.linalg.norm(out.vertices, axis=1)
        assert abs(radii.mean() - 0.6) < 0.05

    def test_normalize_mesh(self):
        mesh = Mesh(
            vertices=np.random.default_rng(0).uniform(3, 9, (100, 3)),
            faces=np.array([[0, 1, 2]]),
        )
        normed, center, factor = normalize_mesh(mesh)
        b = normed.bounds
        assert b.min() >= -1.0 - 1e-9 and b.max() <= 1.0 + 1e-9
        from actionmesh_tpu.preprocessing.mesh import denormalize_mesh

        back = denormalize_mesh(normed, center, factor)
        np.testing.assert_allclose(back.vertices, mesh.vertices, atol=1e-9)

    def test_sample_surface(self):
        mesh = self._sphere()
        pts = sample_surface(mesh, 1000, seed=3)
        assert pts.shape == (1000, 6)
        radii = np.linalg.norm(pts[:, :3], axis=1)
        np.testing.assert_allclose(radii, 0.6, atol=0.03)
        # normals roughly radial
        cos = np.sum(pts[:, :3] / radii[:, None] * pts[:, 3:], axis=1)
        assert (np.abs(cos) > 0.9).mean() > 0.95


class TestMarchingCubes:
    """The generated-table MC path (ops/mc_table.py + native backend)."""

    def _sphere_cells(self, R=32, radius=1.0, extent=1.25):
        ax = np.linspace(-extent, extent, R, dtype=np.float32)
        gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
        pts = np.stack([gx, gy, gz], -1)
        vals = (np.linalg.norm(pts.reshape(-1, 3), axis=-1) - radius).reshape(
            R, R, R
        )
        corners = iso._CUBE_CORNERS
        inside = vals < 0
        ci8 = np.stack(
            [inside[dx : R - 1 + dx, dy : R - 1 + dy, dz : R - 1 + dz]
             for dx, dy, dz in corners], -1,
        )
        keep = ci8.any(-1) & ~ci8.all(-1)
        ci, cj, ck = np.nonzero(keep)
        base = np.stack([ci, cj, ck], -1)
        idx = base[:, None, :] + corners[None]
        flat = idx[..., 0] * R * R + idx[..., 1] * R + idx[..., 2]
        return pts.reshape(-1, 3)[flat], vals.reshape(-1)[flat], flat

    @staticmethod
    def _check_watertight(V, F):
        edges = {}
        for f in F:
            for k in range(3):
                e = (int(f[k]), int(f[(k + 1) % 3]))
                edges[e] = edges.get(e, 0) + 1
        assert all(c == 1 for c in edges.values()), "duplicated directed edge"
        assert all((b, a) in edges for (a, b) in edges), "boundary edge"
        return len(edges) // 2

    def test_sphere_watertight_euler_volume_radius(self):
        cp, cv, cid = self._sphere_cells()
        from actionmesh_tpu.ops.isosurface import marching_cubes

        V, F = marching_cubes(cp, cv, cid, 0.0)
        E = self._check_watertight(V, F)
        assert len(V) - E + len(F) == 2  # genus 0
        # consistent outward winding: signed volume ~ 4/3 pi r^3
        v0, v1, v2 = V[F[:, 0]], V[F[:, 1]], V[F[:, 2]]
        vol = np.sum(np.einsum("ij,ij->i", v0, np.cross(v1, v2))) / 6.0
        np.testing.assert_allclose(vol, 4 / 3 * np.pi, rtol=0.01)
        np.testing.assert_allclose(np.linalg.norm(V, axis=1), 1.0, atol=0.005)

    def test_native_matches_numpy(self):
        try:
            nat_mod._load()
        except Exception:
            pytest.skip("native toolchain unavailable")
        from actionmesh_tpu.ops.mc_table import marching_cubes_cells_numpy

        cp, cv, cid = self._sphere_cells(R=20)
        v_nat, f_nat = nat_mod.marching_cubes_cells(cp, cv, cid, 0.0)
        v_np, f_np = marching_cubes_cells_numpy(cp, cv, cid, 0.0)
        assert v_nat.shape == v_np.shape and f_nat.shape == f_np.shape
        from scipy.spatial import cKDTree

        d, perm = cKDTree(v_np).query(v_nat)
        assert d.max() < 1e-4
        fa = perm[f_nat]

        def canon(f):
            m = np.argmin(f, axis=1)
            return set(
                map(tuple, np.stack([np.roll(t, -s_) for t, s_ in zip(f, m)]))
            )

        assert canon(fa) == canon(f_np)

    def test_fewer_faces_than_tets(self):
        cp, cv, cid = self._sphere_cells(R=24)
        from actionmesh_tpu.ops.isosurface import marching_cubes

        _, f_mc = marching_cubes(cp, cv, cid, 0.0)
        _, f_mt = iso.marching_tetrahedra(cp, cv, cid, 0.0)
        assert len(f_mc) < 0.45 * len(f_mt)

    def test_hierarchical_default_uses_cubes(self):
        v, f = hierarchical_extract_geometry(
            sphere_sdf, dense_octree_depth=4, hierarchical_octree_depth=6
        )
        v_t, f_t = hierarchical_extract_geometry(
            sphere_sdf, dense_octree_depth=4, hierarchical_octree_depth=6,
            method="tetrahedra",
        )
        assert len(f) < 0.45 * len(f_t)
        np.testing.assert_allclose(
            np.linalg.norm(v, axis=1), 0.6, atol=0.01
        )
        self._check_watertight(v, f)

    def test_random_grids_watertight(self):
        """Ambiguous configurations weld across cells on random fields."""
        rng = np.random.default_rng(0)
        R = 10
        for _ in range(5):
            vals = rng.normal(size=(R, R, R)).astype(np.float32)
            # surface must not touch the boundary: pad outside-positive
            vals[[0, -1], :, :] = 1.0
            vals[:, [0, -1], :] = 1.0
            vals[:, :, [0, -1]] = 1.0
            ax = np.arange(R, dtype=np.float32)
            gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
            pts = np.stack([gx, gy, gz], -1)
            corners = iso._CUBE_CORNERS
            inside = vals < 0
            ci8 = np.stack(
                [inside[dx : R - 1 + dx, dy : R - 1 + dy, dz : R - 1 + dz]
                 for dx, dy, dz in corners], -1,
            )
            keep = ci8.any(-1) & ~ci8.all(-1)
            ci, cj, ck = np.nonzero(keep)
            base = np.stack([ci, cj, ck], -1)
            idx = base[:, None, :] + corners[None]
            flat = idx[..., 0] * R * R + idx[..., 1] * R + idx[..., 2]
            from actionmesh_tpu.ops.mc_table import marching_cubes_cells_numpy

            V, F = marching_cubes_cells_numpy(
                pts.reshape(-1, 3)[flat], vals.reshape(-1)[flat], flat, 0.0
            )
            assert len(F) > 0
            self._check_watertight(V, F)


class TestPrefilterBandPass:
    """Two-level coarse pass (prefilter_octree_depth) == full dense pass.

    For fields smooth at the prefilter cell scale, the depth-P band (with
    1-cell dilation) must contain every dense-depth crossing cell, so the
    extraction is IDENTICAL to the single-level pass."""

    @staticmethod
    def two_lobe_sdf(pts):
        a = np.linalg.norm(pts - np.array([0.25, 0.0, 0.1]), axis=-1) - 0.45
        b = np.linalg.norm(pts + np.array([0.3, 0.2, 0.0]), axis=-1) - 0.3
        return np.minimum(a, b)

    def test_prefilter_matches_full_dense(self):
        kwargs = dict(
            bounds=(-1.0,) * 3 + (1.0,) * 3,
            dense_octree_depth=6, hierarchical_octree_depth=7,
        )
        v_ref, f_ref = hierarchical_extract_geometry(self.two_lobe_sdf, **kwargs)
        v_pre, f_pre = hierarchical_extract_geometry(
            self.two_lobe_sdf, prefilter_octree_depth=4, **kwargs
        )
        assert f_ref.shape == f_pre.shape
        np.testing.assert_array_equal(f_ref, f_pre)
        np.testing.assert_allclose(v_ref, v_pre, atol=1e-6)

    def test_prefilter_sphere_radius(self):
        v, f = hierarchical_extract_geometry(
            sphere_sdf, dense_octree_depth=5, hierarchical_octree_depth=6,
            prefilter_octree_depth=3,
        )
        assert len(f) > 100
        np.testing.assert_allclose(
            np.linalg.norm(v, axis=1), 0.6, atol=0.005
        )

    def test_prefilter_empty_field(self):
        v, f = hierarchical_extract_geometry(
            lambda p: np.full(p.shape[0], 1.0, np.float32),
            dense_octree_depth=5, hierarchical_octree_depth=6,
            prefilter_octree_depth=3,
        )
        assert len(v) == 0 and len(f) == 0
