"""ActionBench metric tests: ICP recovery, chamfer correctness, e2e eval."""

import jax.numpy as jnp
import numpy as np
import pytest

from actionbench.chamfer import (
    compute_chamfer_score,
    compute_motion_chamfer_score,
)
from actionbench.icp import (
    canonical_rotation_matrices,
    gradient_icp,
    rotation_6d_to_matrix,
)
from actionbench.sample_mesh import sample_meshes
from actionbench.sample_point_cloud import sample_point_cloud


class TestChamfer:
    def test_identical_clouds_zero(self):
        pts = np.random.default_rng(0).normal(size=(500, 3))
        assert compute_chamfer_score(pts, pts) == pytest.approx(0.0, abs=1e-9)

    def test_known_offset(self):
        pts = np.random.default_rng(0).uniform(-1, 1, size=(2000, 3))
        shifted = pts + np.array([10.0, 0, 0])  # far beyond cloud extent
        cd = compute_chamfer_score(shifted, pts, n=0)
        assert 9.0 < cd / 2 < 11.0

    def test_motion_chamfer_tracks_correspondence(self):
        rng = np.random.default_rng(1)
        base = rng.uniform(-1, 1, size=(300, 3))
        t = np.linspace(0, 1, 5)[:, None, None]
        gts = base[None] + t * np.array([1.0, 0, 0])
        # pred = same motion, same points (permuted order)
        perm = rng.permutation(300)
        preds = gts[:, perm]
        assert compute_motion_chamfer_score(preds, gts) == pytest.approx(
            0.0, abs=1e-6
        )

    def test_motion_chamfer_detects_wrong_motion(self):
        rng = np.random.default_rng(1)
        base = rng.uniform(-1, 1, size=(300, 3))
        t = np.linspace(0, 1, 5)[:, None, None]
        gts = base[None] + t * np.array([1.0, 0, 0])
        preds = np.broadcast_to(base[None], gts.shape).copy()  # static pred
        assert compute_motion_chamfer_score(preds, gts) > 0.5


class TestICP:
    def test_canonical_rotations_valid(self):
        R = canonical_rotation_matrices()
        assert R.shape == (24, 3, 3)
        eye = np.einsum("kij,kil->kjl", R, R)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (24, 1, 1)), atol=1e-6)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-6)
        # The reference's formula yields 22 distinct orientations (gimbal
        # lock at elev=+-90 makes azim/roll degenerate for 2 pairs) — we
        # reproduce that faithfully.
        flat = np.round(R.reshape(24, -1), 4)
        assert len(np.unique(flat, axis=0)) == 22

    def test_rotation_6d_identity(self):
        import jax.numpy as jnp

        r = rotation_6d_to_matrix(jnp.array([[1.0, 0, 0, 0, 1.0, 0]]))
        np.testing.assert_allclose(np.asarray(r[0]), np.eye(3), atol=1e-6)

    @pytest.mark.slow
    def test_icp_recovers_rigid_transform(self):
        rng = np.random.default_rng(0)
        gt = rng.uniform(-1, 1, size=(400, 3)).astype(np.float32)
        # apply known rotation + translation + scale to build pred
        theta = 0.7
        R_true = np.array(
            [
                [np.cos(theta), -np.sin(theta), 0],
                [np.sin(theta), np.cos(theta), 0],
                [0, 0, 1],
            ]
        )
        pred = (gt @ R_true.T) * 0.5 + np.array([0.3, -0.2, 0.1])
        transform = gradient_icp(
            pc_pred=pred.astype(np.float32), pc_gt=gt, n_iter=300
        )
        aligned = transform.transform_points(pred[None])[0]
        err = compute_chamfer_score(aligned, gt, n=0)
        assert err < 0.05

    @pytest.mark.slow
    def test_icp_handles_flipped_orientation(self):
        """180-degree flip requires the canonical-rotation restarts."""
        rng = np.random.default_rng(3)
        gt = rng.uniform(-1, 1, size=(256, 3)).astype(np.float32)
        gt[:, 0] *= 2.0  # break symmetry
        R_flip = np.diag([-1.0, -1.0, 1.0])  # 180 deg about z
        pred = gt @ R_flip.T
        transform = gradient_icp(pc_pred=pred.astype(np.float32), pc_gt=gt, n_iter=150)
        aligned = transform.transform_points(pred[None])[0]
        assert compute_chamfer_score(aligned, gt, n=0) < 0.05


class TestSampling:
    def test_sample_point_cloud_shared_permutation(self):
        pc = np.arange(3 * 100 * 3, dtype=np.float64).reshape(3, 100, 3)
        out = sample_point_cloud(pc, 10, seed=1)
        assert out.shape == (3, 10, 3)
        # same indices across frames: frame deltas preserved
        np.testing.assert_allclose(out[1] - out[0], 300.0)

    def test_sample_meshes_synchronized(self):
        from actionmesh_tpu.models.stage0 import make_uv_sphere

        m0 = make_uv_sphere(n_lat=8, n_lon=12)
        m1 = make_uv_sphere(n_lat=8, n_lon=12)
        m1.vertices = m1.vertices * 1.5  # scaled copy, same topology
        pts = sample_meshes([m0, m1], n_pts=500, synchronized=True, seed=2)
        assert pts.shape == (2, 500, 3)
        np.testing.assert_allclose(pts[1], pts[0] * 1.5, atol=1e-6)

    def test_sample_meshes_independent_seeds(self):
        from actionmesh_tpu.models.stage0 import make_uv_sphere

        m = make_uv_sphere(n_lat=8, n_lon=12)
        pts = sample_meshes([m, m], n_pts=200, synchronized=False, seed=2)
        assert not np.allclose(pts[0], pts[1])


class TestEvaluateDataset:
    def test_e2e_eval_with_resume(self, tmp_path):
        from actionbench.evaluate_dataset import evaluate_dataset
        from actionmesh_tpu.models.stage0 import make_uv_sphere

        # build a tiny fake dataset: GT = sphere samples, pred = same sphere
        gt_root = tmp_path / "gt"
        pred_root = tmp_path / "pred"
        mesh = make_uv_sphere(n_lat=12, n_lon=16)
        pts = sample_meshes([mesh] * 3, n_pts=2000, seed=0)
        (gt_root / "sample1").mkdir(parents=True)
        np.save(gt_root / "sample1" / "surfaces.npy", pts)
        (pred_root / "sample1").mkdir(parents=True)
        for i in range(3):
            mesh.export(pred_root / "sample1" / f"mesh_{i:02d}.glb")

        csv = tmp_path / "results.csv"
        results = evaluate_dataset(
            gt_root=str(gt_root),
            pred_root=str(pred_root),
            output_csv=str(csv),
            n_pts_icp=256,
            n_pts_chamfer=2000,
            is_4d=True,
            icp_iters=60,
        )
        summary = results.summary()
        assert summary["n_success"] == 1
        # prediction == GT geometry -> tiny chamfer after ICP
        assert summary["cd_3d_mean"] < 0.1
        assert summary["cd_4d_mean"] < 0.1
        assert csv.exists() and csv.with_suffix(".summary.json").exists()

        # resume: loads from CSV without recompute
        results2 = evaluate_dataset(
            gt_root=str(gt_root),
            pred_root=str(pred_root),
            output_csv=str(csv),
            n_pts_icp=256,
            n_pts_chamfer=2000,
        )
        assert results2.summary()["n_success"] == 1


class TestNNArgmin:
    """Pallas fused distance+argmin kernel (ops/nn_argmin.py)."""

    def test_matches_bruteforce(self):
        from actionmesh_tpu.ops.nn_argmin import nn_argmin

        rng = np.random.default_rng(5)
        x = rng.normal(size=(2, 300, 3)).astype(np.float32)
        y = rng.normal(size=(2, 450, 3)).astype(np.float32)
        idx = np.asarray(nn_argmin(jnp.asarray(x), jnp.asarray(y)))
        for r in range(2):
            d = ((x[r][:, None] - y[r][None]) ** 2).sum(-1)
            np.testing.assert_array_equal(idx[r], np.argmin(d, axis=1))

    def test_matches_icp_scan_path(self):
        """Kernel and the XLA scan fallback agree on the ICP shapes."""
        from actionmesh_tpu.ops.nn_argmin import nn_argmin
        from actionbench.icp import _nn_indices

        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.normal(size=(4, 512, 3)).astype(np.float32))
        y = jnp.asarray(rng.normal(size=(4, 384, 3)).astype(np.float32))
        a = np.asarray(nn_argmin(x, y))
        b = np.asarray(_nn_indices(x, y, chunk=128))
        np.testing.assert_array_equal(a, b)
