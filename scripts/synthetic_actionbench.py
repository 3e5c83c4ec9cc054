"""Synthetic ActionBench suite: GT-vs-perturbed-GT through the full evaluator.

Real ActionBench data (facebook/actionbench, 128 samples) needs network
egress this environment doesn't have. This script validates the metric
stack END-TO-END instead — dataset layout, evaluate_dataset CSV/resume,
synchronized sampling, gradient ICP, chamfer/motion-chamfer — on animated
meshes with *known* ground truth and perturbations with *known* expected
behavior:

  identity       pred == GT mesh             -> CD at the sampling floor
  rigid          fixed rot+aniso-scale+shift -> ICP must undo it (near floor)
  noise_XX       vertex jitter sigma=0.0XX   -> CD grows monotonically with sigma

Writes {out}/gt/{uid}/surfaces.npy + {out}/pred/{uid}/mesh_*.glb, runs
evaluate_dataset, and saves ACTIONBENCH_SYNTH.json with per-class results.

Usage: python scripts/synthetic_actionbench.py [--out /tmp/ab_synth] [--frames 16]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from actionmesh_tpu.io.mesh import Mesh
from actionmesh_tpu.models.stage0 import make_uv_sphere


def _rot(axis: np.ndarray, angle: float) -> np.ndarray:
    axis = axis / np.linalg.norm(axis)
    K = np.array(
        [
            [0, -axis[2], axis[1]],
            [axis[2], 0, -axis[0]],
            [-axis[1], axis[0], 0],
        ]
    )
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)


def animated_mesh_sequence(uid_seed: int, n_frames: int) -> list[Mesh]:
    """Deforming blob: asymmetric harmonic bumps + bend + slow rigid motion.

    Deliberately ASYMMETRIC (mixed 2/3/5-fold harmonics on distinct axes,
    anisotropic base) so ICP has a unique global alignment — a symmetric
    fixture lets frame-0 ICP pick a symmetry-equivalent rotation that is
    correct for frame 0 but wrong for later bent frames, inflating CD-4D
    for reasons that are a property of the shape, not the metric.
    """
    rng = np.random.default_rng(uid_seed)
    base = make_uv_sphere(n_lat=48, n_lon=64)
    v0 = base.vertices * (np.array([0.7, 0.5, 0.6]) + 0.1 * rng.random(3))
    phase = rng.random(3) * 2 * np.pi
    axis = rng.normal(size=3)
    meshes = []
    for t in range(n_frames):
        a = t / max(n_frames - 1, 1)
        # non-rigid: mixed-order harmonics, no rotational symmetry
        th = np.arctan2(v0[:, 1], v0[:, 0])
        ph = np.arctan2(v0[:, 2], np.linalg.norm(v0[:, :2], axis=1))
        bump = (
            0.10 * np.sin(3 * th + phase[0] + 2 * np.pi * a)
            + 0.06 * np.sin(2 * ph + phase[1] + 4 * np.pi * a)
            + 0.04 * np.sin(5 * th + 3 * ph + phase[2])
        )
        verts = v0 * (1 + bump[:, None])
        # bend: x-dependent rotation about z
        ang = 0.5 * a * verts[:, 0]
        ca, sa = np.cos(ang), np.sin(ang)
        verts = np.stack(
            [verts[:, 0], ca * verts[:, 1] - sa * verts[:, 2], sa * verts[:, 1] + ca * verts[:, 2]],
            axis=1,
        )
        # slow rigid drift
        verts = verts @ _rot(axis, 0.3 * a).T + np.array([0.1 * a, 0.05 * a, 0.0])
        meshes.append(Mesh(verts, base.faces.copy()))
    return meshes


def tracked_gt_points(meshes: list[Mesh], n_pts: int, seed: int) -> np.ndarray:
    """(T, n_pts, 6) tracked surface points: frame-0 barycentrics replayed."""
    rng = np.random.default_rng(seed)
    m0 = meshes[0]
    fn, areas = m0.face_normals_and_areas()
    cdf = np.cumsum(areas) / areas.sum()
    face_ids = np.searchsorted(cdf, rng.random(n_pts))
    u, v = rng.random(n_pts), rng.random(n_pts)
    flip = u + v > 1
    u[flip], v[flip] = 1 - u[flip], 1 - v[flip]
    w = 1 - u - v
    out = []
    for m in meshes:
        tri = m.vertices[m.faces[face_ids]]  # (n, 3, 3)
        pts = u[:, None] * tri[:, 0] + v[:, None] * tri[:, 1] + w[:, None] * tri[:, 2]
        nrm, _ = m.face_normals_and_areas()
        out.append(np.concatenate([pts, nrm[face_ids]], axis=1))
    return np.stack(out).astype(np.float32)


PERTURBATIONS = {
    "identity": lambda meshes, rng: meshes,
    "rigid": lambda meshes, rng: _perturb_rigid(meshes, rng),
    "noise_02": lambda meshes, rng: _perturb_noise(meshes, rng, 0.02),
    "noise_05": lambda meshes, rng: _perturb_noise(meshes, rng, 0.05),
}


def _perturb_rigid(meshes, rng):
    """Rotate, THEN scale, then translate — the inverse lives inside the
    ICP's alignment family ``s * p @ R + T`` (scale-first; identical to the
    reference's Transform3d Scale∘Rotate∘Translate). A scale-before-rotation
    perturbation is NOT exactly invertible in that family and leaves an
    irreducible ~0.03 chamfer residual (measured) — a fixture property, not
    an ICP defect."""
    R = _rot(rng.normal(size=3), 0.6)
    scale = np.array([1.15, 0.9, 1.05])
    t = np.array([0.3, -0.2, 0.15])
    return [Mesh((m.vertices @ R) * scale + t, m.faces.copy()) for m in meshes]


def _perturb_noise(meshes, rng, sigma):
    return [
        Mesh(m.vertices + rng.normal(0, sigma, m.vertices.shape), m.faces.copy())
        for m in meshes
    ]


def build_dataset(
    out: Path, n_frames: int, n_pts_gt: int = 50_000, per_kind: int = 2
) -> list[str]:
    uids = []
    for i, (kind, perturb) in enumerate(PERTURBATIONS.items()):
        for rep in range(per_kind):
            uid = f"{kind}_{rep}"
            seed = 1000 * i + rep
            meshes = animated_mesh_sequence(seed, n_frames)
            gt = tracked_gt_points(meshes, n_pts_gt, seed=seed + 7)
            gt_dir = out / "gt" / uid
            gt_dir.mkdir(parents=True, exist_ok=True)
            np.save(gt_dir / "surfaces.npy", gt)
            pred_dir = out / "pred" / uid
            pred_dir.mkdir(parents=True, exist_ok=True)
            rng = np.random.default_rng(seed + 13)
            for t, m in enumerate(perturb(meshes, rng)):
                m.export(pred_dir / f"mesh_{t:02d}.glb")
            uids.append(uid)
    return uids


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="/tmp/ab_synth")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--icp-iters", type=int, default=200)
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--per-kind", type=int, default=2,
                    help="samples per perturbation class")
    ap.add_argument("--nn-every", type=int, default=4,
                    help="ICP NN refresh interval; 1 = reference exact-min")
    ap.add_argument("--report-name", type=str, default="ACTIONBENCH_SYNTH.json")
    args = ap.parse_args()

    out = Path(args.out)
    t0 = time.time()
    if not args.skip_build:
        uids = build_dataset(out, args.frames, per_kind=args.per_kind)
        print(f"built {len(uids)} samples in {time.time() - t0:.0f}s")

    from actionbench.evaluate_dataset import evaluate_dataset

    results = evaluate_dataset(
        gt_root=str(out / "gt"),
        pred_root=str(out / "pred"),
        output_csv=str(out / f"results_nn{args.nn_every}.csv"),
        icp_iters=args.icp_iters,
        icp_nn_every=args.nn_every,
    )
    df = results.to_dataframe()
    df["kind"] = df["uid"].str.rsplit("_", n=1).str[0]
    by_kind = (
        df[df["status"] == "success"]
        .groupby("kind")[["cd_3d", "cd_4d", "cd_motion"]]
        .mean()
    )
    print(by_kind)

    report = {
        "n_samples": len(df),
        "n_success": int((df["status"] == "success").sum()),
        "per_kind": {
            k: {m: float(v[m]) for m in ("cd_3d", "cd_4d", "cd_motion")}
            for k, v in by_kind.iterrows()
        },
        "wall_seconds": time.time() - t0,
    }
    # Sanity ordering: identity <= rigid << noise_02 < noise_05
    pk = report["per_kind"]
    checks = {
        "rigid_recovered": pk["rigid"]["cd_3d"] < 2 * pk["identity"]["cd_3d"] + 0.01,
        "noise_monotonic": pk["identity"]["cd_3d"]
        < pk["noise_02"]["cd_3d"]
        < pk["noise_05"]["cd_3d"],
    }
    report["icp_nn_every"] = args.nn_every
    report["checks"] = checks
    path = Path(__file__).resolve().parent.parent / args.report_name
    path.write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))
    assert all(checks.values()), f"metric-stack sanity failed: {checks}"


if __name__ == "__main__":
    main()
