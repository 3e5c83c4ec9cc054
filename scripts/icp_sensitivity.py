"""ICP convergence sensitivity at the reference's operating point.

The reference aligns with Adam lr=0.01 x 200 iters over 24 rotation inits
(ref:actionbench/icp.py:85-106). Round-2/3 probes suggested that operating
point may sit in a NON-converged regime on rigid cases, where small
implementation deltas (init order, lr schedule, precision) move metric
values. This study quantifies it through the REAL metric path
(actionbench/benchmark.compute_chamfer_3d_4d): CD-3D on the rigid
synthetic class across an iters x lr grid, with the identity class as the
sampling floor.

Writes ICP_SENSITIVITY.json at the repo root.

Usage: python scripts/icp_sensitivity.py [--frames 4] [--samples 3]
"""

from __future__ import annotations

import argparse
import itertools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4,
                    help="frames per sample (CD-3D is per-frame; 4 is enough)")
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--n-pts-icp", type=int, default=5000)
    ap.add_argument("--n-pts-chamfer", type=int, default=30000)
    ap.add_argument("--iters", type=int, nargs="+",
                    default=[100, 200, 300, 400])
    ap.add_argument("--lrs", type=float, nargs="+",
                    default=[0.005, 0.01, 0.02])
    args = ap.parse_args()

    # reuse the validated synthetic fixture family
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from synthetic_actionbench import (
        _perturb_rigid,
        animated_mesh_sequence,
        tracked_gt_points,
    )

    from actionbench.benchmark import compute_chamfer_3d_4d

    cases = []
    for s in range(args.samples):
        meshes = animated_mesh_sequence(1000 + s, args.frames)
        gt = tracked_gt_points(meshes, 50_000, seed=s + 7)[..., :3]
        rng = np.random.default_rng(s + 13)
        cases.append((gt, _perturb_rigid(meshes, rng), meshes))

    grid: dict[str, dict] = {}
    t_all = time.time()
    for n_iter, lr in itertools.product(args.iters, args.lrs):
        t0 = time.time()
        cds_rigid = []
        for gt, rigid_meshes, _ in cases:
            cd3d, _, _ = compute_chamfer_3d_4d(
                gt, rigid_meshes, is_4D=False,
                n_pts_icp=args.n_pts_icp, n_pts_chamfer=args.n_pts_chamfer,
                icp_iters=n_iter, icp_lr=lr,
            )
            cds_rigid.append(cd3d)
        key = f"iters{n_iter}_lr{lr}"
        grid[key] = {
            "iters": n_iter,
            "lr": lr,
            "cd3d_rigid_mean": float(np.mean(cds_rigid)),
            "cd3d_rigid_max": float(np.max(cds_rigid)),
            "seconds": round(time.time() - t0, 1),
        }
        print(key, grid[key], flush=True)

    # identity floor (ICP-independent up to convergence; one setting)
    floor = []
    for gt, _, id_meshes in cases:
        cd3d, _, _ = compute_chamfer_3d_4d(
            gt, id_meshes, is_4D=False,
            n_pts_icp=args.n_pts_icp, n_pts_chamfer=args.n_pts_chamfer,
            icp_iters=200, icp_lr=0.01,
        )
        floor.append(cd3d)

    ref_key = "iters200_lr0.01"
    best = min(grid.values(), key=lambda g: g["cd3d_rigid_mean"])
    report = {
        "operating_point_reference": grid.get(ref_key),
        "best_setting": best,
        "identity_floor_cd3d": float(np.mean(floor)),
        "grid": grid,
        "converged_at_reference_point": bool(
            grid[ref_key]["cd3d_rigid_mean"]
            < 1.5 * best["cd3d_rigid_mean"] + 0.005
        ),
        "wall_seconds": round(time.time() - t_all, 1),
        "config": vars(args),
    }
    out = Path(__file__).resolve().parent.parent / "ICP_SENSITIVITY.json"
    out.write_text(json.dumps(report, indent=2))
    print("wrote", out)


if __name__ == "__main__":
    main()
