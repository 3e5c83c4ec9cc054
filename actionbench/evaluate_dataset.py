"""Dataset evaluation CLI: 3D/4D metrics with CSV resume.

Counterpart of reference actionbench/evaluate_dataset.py:47-529. Per-sample
fault isolation, CSV written after every sample, resume-from-CSV with
failed-sample retry, summary JSON.

Usage:
    python -m actionbench.evaluate_dataset \
        --gt_root /path/to/gt --pred_root /path/to/pred \
        --output_csv results.csv

Expected structure:
    GT:   {gt_root}/{uid}/surfaces.npy   (T, N, 6) tracked point clouds
    Pred: {pred_root}/{uid}/mesh_*.glb
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).parent.parent))

from actionbench.benchmark import compute_chamfer_3d_4d
from actionmesh_tpu.io.mesh import Mesh, load_glb
from actionmesh_tpu.io.video_input import natsorted

logging.basicConfig(
    level=logging.INFO, format="%(asctime)s - %(levelname)s - %(message)s"
)
logger = logging.getLogger(__name__)


@dataclass
class SampleResult:
    uid: str
    cd_3d: float = float("nan")
    cd_4d: float = float("nan")
    cd_motion: float = float("nan")
    n_frames: int = 0
    status: str = "pending"
    error_message: str = ""


@dataclass
class DatasetResults:
    samples: list[SampleResult] = field(default_factory=list)

    def add(self, result: SampleResult) -> None:
        self.samples.append(result)

    def to_dataframe(self) -> pd.DataFrame:
        return pd.DataFrame([vars(s) for s in self.samples])

    def summary(self) -> dict:
        df = self.to_dataframe()
        success_df = df[df["status"] == "success"]
        n_total, n_success = len(df), len(success_df)
        summary = {
            "n_total": n_total,
            "n_success": n_success,
            "n_failed": n_total - n_success,
            "success_rate": n_success / n_total if n_total else 0.0,
        }
        for key in ("cd_3d", "cd_4d", "cd_motion"):
            summary[f"{key}_mean"] = (
                float(success_df[key].mean()) if n_success else float("nan")
            )
        return summary


def find_uids(
    gt_root: Path, pred_root: Path, mesh_pattern: str = "mesh_*.glb"
) -> list[str]:
    gt_uids = {p.parent.name for p in gt_root.glob("*/surfaces.npy")}
    pred_uids = {
        p.relative_to(pred_root).parts[0]
        for p in pred_root.glob(f"*/{mesh_pattern}")
    }
    common = gt_uids & pred_uids
    logger.info(
        "Found %d GT, %d pred, %d common", len(gt_uids), len(pred_uids), len(common)
    )
    if not gt_uids:
        raise FileNotFoundError(
            f"No GT samples found in {gt_root}. Expected */surfaces.npy files."
        )
    if not pred_uids:
        raise FileNotFoundError(
            f"No predictions found in {pred_root}. Expected */{mesh_pattern}."
        )
    if not common:
        raise ValueError("No common UIDs between GT and predictions.")
    if gt_uids - pred_uids:
        logger.warning("Missing predictions: %d", len(gt_uids - pred_uids))
    if pred_uids - gt_uids:
        logger.warning("Missing GT: %d", len(pred_uids - gt_uids))
    return sorted(common)


def load_gt_surfaces(gt_path: Path) -> np.ndarray:
    data = np.load(gt_path)
    return np.asarray(data[..., :3], np.float32)


def load_pred_meshes(
    pred_dir: Path, n_frames: int | None = None, pattern: str = "mesh_*.glb"
) -> list[Mesh]:
    mesh_files = natsorted(pred_dir.glob(pattern))
    if not mesh_files:
        raise FileNotFoundError(f"No mesh files found in {pred_dir}")
    if n_frames is not None:
        if len(mesh_files) < n_frames:
            raise ValueError(
                f"Not enough meshes: found {len(mesh_files)}, need {n_frames}"
            )
        mesh_files = mesh_files[:n_frames]
    return [load_glb(p) for p in mesh_files]


def evaluate_sample(
    uid: str,
    gt_root: Path,
    pred_root: Path,
    device: str = "tpu",
    n_pts_icp: int = 10_000,
    n_pts_chamfer: int = 100_000,
    seed: int = 44,
    mesh_pattern: str = "mesh_*.glb",
    is_4d: bool = True,
    icp_iters: int = 200,
    icp_nn_every: int = 1,
) -> SampleResult:
    result = SampleResult(uid=uid)
    try:
        gt_path = gt_root / uid / "surfaces.npy"
        pred_dir = pred_root / uid
        if not gt_path.exists():
            result.status = "error"
            result.error_message = f"GT not found: {gt_path}"
            return result
        if not pred_dir.exists():
            result.status = "error"
            result.error_message = f"Pred dir not found: {pred_dir}"
            return result

        gt_pc = load_gt_surfaces(gt_path)
        result.n_frames = gt_pc.shape[0]
        try:
            pred_meshes = load_pred_meshes(
                pred_dir, n_frames=result.n_frames, pattern=mesh_pattern
            )
        except (FileNotFoundError, ValueError) as e:
            result.status = "error"
            result.error_message = str(e)
            return result

        cd_3d, cd_4d, cd_motion = compute_chamfer_3d_4d(
            gt_pc=gt_pc,
            pred_meshes=pred_meshes,
            device=device,
            is_4D=is_4d,
            n_pts_icp=n_pts_icp,
            n_pts_chamfer=n_pts_chamfer,
            seed=seed,
            icp_iters=icp_iters,
            icp_nn_every=icp_nn_every,
        )
        result.cd_3d, result.cd_4d, result.cd_motion = cd_3d, cd_4d, cd_motion
        result.status = "success"
    except Exception as e:  # per-sample fault isolation
        result.status = "error"
        result.error_message = str(e)
        logger.error("[%s] Error: %s", uid, e)
    return result


def load_existing_results(output_csv: Path) -> dict[str, SampleResult]:
    if not output_csv.exists():
        return {}
    df = pd.read_csv(output_csv)
    results = {}
    for _, row in df.iterrows():
        results[row["uid"]] = SampleResult(
            uid=row["uid"],
            cd_3d=row["cd_3d"],
            cd_4d=row["cd_4d"],
            cd_motion=row["cd_motion"],
            n_frames=row["n_frames"],
            status=row["status"],
            # pandas reads empty cells as float NaN, which is truthy —
            # `or ""` would stringify it to the literal "nan" (r5 review)
            error_message=(
                "" if pd.isna(row.get("error_message"))
                else str(row.get("error_message"))
            ),
        )
    return results


def save_results(results: DatasetResults, output_path: Path) -> None:
    output_path.parent.mkdir(parents=True, exist_ok=True)
    results.to_dataframe().to_csv(output_path, index=False)
    with open(output_path.with_suffix(".summary.json"), "w") as f:
        json.dump(results.summary(), f, indent=2)


def evaluate_dataset(
    gt_root: str,
    pred_root: str,
    output_csv: str | None = None,
    device: str = "tpu",
    n_pts_icp: int = 10_000,
    n_pts_chamfer: int = 100_000,
    seed: int = 44,
    mesh_pattern: str = "mesh_*.glb",
    recompute: bool = False,
    is_4d: bool = True,
    icp_iters: int = 200,
    icp_nn_every: int = 1,
) -> DatasetResults:
    """Evaluate all samples; resumable via the output CSV."""
    gt_root = Path(gt_root)
    pred_root = Path(pred_root)
    output_path = Path(output_csv) if output_csv else None

    uids = find_uids(gt_root, pred_root, mesh_pattern)

    existing: dict[str, SampleResult] = {}
    if output_path and not recompute:
        existing = load_existing_results(output_path)
        if existing:
            n_done = sum(1 for r in existing.values() if r.status == "success")
            logger.info(
                "Loaded %d existing results (%d successful).",
                len(existing), n_done,
            )

    results = DatasetResults()
    for i, uid in enumerate(uids):
        if uid in existing and not recompute:
            prev = existing[uid]
            if prev.status == "success":
                results.add(prev)
                continue
            logger.info("[%s] Retrying previously failed sample", uid)

        logger.info("Evaluating %s (%d/%d)", uid, i + 1, len(uids))
        result = evaluate_sample(
            uid=uid, gt_root=gt_root, pred_root=pred_root, device=device,
            n_pts_icp=n_pts_icp, n_pts_chamfer=n_pts_chamfer, seed=seed,
            mesh_pattern=mesh_pattern, is_4d=is_4d, icp_iters=icp_iters,
            icp_nn_every=icp_nn_every,
        )
        results.add(result)
        if result.status == "success":
            logger.info(
                "[%s] CD_3D=%.3f, CD_4D=%.3f, CD_Motion=%.3f",
                uid, result.cd_3d, result.cd_4d, result.cd_motion,
            )
        if output_path:
            save_results(results, output_path)

    if output_path:
        save_results(results, output_path)
        logger.info("Results saved to: %s", output_path)
    return results


def print_summary(results: DatasetResults) -> None:
    summary = results.summary()
    print("\n" + "=" * 60)
    print("EVALUATION SUMMARY")
    print("=" * 60)
    print("\nSamples:")
    print(f"  Total:   {summary['n_total']}")
    print(f"  Success: {summary['n_success']}")
    print(f"  Failed:  {summary['n_failed']}")
    print(f"  Rate:    {summary['success_rate']:.1%}")
    if summary["n_success"] > 0:
        print("\nMetrics (mean):")
        print(f"  CD_3D:     {summary['cd_3d_mean']:.3f}")
        print(f"  CD_4D:     {summary['cd_4d_mean']:.3f}")
        print(f"  CD_Motion: {summary['cd_motion_mean']:.3f}")
    df = results.to_dataframe()
    failed = df[df["status"] != "success"]
    if len(failed) > 0:
        print(f"\nFailed samples ({len(failed)}):")
        for _, row in failed.iterrows():
            print(f"  [{row['uid']}] {row['status']}: {row['error_message']}")
    print("=" * 60 + "\n")


def main():
    parser = argparse.ArgumentParser(
        description="Evaluate 3D/4D reconstruction metrics across a dataset"
    )
    parser.add_argument("--gt_root", type=str, required=True)
    parser.add_argument("--pred_root", type=str, required=True)
    parser.add_argument("--output_csv", type=str, default=None)
    parser.add_argument("--device", type=str, default="tpu")
    parser.add_argument("--n_pts_icp", type=int, default=10_000)
    parser.add_argument("--n_pts_chamfer", type=int, default=100_000)
    parser.add_argument("--seed", type=int, default=44)
    parser.add_argument("--mesh_pattern", type=str, default="mesh_*.glb")
    parser.add_argument("--recompute", action="store_true")
    parser.add_argument(
        "--3d-only", action="store_true", dest="three_d_only",
        help="Compute 3D metrics only (skip 4D/motion metrics)",
    )
    args = parser.parse_args()

    results = evaluate_dataset(
        gt_root=args.gt_root,
        pred_root=args.pred_root,
        output_csv=args.output_csv,
        device=args.device,
        n_pts_icp=args.n_pts_icp,
        n_pts_chamfer=args.n_pts_chamfer,
        seed=args.seed,
        mesh_pattern=args.mesh_pattern,
        recompute=args.recompute,
        is_4d=not args.three_d_only,
    )
    print_summary(results)


if __name__ == "__main__":
    main()
