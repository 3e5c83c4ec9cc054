"""ActionBench real-layout dry run (round-4 verdict item 6).

Synthesizes a byte-layout clone of the HF ``facebook/actionbench`` dataset
directory structure — ``<root>/actionbench/data/{uid}/`` holding
``surfaces.npy`` (T, V, 6) tracked point clouds AND the sample's 16 RGBA
video frames side by side (ref:actionbench/README.md:13-25) — then runs
the evaluation exactly as the reference documents it
(ref:actionbench/README.md:40-56):

  1. predictions/{uid}/mesh_%02d.glb produced per sample —
     ``--pred pipeline`` (default) drives the REAL video->4D pipeline,
     loading frames from the HF sample dir through the PRODUCTION loader
     (io.video_input.load_frames on the sample directory, which must
     ignore surfaces.npy and natsort the PNGs);
     ``--pred gt`` exports meshes reconstructed from the scene itself
     (identity floor; validates layout + evaluator alone).
  2. ``actionbench/evaluate_dataset.py`` invoked UNMODIFIED as a CLI
     subprocess with ``--gt_root <root>/actionbench/data`` — so day-one
     real evaluation is literally a path change.

Writes ACTIONBENCH_HF_DRYRUN.json at the repo root.

Usage:
  python scripts/actionbench_hf_dryrun.py [--out /root/repo/experiments/ab_hf]
      [--n 4] [--pred pipeline|gt]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


def build_hf_clone(root: Path, n_samples: int, seed: int, spec) -> list[str]:
    """<root>/actionbench/data/{uid}/{surfaces.npy, rgba_%02d.png}."""
    from actionmesh_tpu.io.mesh import Mesh
    from actionmesh_tpu.preprocessing.mesh import normalize_mesh
    from actionmesh_tpu.training.closed_loop import (
        make_scene,
        render_frames,
        tracked_points,
    )

    data = root / "actionbench" / "data"
    uids = []
    for i in range(n_samples):
        uid = f"objaverse_{seed:03d}{i:04d}"  # opaque uid, like the HF set
        scene_seed = seed * 100_003 + i
        meshes = make_scene(scene_seed, spec)
        _, center, factor = normalize_mesh(meshes[0])
        normed = [Mesh((m.vertices - center) * factor, m.faces) for m in meshes]
        d = data / uid
        d.mkdir(parents=True, exist_ok=True)
        np.save(
            d / "surfaces.npy",
            tracked_points(meshes, 4096, seed=scene_seed + 7).astype(
                np.float32
            ),
        )
        for t, fr in enumerate(render_frames(normed, spec)):
            fr.save(d / f"rgba_{t:02d}.png")
        uids.append(uid)
    return uids


def predict_gt(root: Path, uids: list[str], seed: int, spec) -> Path:
    """Identity-floor predictions: the scene meshes themselves."""
    from actionmesh_tpu.training.closed_loop import make_scene

    pred_root = root / "predictions"
    for i, uid in enumerate(uids):
        meshes = make_scene(seed * 100_003 + i, spec)
        d = pred_root / uid
        d.mkdir(parents=True, exist_ok=True)
        for t, m in enumerate(meshes):
            m.export(d / f"mesh_{t:02d}.glb")
    return pred_root


def predict_pipeline(root: Path, uids: list[str], seed: int, spec) -> Path:
    """REAL video->4D pipeline over the HF sample dirs.

    Frames come through the production auto-dispatch loader pointed at the
    sample DIRECTORY (surfaces.npy must be ignored, rgba_*.png natsorted) —
    exactly how a user will point the CLI at a downloaded sample.
    """
    from actionmesh_tpu.io.video_input import load_frames
    from actionmesh_tpu.training.closed_loop import make_pipeline

    pipe = make_pipeline(spec, video_mode=True)
    pred_root = root / "predictions"
    for uid in uids:
        video = load_frames(root / "actionbench" / "data" / uid)
        assert video.n_frames == spec.n_frames, (
            f"{uid}: loader found {video.n_frames} frames, expected "
            f"{spec.n_frames} — surfaces.npy must not be picked up"
        )
        meshes = pipe(video, seed=seed)
        d = pred_root / uid
        d.mkdir(parents=True, exist_ok=True)
        for t, m in enumerate(meshes):
            m.export(d / f"mesh_{t:02d}.glb")
    return pred_root


def run_evaluator_cli(root: Path, pred_root: Path, device: str) -> dict:
    """The reference's documented invocation, byte-for-byte flag surface."""
    csv = root / "results.csv"
    cmd = [
        sys.executable, str(REPO / "actionbench" / "evaluate_dataset.py"),
        "--pred_root", str(pred_root),
        "--gt_root", str(root / "actionbench" / "data"),
        "--output_csv", str(csv),
        "--device", device,
        "--n_pts_icp", "2048",
        "--n_pts_chamfer", "4096",
    ]
    import os

    env = dict(os.environ)
    if device == "cpu":
        env["JAX_PLATFORM_NAME"] = "cpu"
        env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        cmd, capture_output=True, text=True, cwd=str(REPO), env=env
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"evaluate_dataset.py CLI failed rc={proc.returncode}:\n"
            f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
        )
    summary = json.loads((csv.with_suffix(".summary.json")).read_text())
    return summary


def main() -> None:
    from actionmesh_tpu.training.closed_loop import CascadeSpec

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(REPO / "experiments" / "ab_hf"))
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--pred", choices=["pipeline", "gt"], default="pipeline")
    ap.add_argument("--device", default="tpu",
                    help="evaluator device; pass cpu if the chip is busy")
    ap.add_argument("--report", default=str(REPO / "ACTIONBENCH_HF_DRYRUN.json"))
    args = ap.parse_args()

    spec = CascadeSpec()
    root = Path(args.out)
    t0 = time.time()
    uids = build_hf_clone(root, args.n, args.seed, spec)
    predict = predict_gt if args.pred == "gt" else predict_pipeline
    pred_root = predict(root, uids, args.seed, spec)
    summary = run_evaluator_cli(root, pred_root, args.device)
    report = {
        "layout": "actionbench/data/{uid}/{surfaces.npy, rgba_%02d.png}",
        "n_samples": args.n,
        "pred_mode": args.pred,
        "evaluator": "actionbench/evaluate_dataset.py CLI, unmodified",
        "summary": summary,
        "seconds": round(time.time() - t0, 1),
    }
    Path(args.report).write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
