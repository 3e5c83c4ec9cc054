"""Measure the DEFAULT-preset end-to-end wall clock with the real TripoSG
Stage 0 in the path (no stub anywhere; random weights, dev SDF regularizer).

Round-3 follow-up to BENCH_NOTES r3b: the r3b e2e drive used
stage_1_steps=4 to bound wall-clock while validating the Stage-0 path;
this script runs the production default (30 Stage-I steps per window,
reference inference/video_to_animated_mesh.py defaults) twice in one
process — cold (includes compile/cache-deserialize + weight upload through
the tunnel) and warm (steady-state serving cost) — and prints a per-stage
breakdown from wall-clock deltas around each pipeline phase.

Usage:  python scripts/e2e_default_timing.py [--frames 16] [--steps 30]
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# per-phase breakdown comes from the pipeline's own INFO timing logs
# (pipeline.__call__ / triposg pipeline.__call__)
logging.basicConfig(level=logging.INFO, format="%(message)s")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--preset", default="actionmesh")
    ap.add_argument("--steps", type=int, default=None, help="override stage_1_steps (default: preset value)")
    ap.add_argument(
        "--video", type=str,
        default="/root/reference/assets/examples/davis_camel",
    )
    ap.add_argument(
        "--set", action="append", default=[], metavar="KEY=VALUE",
        help="dotted config override, e.g. stage_0.num_inference_steps=50",
    )
    args = ap.parse_args()

    import numpy as np

    from actionmesh_tpu.io.video_input import load_frames
    from actionmesh_tpu.pipeline import ActionMeshPipeline

    inp = load_frames(args.video, max_frames=args.frames)
    updates = {}
    for kv in args.set:
        key, _, raw = kv.partition("=")
        updates[key] = json.loads(raw)
    pipe = ActionMeshPipeline(
        config_name=args.preset, weights_dir=None,
        config_updates=updates or None,
    )

    results = {}
    for label in ("cold", "warm"):
        t0 = time.perf_counter()
        kw = {} if args.steps is None else {"stage_1_steps": args.steps}
        meshes = pipe(inp, seed=42, **kw)
        results[label] = round(time.perf_counter() - t0, 1)
        assert len(meshes) == min(args.frames, 16) or len(meshes) > 0
        V = np.stack([m.vertices for m in meshes])
        assert np.isfinite(V).all()

    print(json.dumps({
        "metric": f"e2e_{args.preset}_seconds",
        "frames": args.frames,
        "stage_1_steps": args.steps,
        "overrides": updates,
        "stage0": "real TripoSG (random weights, dev regularizer)",
        "cold_s": results["cold"],
        "warm_s": results["warm"],
    }))


if __name__ == "__main__":
    main()
