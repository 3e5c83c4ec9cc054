"""A/B the default SDF-decode prefilter inside the turbo e2e path.

r5 follow-up: DECODE_LEVERS.json measured the two-level prefilter at
9.6 -> 5.5 s warm on the isolated latent->mesh micro-bench, but the first
turbo e2e re-measure after making it the default came out 30.7 s warm vs
r4l's 27.1 s. This drives the SAME turbo pipeline twice in one process —
prefilter ON (preset default) and OFF (override to null) — with per-phase
INFO timing (pipeline.__call__) and two warm passes each, so regression
vs variance vs a real prefilter cost in the e2e path is decided by
measurement, not inference.

Run on the real chip: python scripts/ab_prefilter_turbo.py
"""

from __future__ import annotations

import json
import logging
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

logging.basicConfig(level=logging.INFO, format="%(message)s")


def main() -> None:
    from actionmesh_tpu.io.video_input import load_frames
    from actionmesh_tpu.pipeline import ActionMeshPipeline

    inp = load_frames("/root/reference/assets/examples/davis_camel", max_frames=16)
    results = {}
    for label, updates in (
        ("prefilter_on", None),
        ("prefilter_off", {"stage_0.prefilter_octree_depth": None,
                           "stage_0.coarse_decode_dtype": None}),
    ):
        pipe = ActionMeshPipeline(
            config_name="actionmesh_turbo", weights_dir=None,
            config_updates=updates,
        )
        times = []
        for run in ("cold", "warm1", "warm2"):
            t0 = time.perf_counter()
            meshes = pipe(inp, seed=42)
            dt = round(time.perf_counter() - t0, 1)
            times.append(dt)
            print(f"== {label} {run}: {dt}s ({len(meshes)} meshes)", flush=True)
        results[label] = {"cold_s": times[0], "warm_s": times[1:]}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
