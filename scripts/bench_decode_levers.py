"""Measure the SDF decode speed levers at production shape on the real chip.

Round-4 verdict item 3: the ~10 s "SDF grid decode + extraction" residual
appears in every preset. Two opt-in levers landed in round 5:

  * ``coarse_decode_dtype="bfloat16"`` — coarse sign pass in bf16
    (models/triposg/vae._query_core; fine pass stays fp32);
  * ``prefilter_octree_depth=6`` — two-level coarse pass
    (ops/isosurface.py): a 65^3 sign grid locates the surface band, only
    the dilated band subdivides to the dense depth (17M -> ~1M dense
    queries).

This script times ``decode_latents`` (decode_kv .. marching cubes, the
whole latent->mesh path) warm for each knob combination on the dev-mode
production-shape pipeline (random weights + dev regularizer => realistic
~1M-face surface), and sanity-checks that the extracted surfaces agree.

Usage: python scripts/bench_decode_levers.py [--reps 2] [--out JSON]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--dense", type=int, default=8)
    ap.add_argument("--hier", type=int, default=9)
    ap.add_argument("--prefilter", type=int, default=6)
    ap.add_argument("--out", default="DECODE_LEVERS.json")
    args = ap.parse_args()

    import jax

    from actionmesh_tpu.models.stage0 import DevTripoSG

    dev = DevTripoSG()
    pipe = dev.pipeline
    latents = jax.random.normal(
        jax.random.PRNGKey(7),
        (1, pipe.vae_cfg.num_tokens, pipe.vae_cfg.latent_channels),
        pipe._dtype,
    )

    variants = {
        "baseline_fp32": {},
        "bf16_coarse": {"coarse_decode_dtype": "bfloat16"},
        "prefilter": {"prefilter_octree_depth": args.prefilter},
        "prefilter_bf16": {
            "prefilter_octree_depth": args.prefilter,
            "coarse_decode_dtype": "bfloat16",
        },
    }
    results = {}
    meshes = {}
    for name, kw in variants.items():
        times = []
        for rep in range(args.reps):
            t0 = time.perf_counter()
            m = pipe.decode_latents(
                latents,
                dense_octree_depth=args.dense,
                hierarchical_octree_depth=args.hier,
                **kw,
            )[0]
            times.append(time.perf_counter() - t0)
        meshes[name] = m
        results[name] = {
            "cold_s": round(times[0], 2),
            "warm_s": round(min(times[1:]) if len(times) > 1 else times[0], 2),
            "n_vertices": int(len(m.vertices)),
            "n_faces": int(len(m.faces)),
            **kw,
        }
        print(f"{name:16s} warm {results[name]['warm_s']:6.2f} s  "
              f"faces {results[name]['n_faces']}")

    # agreement: surfaces should be near-identical (bf16 flips signs only
    # in the near-zero band; prefilter is exact for smooth fields)
    ref = meshes["baseline_fp32"]
    for name, m in meshes.items():
        if name == "baseline_fp32" or len(m.vertices) == 0:
            continue
        # nearest-vertex distance from a 5k sample (cheap agreement proxy)
        rng = np.random.default_rng(0)
        idx = rng.choice(len(m.vertices), min(5000, len(m.vertices)), False)
        from scipy.spatial import cKDTree

        d, _ = cKDTree(ref.vertices).query(m.vertices[idx], k=1)
        results[name]["agreement_p99_dist"] = float(np.percentile(d, 99))
        results[name]["face_count_ratio"] = round(
            len(m.faces) / max(len(ref.faces), 1), 4
        )

    Path(args.out).write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
