"""Break down the Stage-0 (TripoSG) budget on the real chip.

The default-preset e2e (scripts/e2e_default_timing.py, BENCH_NOTES r3c)
attributes ~30 s of the 149.8 s warm wall clock to Stage 0: ~10.4 s DiT
sampling + ~20 s "SDF decode / extraction / QEM".  This script splits that
~20 s into its actual parts so optimization targets the real cost:

  * decode_kv            — 16-layer self-attn stack over the 2048-token set
  * coarse SDF eval      — 257^3 = 16.97M queries in 65 chunks (TPU)
  * crossing-cell detect — numpy uint8 accumulation (host)
  * fine SDF eval        — unique fine corners of crossing cells (TPU)
  * native extraction    — C++ marching-cubes over fine lattices (host)
  * QEM + mesh process   — C++ simplification + normalize (host)

Run it twice in-process: cold (compile) and warm (steady state).

Usage:  python scripts/profile_stage0.py [--repeat 2]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--dense", type=int, default=8)
    ap.add_argument("--hier", type=int, default=9)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from actionmesh_tpu.models.stage0 import DevTripoSG, _dev_sdf_regularizer
    from actionmesh_tpu.models.triposg.vae import decode_kv, query_sdf
    from actionmesh_tpu.ops import isosurface
    from actionmesh_tpu.preprocessing.mesh import MeshPostprocessor
    from actionmesh_tpu.utils import device_sync

    dev = DevTripoSG()
    pipe = dev.pipeline
    cfg = pipe.vae_cfg

    from PIL import Image

    rng = np.random.default_rng(0)
    image = Image.fromarray((rng.random((518, 518, 3)) * 255).astype(np.uint8))

    for it in range(args.repeat):
        tag = "cold" if it == 0 else f"warm{it}"
        t = {}
        t0 = time.perf_counter()

        # --- DiT sampling (conditioning + 100-step flow) ------------------
        context = pipe.image_encoder.encode_images([image])
        key = jax.random.PRNGKey(44)
        noise = jax.random.normal(
            key, (1, cfg.num_tokens, cfg.latent_channels), pipe._dtype
        )
        from actionmesh_tpu.models.triposg.pipeline import _flow_sample
        from actionmesh_tpu.sampling.flow_schedule import get_schedule

        ts, dist = get_schedule(100, pipe._num_train_timesteps, pipe._shift)
        latents = noise
        done = 0
        while done < 100:
            seg = min(25, 100 - done)
            latents = _flow_sample(
                pipe.dit_params, pipe.dit_cfg, latents,
                context.astype(pipe._dtype),
                jnp.asarray(ts[done : done + seg + 1]),
                jnp.asarray(dist[done : done + seg]),
                guidance_scale=7.5, attn_impl=pipe._attn_impl,
                mesh=pipe.device_mesh,
            )
            done += seg
        device_sync(latents)
        t["dit_sampling"] = time.perf_counter() - t0

        # --- decode_kv ----------------------------------------------------
        t0 = time.perf_counter()
        kv = decode_kv(
            pipe.vae_params, cfg, latents.astype(pipe._dtype),
            attn_impl=pipe._attn_impl,
        )
        device_sync(kv)
        t["decode_kv"] = time.perf_counter() - t0

        def sdf_fn(pts: np.ndarray) -> np.ndarray:
            vals = query_sdf(
                pipe.vae_params, cfg, kv,
                jnp.asarray(pts, jnp.float32)[None],
                attn_impl=pipe._attn_impl,
            )
            return _dev_sdf_regularizer(pts, np.asarray(vals[0], np.float32))

        # --- hierarchical extraction, instrumented inline ----------------
        bounds = (-1.005, -1.005, -1.005, 1.005, 1.005, 1.005)
        lo, hi = np.array(bounds[:3]), np.array(bounds[3:])
        Rc = (1 << args.dense) + 1
        step = (hi - lo) / (Rc - 1)
        n_coarse = Rc**3
        chunk = 1 << 18

        t0 = time.perf_counter()
        coarse_vals = np.empty(n_coarse, np.float32)
        nq_coarse = 0
        for start in range(0, n_coarse, chunk):
            stop = min(start + chunk, n_coarse)
            idx = np.arange(start, stop, dtype=np.int64)
            k = idx % Rc
            j = (idx // Rc) % Rc
            i = idx // (Rc * Rc)
            pts = np.empty((len(idx), 3), np.float32)
            pts[:, 0] = lo[0] + i * step[0]
            pts[:, 1] = lo[1] + j * step[1]
            pts[:, 2] = lo[2] + k * step[2]
            coarse_vals[start:stop] = sdf_fn(pts).reshape(-1)
            nq_coarse += len(idx)
        coarse_vals = coarse_vals.reshape(Rc, Rc, Rc)
        t["coarse_sdf"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        s = 1 << (args.hier - args.dense)
        inside = (coarse_vals < 0.0).view(np.uint8)
        acc = np.zeros((Rc - 1, Rc - 1, Rc - 1), np.uint8)
        for dx, dy, dz in isosurface._CUBE_CORNERS:
            acc += inside[dx : Rc - 1 + dx, dy : Rc - 1 + dy, dz : Rc - 1 + dz]
        ci, cj, ck = np.nonzero((acc > 0) & (acc < 8))
        t["crossing_detect"] = time.perf_counter() - t0

        cell_size = (hi - lo) / (Rc - 1)
        fine_R = (Rc - 1) * s + 1
        fine_step = cell_size / s

        t0 = time.perf_counter()
        gi = ci[:, None, None, None] * s + np.arange(s + 1)[None, :, None, None]
        gj = cj[:, None, None, None] * s + np.arange(s + 1)[None, None, :, None]
        gk = ck[:, None, None, None] * s + np.arange(s + 1)[None, None, None, :]
        fine_ids = (gi * fine_R + gj) * fine_R + gk
        uniq_ids, inv = np.unique(fine_ids.reshape(-1), return_inverse=True)
        ui = uniq_ids // (fine_R * fine_R)
        uj = (uniq_ids // fine_R) % fine_R
        uk = uniq_ids % fine_R
        uniq_pts = np.empty((len(uniq_ids), 3), np.float32)
        uniq_pts[:, 0] = lo[0] + ui * fine_step[0]
        uniq_pts[:, 1] = lo[1] + uj * fine_step[1]
        uniq_pts[:, 2] = lo[2] + uk * fine_step[2]
        t["fine_ids_unique"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        uniq_vals = isosurface._eval_chunked(sdf_fn, uniq_pts, chunk)
        fine_vals = uniq_vals[inv].reshape(fine_ids.shape).astype(np.float32)
        t["fine_sdf"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        from actionmesh_tpu.utils import native

        v, f = native.marching_cubes_grid(
            fine_vals, np.stack([ci, cj, ck], axis=-1), lo, cell_size,
            fine_R, 0.0,
        )
        t["native_mc"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        from actionmesh_tpu.io.mesh import Mesh

        mesh = MeshPostprocessor().process_mesh(Mesh(vertices=v, faces=f))
        t["qem_process"] = time.perf_counter() - t0

        # --- production decode_latents (device grid fast path, r3g) ------
        t0 = time.perf_counter()
        meshes = pipe.decode_latents(
            latents,
            dense_octree_depth=args.dense,
            hierarchical_octree_depth=args.hier,
        )
        raw = meshes[0]
        t["decode_latents_fastpath"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = MeshPostprocessor().process_mesh(raw)
        t["fastpath_qem"] = time.perf_counter() - t0

        total = sum(t.values())
        print(f"--- {tag} ---")
        for k2, v2 in t.items():
            print(f"  {k2:18s} {v2:8.2f} s")
        print(
            f"  {'TOTAL':18s} {total:8.2f} s   "
            f"(old path = TOTAL - the two fastpath rows; new Stage-0 "
            f"decode+extract = decode_latents_fastpath + fastpath_qem)   "
            f"(coarse queries {nq_coarse/1e6:.2f}M, crossing cells "
            f"{len(ci)}, fine uniq {len(uniq_pts)/1e6:.2f}M, "
            f"raw faces {len(f)}, final verts {len(mesh.vertices)})"
        )


if __name__ == "__main__":
    main()
