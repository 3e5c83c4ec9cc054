"""Pre-compile the production-size XLA programs into the persistent cache.

Run once after checkout (or after editing compute-path sources — Pallas
cache keys embed kernel source locations, so edits that shift line numbers
in ops/*.py invalidate entries). Subsequent pipeline processes then
cold-start warm: the full-size Stage I window program alone is minutes of
compile time.

Usage:
    python scripts/prewarm.py [--frames 16] [--steps 30] [--v-buckets 8192,12288]

Compiles, per config:
  * RMBG + DINOv2 forwards (production 1024/518 px shapes)
  * Stage I denoise_window segments (steps_per_launch and remainder)
  * Stage II autoencoder_forward for the requested vertex buckets
  * Stage 0 DiT sampling step + SDF grid decode (stub-compatible shapes)

The pipeline's jit cache is content-addressed, so simply driving one
synthetic end-to-end run exercises every program the real run needs.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
from PIL import Image


def synthetic_frames(n: int, size: int = 518):
    """RGBA frames with a moving blob (valid alpha skips RMBG)."""
    frames = []
    for i in range(n):
        rgba = np.zeros((size, size, 4), dtype=np.uint8)
        x = size // 4 + 2 * i
        rgba[size // 4 : 3 * size // 4, x : x + size // 3, :3] = 128
        rgba[size // 4 : 3 * size // 4, x : x + size // 3, 3] = 255
        frames.append(Image.fromarray(rgba))
    return frames


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument(
        "--v-buckets",
        type=str,
        default="",
        help="extra Stage II vertex buckets to compile (comma-separated)",
    )
    ap.add_argument("--config", type=str, default="actionmesh")
    ap.add_argument("--weights-dir", type=str, default=None)
    args = ap.parse_args()

    import jax

    from actionmesh_tpu.io.video_input import ActionMeshInput
    from actionmesh_tpu.pipeline import ActionMeshPipeline

    t0 = time.time()
    pipe = ActionMeshPipeline(
        config_name=args.config, weights_dir=args.weights_dir
    )
    inp = ActionMeshInput(
        frames=synthetic_frames(args.frames),
        timesteps=np.arange(args.frames, dtype=np.float32),
    )
    print(f"[prewarm] pipeline ready ({time.time() - t0:.0f}s); running e2e...")
    meshes = pipe(inp, seed=0, stage_1_steps=args.steps)
    print(
        f"[prewarm] e2e done: {len(meshes)} meshes, "
        f"total {time.time() - t0:.0f}s"
    )

    # Extra Stage II vertex buckets (meshes of other sizes) if requested.
    extra = [int(b) for b in args.v_buckets.split(",") if b.strip()]
    if extra:
        import jax.numpy as jnp

        from actionmesh_tpu.models.autoencoder import autoencoder_forward
        from actionmesh_tpu.utils import device_sync

        T = pipe.autoencoder_config.temporal_context_size
        N, C = pipe.cfg.denoiser_latent_shape
        latent = jnp.zeros((1, T, N, C), pipe._dtype)
        framestep = jnp.arange(T, dtype=jnp.float32)[None]
        chunk = pipe.cfg.decode_target_chunk or 5
        for bucket in extra:
            t1 = time.time()
            query = jnp.zeros((1, bucket, 6), jnp.float32)
            out = autoencoder_forward(
                pipe.autoencoder_params,
                pipe.autoencoder_config,
                latent,
                framestep,
                jnp.zeros((1,)),
                jnp.linspace(0.2, 1.0, chunk)[None],
                query,
                attn_impl=pipe.cfg.attn_impl,
                compute_dtype=pipe._dtype,
            )
            device_sync(out)
            print(f"[prewarm] Stage II V={bucket}: {time.time() - t1:.0f}s")

    cache_dir = jax.config.jax_compilation_cache_dir
    print(f"[prewarm] persistent cache: {cache_dir}")


if __name__ == "__main__":
    main()
