"""Microbench the TripoSG SDF field query (the Stage-0 decode hot loop).

profile_stage0.py attributes ~8.9 s of the warm Stage-0 budget to the
coarse 257^3 SDF eval — 65 chunks x 262,144 queries at ~137 ms/chunk,
i.e. ~24 TFLOP/s effective against a ~3.3 TFLOP/chunk arithmetic cost.
This script isolates where the chunk time goes and measures the levers:

  * query_sdf as-is (fp32 q/kv, Pallas flash)   — baseline
  * attention-only at the same shape, fp32 vs bf16
  * bf16 q/kv attention inside the query (fp32 softmax/out stays)
  * chunk 2^18 vs 2^19
  * host->device transfer + embed + projections (attention ablated)

Timing is amortized over repeated calls (tunnel dispatch ~5 ms/call).

Usage:  python scripts/bench_sdf.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def timeit(fn, n=8, warmup=2):
    from actionmesh_tpu.utils import device_sync

    for _ in range(warmup):
        out = fn()
    device_sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    device_sync(out)
    return (time.perf_counter() - t0) / n


def main() -> None:
    import jax
    import jax.numpy as jnp

    from actionmesh_tpu.models.triposg.pipeline import TripoSGPipeline
    from actionmesh_tpu.models.triposg.vae import decode_kv, query_sdf
    from actionmesh_tpu.ops.attention import dot_product_attention

    pipe = TripoSGPipeline.from_random(seed=0, dtype=jnp.bfloat16)
    cfg = pipe.vae_cfg
    key = jax.random.PRNGKey(0)
    latents = jax.random.normal(
        key, (1, cfg.num_tokens, cfg.latent_channels), jnp.bfloat16
    )
    kv = decode_kv(pipe.vae_params, cfg, latents)
    print(f"kv: {kv.shape} {kv.dtype}")

    rng = np.random.default_rng(0)

    for chunk_log in (18, 19):
        Q = 1 << chunk_log
        pts = rng.random((Q, 3), np.float32) * 2 - 1

        t = timeit(
            lambda: query_sdf(
                pipe.vae_params, cfg, kv,
                jnp.asarray(pts, jnp.float32)[None],
                attn_impl=pipe._attn_impl,
            )
        )
        tf = (2 * Q * cfg.num_tokens * cfg.decoder_width * 2
              + 2 * Q * cfg.decoder_width**2 * 2) / 1e12
        print(f"query_sdf  chunk=2^{chunk_log}: {t*1e3:7.1f} ms "
              f"({tf/t:6.1f} TFLOP/s incl. H2D)")

        # device-resident points (ablate H2D + np staging)
        dpts = jax.device_put(pts[None])
        t = timeit(
            lambda: query_sdf(
                pipe.vae_params, cfg, kv, dpts, attn_impl=pipe._attn_impl
            )
        )
        print(f"query_sdf  device-resident pts:  {t*1e3:7.1f} ms "
              f"({tf/t:6.1f} TFLOP/s)")

    # attention-only at the chunk shape, fp32 vs bf16
    Q = 1 << 18
    H, D = cfg.decoder_heads, cfg.decoder_width // cfg.decoder_heads
    for dt in (jnp.float32, jnp.bfloat16):
        q = jax.random.normal(key, (1, H, Q, D), dt)
        kk = jax.random.normal(key, (1, H, cfg.num_tokens, D), dt)
        vv = jax.random.normal(key, (1, H, cfg.num_tokens, D), dt)
        for impl in ("flash", "chunked"):
            t = timeit(
                lambda: dot_product_attention(q, kk, vv, impl=impl)
            )
            atf = 2 * Q * cfg.num_tokens * cfg.decoder_width * 2 / 1e12
            print(f"attn-only {np.dtype(dt).name:8s} {impl:8s}: "
                  f"{t*1e3:7.1f} ms ({atf/t:6.1f} TFLOP/s)")


if __name__ == "__main__":
    main()
