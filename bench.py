"""Benchmark: Stage-I denoiser throughput on the current chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: full production denoising steps/sec/chip for the Stage-I temporal
denoiser (21 layers, width 2048, T=16 frames x 2049 tokens => 32,784-token
inflated attention, 2-branch CFG batch per step — identical work to one
loop iteration of reference scheduler._flow_sample).

Baseline derivation (BASELINE.md): reference e2e is ~75 s on H100 of which
Stage 0 (100-step TripoSG) is roughly half (fast mode halves Stage 0 and
saves ~30 s); Stage I's 30 steps take ~25 s => 1.2 steps/s on one H100.
vs_baseline = (our steps/s on this chip) / 1.2. Note one v5e chip has
~1/5 the bf16 FLOPS of an H100; the production target shards over a
v5e-8 slice (see actionmesh_tpu/parallel/).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

H100_STAGE1_STEPS_PER_SEC = 1.2


def main() -> None:
    import jax
    import jax.numpy as jnp

    from actionmesh_tpu.models.denoiser import DenoiserConfig, init_denoiser
    from actionmesh_tpu.sampling.denoise_loop import denoise_window, get_noise
    from actionmesh_tpu.sampling.flow_schedule import get_schedule
    from actionmesh_tpu.sampling.guidance import make_guidance

    on_tpu = jax.default_backend() == "tpu"
    cfg = DenoiserConfig()
    dtype = jnp.bfloat16
    params = init_denoiser(jax.random.PRNGKey(0), cfg, dtype=dtype)
    guidance = make_guidance([[0, 1], [1, 1]], [7.5])

    B, T, N, S = 1, 16, cfg.num_tokens_nominal, 257
    key = jax.random.PRNGKey(1)
    init_latent = get_noise(key, (N, cfg.in_channels), B, T, dtype=dtype)
    context = jax.random.normal(
        key, (B, T, S, cfg.cross_attention_dim), dtype
    )
    mask = jnp.concatenate(
        [jnp.ones((B, 1), jnp.int32), jnp.zeros((B, T - 1), jnp.int32)], axis=1
    )
    framestep = jnp.tile(jnp.arange(T, dtype=jnp.float32)[None], (B, 1))

    import numpy as np

    def run(num_steps: int) -> float:
        """Returns a scalar pulled to host — the axon tunnel does NOT
        synchronize on block_until_ready(), so timing must force a
        device->host transfer (adds ~30-60 ms, negligible per multi-second
        step)."""
        ts, dist = get_schedule(num_steps, shift=3.0)
        out = denoise_window(
            params, cfg, guidance, init_latent, context, mask, framestep,
            jnp.asarray(ts), jnp.asarray(dist), is_additive=True,
        )
        return float(np.asarray(out[0, 0, 0, 0].astype(jnp.float32)))

    # One compile (scan length is baked into the program, so warm with the
    # bench length directly), then a timed run.
    bench_steps = 6 if on_tpu else 2
    run(bench_steps)
    t0 = time.perf_counter()
    run(bench_steps)
    elapsed = time.perf_counter() - t0
    steps_per_sec = bench_steps / elapsed

    print(
        json.dumps(
            {
                "metric": "stage1_denoiser_steps_per_sec_per_chip",
                "value": round(steps_per_sec, 4),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / H100_STAGE1_STEPS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
