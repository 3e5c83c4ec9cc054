"""On-chip benchmarks for the training path.

Section 1 — flash attention fwd+bwd at the production Stage-I attention
shape ((B·CFG-free) 1x16 heads x 32,784 x 128 bf16): amortized
value_and_grad through flash_attention_trainable vs the chunked-XLA
fallback; reports ms/step and TFLOP/s (fwd 2 matmuls + bwd 5 matmuls =
14·B·H·S²·D flops total).

Section 2 — full Stage-I denoiser training step (loss + grad + adamw) at
production width on one chip, bf16 params (fp32 masters + moments for the
1.26B-param model need the 8-chip tp sharding; single chip is a kernel /
throughput check), remat on.

Usage: python scripts/bench_train.py [--skip-full]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def sync(x):
    from actionmesh_tpu.utils import device_sync

    device_sync(x)


def bench_attention_bwd():
    from actionmesh_tpu.ops.flash_attention_bwd import flash_attention_trainable
    from actionmesh_tpu.ops.attention import chunked_attention_trainable

    B, H, S, D = 1, 16, 32784, 128
    key = jax.random.PRNGKey(0)
    q, k, v = (
        jax.random.normal(kk, (B, H, S, D), jnp.bfloat16)
        for kk in jax.random.split(key, 3)
    )
    do = jax.random.normal(jax.random.PRNGKey(1), (B, H, S, D), jnp.bfloat16)
    flops = 14 * B * H * S * S * D

    def run(name, fn):
        grad_fn = jax.jit(
            jax.grad(
                lambda q, k, v: jnp.vdot(
                    fn(q, k, v).astype(jnp.float32), do.astype(jnp.float32)
                ),
                argnums=(0, 1, 2),
            )
        )
        out = grad_fn(q, k, v)
        sync(out[0])  # compile + warm
        n = 4
        t0 = time.perf_counter()
        for _ in range(n):
            out = grad_fn(q, k, v)
        sync(out[0])
        dt = (time.perf_counter() - t0) / n
        print(
            f"{name}: {dt * 1e3:.1f} ms fwd+bwd, "
            f"{flops / dt / 1e12:.1f} TFLOP/s"
        )
        return dt

    t_flash = run(
        "flash_train (Pallas fwd+bwd)",
        lambda q, k, v: flash_attention_trainable(q, k, v, None),
    )
    t_chunk = run(
        "chunked  (XLA custom_vjp, O(S) backward)",
        lambda q, k, v: chunked_attention_trainable(q, k, v, None),
    )
    print(f"speedup: {t_chunk / t_flash:.2f}x")


def bench_full_step(opt_name: str = "adafactor", frames: int = 16):
    """Single-chip training-step datum. At T=16 production shape, bf16
    params + bf16 Adam moments need 16.53 GB vs the v5e's 15.75 — adamw at
    full T only fits on the sharded mesh (MULTICHIP_AUDIT: 5.1 GB/device
    args on dp2 x tp4). Single-chip options measured here: adafactor
    (factored second moment, fits at T=16) or adamw at T=8."""
    import optax

    from actionmesh_tpu.models.denoiser import DenoiserConfig, init_denoiser
    from actionmesh_tpu.training import init_train_state, make_train_step

    cfg = DenoiserConfig()
    params = init_denoiser(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    B, T, N, S = 1, frames, cfg.num_tokens_nominal, 257
    batch = {
        "latents": jax.random.normal(
            jax.random.PRNGKey(1), (B, T, N, cfg.in_channels), jnp.float32
        ),
        "context": jax.random.normal(
            jax.random.PRNGKey(2), (B, T, S, cfg.cross_attention_dim),
            jnp.bfloat16,
        ),
        "framestep": jnp.tile(jnp.arange(T, dtype=jnp.float32)[None], (B, 1)),
        "mask": jnp.concatenate(
            [jnp.ones((B, 1), jnp.float32), jnp.zeros((B, T - 1), jnp.float32)],
            axis=1,
        ),
    }
    optimizer = (
        optax.adamw(1e-4) if opt_name == "adamw" else optax.adafactor(1e-4)
    )
    print(f"full step: optimizer={opt_name}, T={T}")
    # bf16 params end-to-end on one chip (see module docstring)
    step = make_train_step(cfg, optimizer, compute_dtype=None)
    state = init_train_state(params, optimizer)
    key = jax.random.PRNGKey(3)
    t0 = time.perf_counter()
    state, loss = step(state, batch, key)
    sync(loss)
    print(f"compile+first step: {time.perf_counter() - t0:.1f} s, loss {float(loss):.4f}")
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        state, loss = step(state, batch, key)
    sync(loss)
    dt = (time.perf_counter() - t0) / n
    # ~3x the 533 TFLOP inference step's matmul work minus CFG batch of 2
    print(f"train step: {dt:.2f} s/step ({1 / dt:.4f} steps/s), loss {float(loss):.4f}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-full", action="store_true")
    ap.add_argument("--skip-attn", action="store_true")
    ap.add_argument("--opt", choices=("adamw", "adafactor"), default="adafactor")
    ap.add_argument("--frames", type=int, default=16)
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()}")
    if not args.skip_attn:
        bench_attention_bwd()
    if not args.skip_full:
        bench_full_step(args.opt, args.frames)
