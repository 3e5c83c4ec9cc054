"""Independent lower bound on the Stage-I step from measured primitives.

The round-3 plateau claim ("0.266 steps/s is ~90% of achievable") rested
on assumed efficiency percentages. This script replaces that with a bound
composed purely of MEASURED primitives at the EXACT production shapes:
every distinct gemm the denoiser step executes (timed on-chip, amortized
over a data-dependent scan so XLA cannot CSE them) plus the flash
attention at the inflated sequence. The sum of measured primitive times,
with zero allowance for anything else (norms, RoPE, reshapes, residuals,
scheduler math), is a hard floor for the step; actual/floor quantifies
how much non-gemm overhead remains.

Writes ROOFLINE_STAGE1.json. Run on the real chip: python scripts/roofline_stage1.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from actionmesh_tpu.utils import device_sync

# Production Stage-I step shapes (DenoiserConfig defaults, g_batch=2 CFG):
# B' = 2 branches x 16 frames = 32 per-frame rows, N+1 = 2049 tokens,
# width 2048, FF inner 8192, cross dim 1024, 21 layers, skips on 10.
BT, N1, W, FF, XD = 32, 2049, 2048, 8192, 1024
COND_BT = 16  # uncond cross-attention is skipped (out = bias), cond half runs
LAYERS, SKIP_LAYERS = 21, 10

# (name, calls per denoiser forward, M, K, Nmat) — batched rows fold into M
GEMMS = [
    ("self_qkv", LAYERS, BT * N1, W, 3 * W),
    ("self_out", LAYERS, BT * N1, W, W),
    ("cross_q", LAYERS, COND_BT * N1, W, W),
    ("cross_kv", LAYERS, COND_BT * 257, XD, 2 * W),
    ("cross_out", LAYERS, COND_BT * N1, W, W),
    ("ff_in", LAYERS, BT * N1, W, FF),
    ("ff_out", LAYERS, BT * N1, FF, W),
    ("skip_linear", SKIP_LAYERS, BT * N1, 2 * W, W),
]


def time_gemm(m: int, k: int, n: int, calls: int, dtype=jnp.bfloat16):
    """Seconds for `calls` (m,k)x(k,n) gemms, chained data-dependently."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (m, k), dtype)
    w = jax.random.normal(key, (k, n), dtype)

    @jax.jit
    def run(x, w):
        def body(c, _):
            y = (x * c) @ w
            return jnp.mean(y).astype(jnp.float32), None

        c, _ = jax.lax.scan(
            body, jnp.float32(1.0), None, length=calls
        )
        return c

    run(x, w)  # compile + warm
    device_sync(run(x, w))
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = run(x, w)
    device_sync(out)
    dt = (time.perf_counter() - t0) / reps
    flops = 2.0 * m * k * n * calls
    return dt, flops / dt / 1e12


def time_flash(calls: int):
    """Seconds for `calls` inflated self-attentions at (2, 16, 32784, 128)."""
    from actionmesh_tpu.ops.attention import dot_product_attention

    B, H, S, D = 2, 16, 16 * N1, 128
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, H, S, D), jnp.bfloat16)

    @jax.jit
    def run(q, k, v):
        def body(c, _):
            o = dot_product_attention(q * c, k, v, impl="flash")
            return jnp.mean(o).astype(jnp.float32), None

        c, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=calls)
        return c

    run(q, k, v)
    device_sync(run(q, k, v))
    t0 = time.perf_counter()
    out = run(q, k, v)
    device_sync(out)
    dt = time.perf_counter() - t0
    flops = 4.0 * B * H * S * S * D * calls  # 2 gemms of 2*S*S*D
    return dt, flops / dt / 1e12


def main() -> None:
    assert jax.default_backend() == "tpu", "run on the real chip"
    report = {"gemms": {}, "shapes": {
        "BT": BT, "N1": N1, "W": W, "FF": FF, "layers": LAYERS,
    }}
    gemm_total = 0.0
    for name, calls, m, k, n in GEMMS:
        dt, tflops = time_gemm(m, k, n, calls)
        report["gemms"][name] = {
            "calls": calls, "mkn": [m, k, n],
            "seconds": round(dt, 4), "tflops": round(tflops, 1),
        }
        gemm_total += dt
        print(f"{name:12s} x{calls:2d}  {dt*1e3:7.1f} ms  {tflops:6.1f} TF/s",
              flush=True)

    flash_dt, flash_tflops = time_flash(LAYERS)
    print(f"{'flash_attn':12s} x{LAYERS:2d}  {flash_dt*1e3:7.1f} ms  "
          f"{flash_tflops:6.1f} TF/s", flush=True)

    # One denoiser forward = gemms + flash; one SAMPLER step = 1 forward
    # (CFG branches ride the leading batch axis already counted in BT).
    fwd_floor = gemm_total + flash_dt
    report["flash"] = {
        "calls": LAYERS, "seconds": round(flash_dt, 4),
        "tflops": round(flash_tflops, 1),
    }
    report["forward_floor_seconds"] = round(fwd_floor, 4)

    # measured actual step from the live bench (amortized, same chip)
    import subprocess

    bench = subprocess.run(
        [sys.executable, str(Path(__file__).parent.parent / "bench.py")],
        capture_output=True, text=True,
    )
    actual = None
    for line in bench.stdout.splitlines():
        try:
            d = json.loads(line)
            actual = 1.0 / d["value"]
        except Exception:
            continue
    if actual is not None:
        report["actual_step_seconds"] = round(actual, 4)
        report["actual_over_floor"] = round(actual / fwd_floor, 4)
        print(f"floor {fwd_floor:.3f}s  actual {actual:.3f}s  "
              f"ratio {actual / fwd_floor:.3f}")
    out = Path(__file__).resolve().parent.parent / "ROOFLINE_STAGE1.json"
    out.write_text(json.dumps(report, indent=2))
    print("wrote", out)


if __name__ == "__main__":
    main()
