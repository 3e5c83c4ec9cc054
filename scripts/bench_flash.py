"""Microbenchmark: flash attention variants at Stage-I production shape.

Usage: python scripts/bench_flash.py [--quick]
Times force a device->host transfer (axon tunnel ignores block_until_ready).
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from actionmesh_tpu.ops.flash_attention import (
    flash_attention,
    flash_attention_pipelined,
)


def sync(x):
    return np.asarray(x[0, 0, 0, :4].astype(jnp.float32))


def bench(fn, q, k, v, n=5, warmup=2):
    for _ in range(warmup):
        sync(fn(q, k, v))
    t0 = time.time()
    for _ in range(n):
        out = fn(q, k, v)
    sync(out)
    return (time.time() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    B, H, S, D = 2, 16, 32784, 128
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, H, S, D), jnp.bfloat16)
    flops = 4 * B * H * S * S * D

    configs = [
        ("baseline bq1024 bk1024", lambda q, k, v: flash_attention(
            q, k, v, block_q=1024, block_k=1024)),
        ("pipelined U2 bq1024 bk512", lambda q, k, v: flash_attention_pipelined(
            q, k, v, block_q=1024, block_k=512, unroll=2)),
        ("pipelined U4 bq1024 bk512", lambda q, k, v: flash_attention_pipelined(
            q, k, v, block_q=1024, block_k=512, unroll=4)),
        ("pipelined U2 bq512 bk1024", lambda q, k, v: flash_attention_pipelined(
            q, k, v, block_q=512, block_k=1024, unroll=2)),
    ]
    if not args.quick:
        configs += [
            ("pipelined U2 bq1024 bk1024", lambda q, k, v: flash_attention_pipelined(
                q, k, v, block_q=1024, block_k=1024, unroll=2)),
            ("pipelined U4 bq1024 bk1024", lambda q, k, v: flash_attention_pipelined(
                q, k, v, block_q=1024, block_k=1024, unroll=4)),
            ("pipelined U4 bq512 bk512", lambda q, k, v: flash_attention_pipelined(
                q, k, v, block_q=512, block_k=512, unroll=4)),
            ("pipelined U2 bq512 bk512", lambda q, k, v: flash_attention_pipelined(
                q, k, v, block_q=512, block_k=512, unroll=2)),
            ("pipelined U8 bq1024 bk256", lambda q, k, v: flash_attention_pipelined(
                q, k, v, block_q=1024, block_k=256, unroll=8)),
            ("pipelined U4 bq2048 bk256", lambda q, k, v: flash_attention_pipelined(
                q, k, v, block_q=2048, block_k=256, unroll=4)),
        ]
    # correctness first (vs baseline)
    ref = np.asarray(flash_attention(q, k, v)[:, :, :64].astype(jnp.float32))
    for name, fn in configs[1:]:
        got = np.asarray(fn(q, k, v)[:, :, :64].astype(jnp.float32))
        err = np.abs(got - ref).max()
        assert err < 2e-2, f"{name}: mismatch {err}"
    print("correctness OK")

    for name, fn in configs:
        dt = bench(fn, q, k, v)
        print(f"{name:32s} {dt*1000:8.1f} ms  {flops/dt/1e12:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()
