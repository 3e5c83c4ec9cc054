"""Pallas TPU flash-attention backward: O(S)-memory gradients.

The reference trains nothing (SURVEY.md §4) and its inference leans on
CUDA SDPA; this gives the TPU framework a *trainable* fused attention at
the Stage-I sequence length (~32,784 tokens), where materializing the
(Sq, Sk) probability matrix for autodiff would need ~4.3 GB fp32 per
(batch, head) — the chunked-XLA fallback avoids that but leaves MXU
throughput on the table. Scheme (Dao et al. flash-attention v2 backward,
re-derived for the Mosaic/TPU layout):

  forward residuals: q, k, v, o and the per-row online-softmax stats
  (m, l) the forward kernel already emits (ops/flash_attention.py
  ``return_stats=True``); L = m + log l is the row log-sum-exp.

  delta_i = sum_d dO_id * O_id                     (XLA, one fused pass)
  P_ij    = exp(scale * q_i . k_j - L_i)           (recomputed per block)
  dV_j    = sum_i P_ij dO_i
  dP_ij   = dO_i . v_j
  dS_ij   = P_ij * (dP_ij - delta_i)
  dQ_i    = scale * sum_j dS_ij k_j
  dK_j    = scale * sum_i dS_ij q_i

Two kernels so every accumulator lives in VMEM scratch across its
reduction sweep: dKdV iterates q-blocks innermost (grid B, H, kb, qb),
dQ iterates k-blocks innermost (grid B, H, qb, kb). All dots run on the
MXU in the input dtype with fp32 accumulation; per-row stats ride the
same 8-sublane stats tiles the forward uses.

``flash_attention_trainable`` wraps forward+backward in a
``jax.custom_vjp`` for self/cross attention without a kv mask (the only
shapes Stage-I/II training needs — padding *inside* the kernel is still
masked via the forward's edge mode and reproduced here).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from actionmesh_tpu.ops.flash_attention import (
    NEG_INF,
    _pad_to,
    flash_attention_pipelined,
)


def _row_col(stats_block):
    """(8, bq) stats tile -> (bq, 1) per-row column (sublane layout)."""
    return jnp.transpose(stats_block[:1], (1, 0))


def _recompute_p(q, k, lcol, kv_valid, scale):
    """exp(scale * q k^T - L) with padded KV columns zeroed. (bq, bk) fp32."""
    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * scale
    if kv_valid is not None:
        s = jnp.where(kv_valid, s, NEG_INF)
    return jnp.exp(s - lcol)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, l_ref, d_ref,
    dk_ref, dv_ref, dk_acc, dv_acc,
    *, scale: float, k_pad: int,
):
    qi = pl.program_id(3)
    n_q = pl.num_programs(3)
    ki = pl.program_id(2)
    n_kb = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)
    lcol = _row_col(l_ref[0, 0])  # (bq, 1) fp32
    dcol = _row_col(d_ref[0, 0])

    kv_valid = None
    if k_pad:
        bk = k.shape[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
        # only the last K block holds padding
        kv_valid = jnp.logical_or(ki < n_kb - 1, lane < bk - k_pad)
    p = _recompute_p(q, k, lcol, kv_valid, scale)  # (bq, bk)

    # dV += P^T dO  (contract over the q rows)
    dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
        p.astype(v.dtype),
        do.astype(v.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dP = dO V^T ; dS = P * (dP - delta)
    dp = jax.lax.dot_general(
        do.astype(v.dtype),
        v,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - dcol) * scale
    # dK += dS^T Q (contract over the q rows)
    dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
        ds.astype(q.dtype),
        q,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(qi == n_q - 1)
    def _finalize():
        dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, l_ref, d_ref,
    dq_ref, dq_acc,
    *, scale: float, k_pad: int,
):
    ki = pl.program_id(3)
    n_kb = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)
    lcol = _row_col(l_ref[0, 0])
    dcol = _row_col(d_ref[0, 0])

    kv_valid = None
    if k_pad:
        bk = k.shape[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
        kv_valid = jnp.logical_or(ki < n_kb - 1, lane < bk - k_pad)
    p = _recompute_p(q, k, lcol, kv_valid, scale)

    dp = jax.lax.dot_general(
        do.astype(v.dtype),
        v,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - dcol) * scale
    dq_acc[:] = dq_acc[:] + jax.lax.dot_general(
        ds.astype(k.dtype),
        k,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == n_kb - 1)
    def _finalize():
        dq_ref[0, 0] = dq_acc[:].astype(dq_ref.dtype)


def _stats_tiles(x: jnp.ndarray, sq_pad: int, pad_value: float) -> jnp.ndarray:
    """(B, H, Sq) per-row values -> (B, H, 8, Sq_pad) sublane-broadcast
    tiles (the forward kernel's stats layout). Padded q rows get
    ``pad_value`` — the LSE pads with +inf-like so exp(s - L) underflows
    to exactly 0 (otherwise inf * 0 = NaN would leak into dK/dV)."""
    pad = sq_pad - x.shape[2]
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)), constant_values=pad_value)
    return jnp.broadcast_to(x[:, :, None, :], x.shape[:2] + (8, sq_pad))


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "block_k", "interpret"),
)
def flash_attention_bwd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    o: jnp.ndarray,
    m: jnp.ndarray,
    l: jnp.ndarray,
    do: jnp.ndarray,
    scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 512,
    interpret: Optional[bool] = None,
):
    """Gradients (dq, dk, dv) from forward residuals + stats. Shapes as the
    forward: q/o/do (B, H, Sq, D), k/v (B, H, Sk, D), m/l (B, H, Sq)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    if scale is None:
        scale = D ** -0.5

    def _round_up(x: int, mult: int) -> int:
        return -(-x // mult) * mult

    block_q = min(block_q, _round_up(Sq, 128))
    block_k = min(block_k, _round_up(Sk, 128))

    qp = _pad_to(q, 2, block_q)
    op = _pad_to(o, 2, block_q)
    dop = _pad_to(do, 2, block_q)
    kp = _pad_to(k, 2, block_k)
    vp = _pad_to(v, 2, block_k)
    sq_pad = qp.shape[2]
    k_pad = kp.shape[2] - Sk

    # Row log-sum-exp; padded q rows (l == 0) get +inf so exp(s - L) = 0.
    lse = jnp.where(
        l > 0, m + jnp.log(jnp.maximum(l, 1e-30)), jnp.float32(-NEG_INF)
    )
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    )  # (B, H, Sq)
    lse_t = _stats_tiles(lse, sq_pad, pad_value=float(-NEG_INF))
    delta_t = _stats_tiles(delta, sq_pad, pad_value=0.0)

    n_q = sq_pad // block_q
    n_kb = kp.shape[2] // block_k

    q_spec = pl.BlockSpec(
        (1, 1, block_q, D), lambda b, h, ki, qi: (b, h, qi, 0),
        memory_space=pltpu.VMEM,
    )
    k_spec = pl.BlockSpec(
        (1, 1, block_k, D), lambda b, h, ki, qi: (b, h, ki, 0),
        memory_space=pltpu.VMEM,
    )
    stats_spec = pl.BlockSpec(
        (1, 1, 8, block_q), lambda b, h, ki, qi: (b, h, 0, qi),
        memory_space=pltpu.VMEM,
    )
    common = dict(
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel", "parallel", "parallel", "arbitrary"
            ),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, k_pad=k_pad),
        grid=(B, H, n_kb, n_q),
        in_specs=[q_spec, k_spec, k_spec, q_spec, stats_spec, stats_spec],
        out_specs=(
            pl.BlockSpec(
                (1, 1, block_k, D), lambda b, h, ki, qi: (b, h, ki, 0),
                memory_space=pltpu.VMEM,
            ),
        ) * 2,
        out_shape=(
            jax.ShapeDtypeStruct(kp.shape, k.dtype),
            jax.ShapeDtypeStruct(vp.shape, v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * B * H * Sq * Sk * D,
            bytes_accessed=2 * (q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=B * H * Sq * Sk,
        ),
        **common,
    )(qp, kp, vp, dop, lse_t, delta_t)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, k_pad=k_pad),
        grid=(B, H, n_q, n_kb),
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, D), lambda b, h, qi, ki: (b, h, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_k, D), lambda b, h, qi, ki: (b, h, ki, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_k, D), lambda b, h, qi, ki: (b, h, ki, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_q, D), lambda b, h, qi, ki: (b, h, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 8, block_q), lambda b, h, qi, ki: (b, h, 0, qi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 8, block_q), lambda b, h, qi, ki: (b, h, 0, qi),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, D), lambda b, h, qi, ki: (b, h, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Sq * Sk * D,
            bytes_accessed=2 * (q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=B * H * Sq * Sk,
        ),
        **common,
    )(qp, kp, vp, dop, lse_t, delta_t)

    return dq[:, :, :Sq], dk[:, :, :Sk], dv[:, :, :Sk]


# ---------------------------------------------------------------------------
# custom_vjp wrapper: trainable flash attention (no external kv mask)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention_trainable(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 512,
) -> jnp.ndarray:
    """Flash attention with a Pallas backward pass (O(S) memory both ways).

    Same forward values as ``flash_attention_pipelined`` (it IS the
    forward); the residuals add only O(B*H*Sq) stats. For attention with
    an external kv mask use the chunked path — Stage-I/II training needs
    none (self-attention is unmasked; internal block padding is handled).
    """
    return flash_attention_pipelined(q, k, v, scale=scale)


def _trainable_fwd(q, k, v, scale, block_q, block_k):
    o, (m, l) = flash_attention_pipelined(
        q, k, v, scale=scale, return_stats=True
    )
    return o, (q, k, v, o, m, l)


def _trainable_bwd(scale, block_q, block_k, res, do):
    q, k, v, o, m, l = res
    dq, dk, dv = flash_attention_bwd(
        q, k, v, o, m, l, do,
        scale=scale, block_q=block_q, block_k=block_k,
    )
    return dq, dk, dv


flash_attention_trainable.defvjp(_trainable_fwd, _trainable_bwd)
