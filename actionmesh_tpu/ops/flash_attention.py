"""Pallas TPU flash attention (fp32 online softmax, O(S) memory).

Replaces the CUDA SDPA flash kernels the reference depends on
(reference: actionmesh/model/utils/attention_processor.py:25-34,133-139).
Stage I inflated self-attention runs this at seq ~32,784 x head_dim 128.

Layout: q (B, H, Sq, D), k/v (B, H, Sk, D), optional kv_mask (B, Sk).
Sequences are padded to block multiples outside the kernel; padded KV
positions are masked to -inf, padded Q rows are sliced off afterwards.

Grid iterates (B, H, q_block, k_block) with the KV axis innermost, so the
fp32 accumulator / running max / running sum live in VMEM scratch across the
KV sweep — the classic flash-attention recurrence on the MXU.

Tuning (measured on v5e, seq 32784, D=128, bf16): the software-pipelined
kernel (``flash_attention_pipelined``, U=3 sub-blocks of 768x1024 per grid
step) reaches ~147 TFLOP/s (~75% MFU) — issuing sub-block i+1's QK^T dot
before sub-block i's exp overlaps MXU with VPU transcendentals; the
remaining gap to peak is intrinsic VPU work (exp + online-softmax
reductions ~ MXU time per block). Larger q blocks (1280+) regress despite
less K/V refetch. The one-block kernel peaks at ~126 (1024x1024). Both need
``vmem_limit_bytes`` raised past the 16 MiB scoped default (v5e has
128 MiB VMEM). Edge-only masking of the final padded KV block avoids
per-block VPU select work. exp2-instead-of-exp and fusing qk-norm/RoPE
into the kernel were both measured slower (see flash_attention_fused).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(
    q_ref, k_ref, v_ref, mask_ref, o_ref, *rest,
    scale: float, mask_mode: str, with_stats: bool = False,
):
    if with_stats:
        m_out_ref, l_out_ref, acc_ref, m_ref, l_ref = rest
    else:
        acc_ref, m_ref, l_ref = rest
    k_idx = pl.program_id(3)
    n_k = pl.num_programs(3)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0, 0]  # (bq, D)
    k = k_ref[0, 0]  # (bk, D)
    v = v_ref[0, 0]  # (bk, D)

    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, bk)
    s = s * scale
    if mask_mode == "full":
        s = jnp.where(mask_ref[0, 0][None, :] != 0, s, NEG_INF)
    elif mask_mode == "edge":
        # only the last KV block contains padding
        s = jnp.where(
            jnp.logical_or(k_idx < n_k - 1, mask_ref[0, 0][None, :] != 0),
            s,
            NEG_INF,
        )

    m_prev = m_ref[:, :1]  # (bq, 1)
    l_prev = l_ref[:, :1]
    m_cur = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
    p = jnp.exp(s - m_cur)
    alpha = jnp.exp(m_prev - m_cur)
    l_cur = l_prev * alpha + p.sum(axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:, :1] = m_cur
    l_ref[:, :1] = l_cur

    @pl.when(k_idx == n_k - 1)
    def _finalize():
        l = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0, 0] = (acc_ref[:] / l).astype(o_ref.dtype)
        if with_stats:
            m_out_ref[0, 0] = jnp.broadcast_to(
                jnp.transpose(m_ref[:, :1], (1, 0)), m_out_ref[0, 0].shape
            )
            l_out_ref[0, 0] = jnp.broadcast_to(
                jnp.transpose(l_ref[:, :1], (1, 0)), l_out_ref[0, 0].shape
            )


def _pad_to(x: jnp.ndarray, axis: int, multiple: int, value=0.0) -> jnp.ndarray:
    pad = (-x.shape[axis]) % multiple
    if pad == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, pad)
    return jnp.pad(x, pads, constant_values=value)


# ---------------------------------------------------------------------------
# Software-pipelined variant: U KV sub-blocks per kernel invocation
# ---------------------------------------------------------------------------

def _flash_kernel_pipelined(
    q_ref, k_ref, v_ref, mask_ref, o_ref, *rest,
    scale: float, mask_mode: str, unroll: int, block_k: int,
    with_stats: bool = False,
):
    if with_stats:
        m_out_ref, l_out_ref, acc_ref, m_ref, l_ref = rest
    else:
        acc_ref, m_ref, l_ref = rest
    """Online-softmax flash step over ``unroll`` KV sub-blocks.

    The next sub-block's QK^T dot (MXU) is issued *before* the current
    sub-block's exp/rescale (VPU) and PV dot, so Mosaic can overlap the MXU
    matmul with the ~block_q*block_k transcendentals — the serial
    s -> exp -> PV chain of the one-block kernel leaves the MXU idle during
    the exp. State (acc/m/l) lives in VMEM scratch across the KV sweep.
    """
    k_idx = pl.program_id(3)
    n_k = pl.num_programs(3)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # Fold the softmax scale into q once (bq x D) instead of scaling every
    # (bq x block_k) score block on the VPU.
    q = (q_ref[0, 0].astype(jnp.float32) * scale).astype(q_ref.dtype)

    def qk(u):
        k_u = k_ref[0, 0, u * block_k : (u + 1) * block_k]
        s = jax.lax.dot_general(
            q, k_u,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if mask_mode == "full":
            mvec = mask_ref[0, 0, u * block_k : (u + 1) * block_k]
            s = jnp.where(mvec[None, :] != 0, s, NEG_INF)
        elif mask_mode == "edge":
            # only the globally-last sub-block contains padding
            mvec = mask_ref[0, 0, u * block_k : (u + 1) * block_k]
            s = jnp.where(
                jnp.logical_or(
                    k_idx * unroll + u < n_k * unroll - 1, mvec[None, :] != 0
                ),
                s,
                NEG_INF,
            )
        return s

    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    acc = acc_ref[:]

    s_next = qk(0)
    for u in range(unroll):
        s_cur = s_next
        if u + 1 < unroll:
            # issue the next MXU dot ahead of this block's VPU work
            s_next = qk(u + 1)
        m_cur = jnp.maximum(m_prev, s_cur.max(axis=-1, keepdims=True))
        p = jnp.exp(s_cur - m_cur)
        alpha = jnp.exp(m_prev - m_cur)
        l_prev = l_prev * alpha + p.sum(axis=-1, keepdims=True)
        v_u = v_ref[0, 0, u * block_k : (u + 1) * block_k]
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v_u.dtype), v_u,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_prev = m_cur
    acc_ref[:] = acc
    m_ref[:, :1] = m_prev
    l_ref[:, :1] = l_prev

    @pl.when(k_idx == n_k - 1)
    def _finalize():
        l = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0, 0] = (acc_ref[:] / l).astype(o_ref.dtype)
        if with_stats:
            # (bq, 1) sublane vectors -> 8-sublane lane-vector output tiles
            m_out_ref[0, 0] = jnp.broadcast_to(
                jnp.transpose(m_ref[:, :1], (1, 0)), m_out_ref[0, 0].shape
            )
            l_out_ref[0, 0] = jnp.broadcast_to(
                jnp.transpose(l_ref[:, :1], (1, 0)), l_out_ref[0, 0].shape
            )


@functools.partial(
    jax.jit,
    static_argnames=(
        "scale", "block_q", "block_k", "unroll", "interpret", "return_stats"
    ),
)
def flash_attention_pipelined(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    kv_mask: Optional[jnp.ndarray] = None,
    block_q: int = 768,
    block_k: int = 1024,
    unroll: int = 3,
    interpret: Optional[bool] = None,
    return_stats: bool = False,
):
    """Flash attention with ``unroll`` software-pipelined KV sub-blocks.

    Identical math to ``flash_attention``; each grid step fetches
    ``unroll * block_k`` KV rows and interleaves MXU dots with VPU softmax
    work across sub-blocks.

    With ``return_stats=True`` also returns the online-softmax statistics
    ``(m, l)`` per query row ((B, H, Sq) fp32: running max and normalizer),
    enabling cross-shard combination of partial attention results — the
    building block of the ring (sequence-parallel) path in ops/attention.py.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    if scale is None:
        scale = D ** -0.5

    def _round_up(x: int, m: int) -> int:
        return -(-x // m) * m

    block_q = min(block_q, _round_up(Sq, 128))
    fetch_k = block_k * unroll
    if _round_up(Sk, 128) < fetch_k:
        # KV too short to pipeline; use the one-block kernel, sized so the
        # whole KV fits one block and Q blocks are as large as VMEM allows —
        # measured ~9.98 ms vs 11.92 ms at the Stage-I cross-attention shape
        # (Sq 2049, Sk 257) for the default 512/1024 split. When the whole
        # KV fits a single <=2176 block, use exactly that: 1024-blocking
        # Sk=2049 pads it to 3072 (+50% dead K work — the TripoSG DiT
        # self-attention shape; 2.59 -> 2.40 ms measured, BENCH_NOTES r3i).
        bk_one = _round_up(Sk, 128)
        return flash_attention(
            q, k, v, scale=scale, kv_mask=kv_mask,
            block_q=min(2176, _round_up(Sq, 128)),
            block_k=bk_one if bk_one <= 2176 else min(1024, bk_one),
            interpret=interpret,
            return_stats=return_stats,
        )

    k_pad = (-Sk) % fetch_k
    if kv_mask is None:
        mask_mode = "edge" if k_pad else "none"
        kv_mask = jnp.ones((B, Sk), dtype=jnp.int32)
    else:
        mask_mode = "full"
        kv_mask = kv_mask.astype(jnp.int32)

    qp = _pad_to(q, 2, block_q)
    kp = _pad_to(k, 2, fetch_k)
    vp = _pad_to(v, 2, fetch_k)
    maskp = _pad_to(kv_mask, 1, fetch_k, value=0)[:, None, :]

    n_q = qp.shape[2] // block_q
    n_k = kp.shape[2] // fetch_k

    out_specs = pl.BlockSpec(
        (1, 1, block_q, D),
        lambda b, h, qi, ki: (b, h, qi, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct(qp.shape, q.dtype)
    if return_stats:
        stats_spec = pl.BlockSpec(
            (1, 1, 8, block_q),
            lambda b, h, qi, ki: (b, h, 0, qi),
            memory_space=pltpu.VMEM,
        )
        stats_shape = jax.ShapeDtypeStruct((B, H, 8, qp.shape[2]), jnp.float32)
        out_specs = (out_specs, stats_spec, stats_spec)
        out_shape = (out_shape, stats_shape, stats_shape)

    grid = (B, H, n_q, n_k)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel_pipelined,
            scale=scale, mask_mode=mask_mode, unroll=unroll, block_k=block_k,
            with_stats=return_stats,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, D),
                lambda b, h, qi, ki: (b, h, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, fetch_k, D),
                lambda b, h, qi, ki: (b, h, ki, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, fetch_k, D),
                lambda b, h, qi, ki: (b, h, ki, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, fetch_k),
                lambda b, h, qi, ki: (b, 0, ki),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, D), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            # v5e has 128 MiB VMEM/core; the 16 MiB scoped default rejects
            # double-buffered fp32 score blocks
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Sq * Sk * D,
            bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize,
            transcendentals=B * H * Sq * Sk,
        ),
        interpret=interpret,
    )(qp, kp, vp, maskp)
    if return_stats:
        o, m, l = out
        return o[:, :, :Sq], (m[:, :, 0, :Sq], l[:, :, 0, :Sq])
    return out[:, :, :Sq]


# ---------------------------------------------------------------------------
# Fused variant: rms qk-norm + RoPE applied inside the kernel
# ---------------------------------------------------------------------------

def _norm_rope(x, scale_row, cos, sin, eps: float = 1e-6):
    """fp32 rms-norm over D then pairwise rotation. x (S, D) block.

    The pairwise rotation (x0, x1, ...) -> (-x1, x0, -x3, x2, ...) is
    expressed with lane rolls + an even/odd mask — Mosaic does not support
    the (S, D) -> (S, D/2, 2) vector reshape.
    """
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps) * scale_row
    S, D = xf.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, D), 1)
    even = (lane % 2) == 0
    swapped = jnp.where(
        even, pltpu.roll(xf, D - 1, axis=1), pltpu.roll(xf, 1, axis=1)
    )
    rotated = jnp.where(even, -swapped, swapped)
    return xf * cos + rotated * sin


def _flash_fused_kernel(
    q_ref, k_ref, v_ref, cosq_ref, cosk_ref, sinq_ref, sink_ref,
    qs_ref, ks_ref, mask_ref,
    o_ref, acc_ref, m_ref, l_ref, qbuf_ref,
    *, scale: float, mask_mode: str,
):
    k_idx = pl.program_id(3)
    n_k = pl.num_programs(3)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        # normalize+rotate the q block once per KV sweep
        qbuf_ref[0] = _norm_rope(
            q_ref[0, 0], qs_ref[0, 0], cosq_ref[0, 0], sinq_ref[0, 0]
        )

    # k block: normalize+rotate with the K-side tables
    k = _norm_rope(k_ref[0, 0], ks_ref[0, 0], cosk_ref[0, 0], sink_ref[0, 0])
    q = qbuf_ref[0]
    v = v_ref[0, 0]

    s = jax.lax.dot_general(
        q.astype(v.dtype), k.astype(v.dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    if mask_mode == "full":
        s = jnp.where(mask_ref[0, 0][None, :] != 0, s, NEG_INF)
    elif mask_mode == "edge":
        s = jnp.where(
            jnp.logical_or(k_idx < n_k - 1, mask_ref[0, 0][None, :] != 0),
            s,
            NEG_INF,
        )

    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_cur = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
    p = jnp.exp(s - m_cur)
    alpha = jnp.exp(m_prev - m_cur)
    l_cur = l_prev * alpha + p.sum(axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:, :1] = m_cur
    l_ref[:, :1] = l_cur

    @pl.when(k_idx == n_k - 1)
    def _finalize():
        l = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0, 0] = (acc_ref[:] / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k")
)
def flash_attention_fused(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    q_norm_scale: jnp.ndarray,
    k_norm_scale: jnp.ndarray,
    scale: Optional[float] = None,
    block_q: int = 1024,
    block_k: int = 1024,
) -> jnp.ndarray:
    """Flash attention with fused fp32 rms qk-norm + RoPE.

    Applies the Stage-I self-attention pre-processing (qk-norm then RoPE,
    reference attention_processor.py:121-130) inside the kernel. Measured
    on v5e at seq 32784 this is NOT faster than the unfused path (98 vs
    110 TFLOP/s): the K-side norm+rotate recomputes once per Q block,
    while XLA fuses the standalone norm/rope into neighbouring ops at ~4 ms
    total. Kept as an optional variant; the default path stays unfused.

    q/k/v (B, H, S, D) pre-norm projections; cos/sin (B, S, D) RoPE tables;
    q_norm_scale/k_norm_scale (D,) rms-norm weights.
    """
    B, H, S, D = q.shape
    if scale is None:
        scale = D ** -0.5

    def _round_up(x: int, m: int) -> int:
        return -(-x // m) * m

    block_q = min(block_q, _round_up(S, 128))
    block_k = min(block_k, _round_up(S, 128))
    # one shared block size keeps a single cos/sin block spec
    block = min(block_q, block_k)
    mask_mode = "edge" if S % block else "none"

    qp = _pad_to(q, 2, block)
    kp = _pad_to(k, 2, block)
    vp = _pad_to(v, 2, block)
    cosp = _pad_to(cos.astype(jnp.float32), 1, block)[:, None]  # (B,1,Sp,D)
    sinp = _pad_to(sin.astype(jnp.float32), 1, block)[:, None]
    maskp = jnp.ones((B, 1, qp.shape[2]), jnp.int32)
    if S % block:
        maskp = maskp.at[:, :, S:].set(0)
    qs = q_norm_scale.astype(jnp.float32)[None, None, :]  # (1,1,D)
    ks = k_norm_scale.astype(jnp.float32)[None, None, :]

    n_b = qp.shape[2] // block
    grid = (B, H, n_b, n_b)
    out = pl.pallas_call(
        functools.partial(
            _flash_fused_kernel, scale=scale, mask_mode=mask_mode
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block, D), lambda b, h, qi, ki: (b, h, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block, D), lambda b, h, qi, ki: (b, h, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block, D), lambda b, h, qi, ki: (b, h, ki, 0),
                         memory_space=pltpu.VMEM),
            # cos/sin tables passed twice: q-block rows and k-block rows
            pl.BlockSpec((1, 1, block, D), lambda b, h, qi, ki: (b, 0, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block, D), lambda b, h, qi, ki: (b, 0, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block, D), lambda b, h, qi, ki: (b, 0, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block, D), lambda b, h, qi, ki: (b, 0, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda b, h, qi, ki: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda b, h, qi, ki: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block), lambda b, h, qi, ki: (b, 0, ki),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block, D), lambda b, h, qi, ki: (b, h, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block, D), jnp.float32),
            pltpu.VMEM((block, 128), jnp.float32),
            pltpu.VMEM((block, 128), jnp.float32),
            pltpu.VMEM((1, block, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            # v5e has 128 MiB VMEM/core; the 16 MiB scoped default rejects
            # double-buffered fp32 score blocks
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(qp, kp, vp, cosp, cosp, sinp, sinp, qs, ks, maskp)
    return out[:, :, :S]


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "block_k", "interpret", "return_stats"),
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    kv_mask: Optional[jnp.ndarray] = None,
    block_q: int = 1024,
    block_k: int = 1024,
    interpret: Optional[bool] = None,
    return_stats: bool = False,
):
    """Fused flash attention. Returns (B, H, Sq, D) in q.dtype; with
    ``return_stats=True`` also the per-row online-softmax (m, l) — see
    flash_attention_pipelined.

    ``interpret=None`` auto-selects Pallas interpreter mode off-TPU (used by
    the virtual-CPU-mesh tests and the driver's multichip dryrun, so the
    sharded code path is identical on CPU and TPU).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    if scale is None:
        scale = D ** -0.5

    # Block sizes must be multiples of the (8, 128) TPU tile; sequences pad
    # up to the block size with masked-out positions.
    def _round_up(x: int, m: int) -> int:
        return -(-x // m) * m

    block_q = min(block_q, _round_up(Sq, 128))
    block_k = min(block_k, _round_up(Sk, 128))

    k_pad = (-Sk) % block_k
    if kv_mask is None:
        mask_mode = "edge" if k_pad else "none"
        kv_mask = jnp.ones((B, Sk), dtype=jnp.int32)
    else:
        mask_mode = "full"
        kv_mask = kv_mask.astype(jnp.int32)

    qp = _pad_to(q, 2, block_q)
    kp = _pad_to(k, 2, block_k)
    vp = _pad_to(v, 2, block_k)
    maskp = _pad_to(kv_mask, 1, block_k, value=0)[:, None, :]  # (B, 1, Skp)

    n_q = qp.shape[2] // block_q
    n_k = kp.shape[2] // block_k

    out_specs = pl.BlockSpec(
        (1, 1, block_q, D),
        lambda b, h, qi, ki: (b, h, qi, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct(qp.shape, q.dtype)
    if return_stats:
        stats_spec = pl.BlockSpec(
            (1, 1, 8, block_q),
            lambda b, h, qi, ki: (b, h, 0, qi),
            memory_space=pltpu.VMEM,
        )
        stats_shape = jax.ShapeDtypeStruct((B, H, 8, qp.shape[2]), jnp.float32)
        out_specs = (out_specs, stats_spec, stats_spec)
        out_shape = (out_shape, stats_shape, stats_shape)

    grid = (B, H, n_q, n_k)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, mask_mode=mask_mode,
            with_stats=return_stats,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, D),
                lambda b, h, qi, ki: (b, h, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_k, D),
                lambda b, h, qi, ki: (b, h, ki, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_k, D),
                lambda b, h, qi, ki: (b, h, ki, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_k),
                lambda b, h, qi, ki: (b, 0, ki),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, D), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            # v5e has 128 MiB VMEM/core; the 16 MiB scoped default rejects
            # double-buffered fp32 score blocks
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Sq * Sk * D,
            bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize,
            transcendentals=B * H * Sq * Sk,
        ),
        interpret=interpret,
    )(qp, kp, vp, maskp)
    if return_stats:
        o, m, l = out
        return o[:, :, :Sq], (m[:, :, 0, :Sq], l[:, :, 0, :Sq])
    return out[:, :, :Sq]
