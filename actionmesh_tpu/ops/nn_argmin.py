"""Pallas fused nearest-neighbor argmin kernel (TPU).

For each point in x, the index of its nearest point in y — the inner loop
of gradient ICP (actionbench/icp.py) and the device-side chamfer. The
XLA formulation materializes the (R, N, M) distance tensor in HBM (argmin
cannot fuse into the matmul producing the cross term), which makes ICP
HBM-bound: one eval sample moved ~2 TB of distance blocks. This kernel
keeps each (block_n, block_m) distance tile in VMEM, carries a running
(min, argmin) per row across the M sweep, and writes only the (R, N)
int32 result — the flash-attention structure applied to argmin.

Distance decomposition: argmin_j |x - y_j|^2 = argmin_j (|y_j|^2 - 2 x.y_j)
(the |x|^2 term is constant per row), so the tile is one MXU dot plus a
row-broadcast add. Channels pad 3 -> 8 on the contraction axis (zeros
contribute nothing).

Measured (R=384, N=M=10k, fp32): ~70 ms per call vs ~3.7 s for the XLA
scan path — ~50x. ICP eval sample: 89 s -> ~13 s.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 3.0e38  # python float: a jnp scalar would be captured as a const


def _nn_kernel(
    x_ref, y_ref, o_ref, m_ref, a_ref,
    *, block_m: int, m_total: int, precision: str,
):
    """Grid (R, N/bn, M/bm), M innermost. x (1, 8, bn), y (1, 8, bm)."""
    k_idx = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _INF)
        a_ref[:] = jnp.zeros_like(a_ref)

    x = x_ref[0]  # (8, bn)
    y = y_ref[0]  # (8, bm)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # cross term on the MXU: (bn, bm) = x^T @ y, contracting the channel dim.
    # A plain fp32 dot runs at bf16 input precision on the MXU (~0.4% rel),
    # enough to flip argmins between genuinely different neighbors (the
    # pre-kernel XLA einsum path silently had that flaw). Precision modes:
    #   * compensated (default): bf16x2 error-free-split, 3 bf16 dots,
    #     residual ~|x_lo||y_lo| ~ 1.5e-5 rel — below data noise.
    #   * exact: Precision.HIGHEST (6-pass fp32 emulation), ~3x slower.
    if precision == "exact":
        s = jax.lax.dot_general(
            x, y,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    else:
        xh = x.astype(jnp.bfloat16)
        xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        yh = y.astype(jnp.bfloat16)
        yl = (y - yh.astype(jnp.float32)).astype(jnp.bfloat16)
        s = dot(xh, yh) + (dot(xh, yl) + dot(xl, yh))
    y_sq = jnp.sum(y * y, axis=0, keepdims=True)  # (1, bm)
    d = y_sq - 2.0 * s  # (bn, bm); |x|^2 omitted (row-constant)

    lane = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    j_global = k_idx * block_m + lane
    d = jnp.where(j_global < m_total, d, _INF)

    d_min = jnp.min(d, axis=1, keepdims=True)  # (bn, 1)
    big = jnp.int32(2**31 - 1)
    arg_local = jnp.min(
        jnp.where(d == d_min, j_global, big), axis=1, keepdims=True
    )

    m_prev = m_ref[:, :1]
    a_prev = a_ref[:, :1]
    better = d_min < m_prev
    m_ref[:, :1] = jnp.where(better, d_min, m_prev)
    a_ref[:, :1] = jnp.where(better, arg_local, a_prev)

    @pl.when(k_idx == n_k - 1)
    def _finalize():
        # (bn, 1) sublane vector -> lane vector, broadcast to the 8-sublane
        # output tile (Mosaic requires sublane-divisible output blocks;
        # the caller slices row 0)
        o_ref[0] = jnp.broadcast_to(
            jnp.transpose(a_ref[:, :1], (1, 0)), o_ref[0].shape
        )


def _pad_axis(x, axis, mult):
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, pad)
    return jnp.pad(x, pads)


@functools.partial(
    jax.jit, static_argnames=("block_n", "block_m", "interpret", "precision")
)
def nn_argmin(
    x: jnp.ndarray,
    y: jnp.ndarray,
    block_n: int = 512,
    block_m: int = 2048,
    interpret: bool | None = None,
    precision: str = "compensated",
) -> jnp.ndarray:
    """For each x point the argmin-distance index into y. No gradient.

    x (R, N, 3), y (R, M, 3) float -> (R, N) int32. Ties resolve to the
    smallest index (matching jnp.argmin / np.argmin).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    x = jax.lax.stop_gradient(x.astype(jnp.float32))
    y = jax.lax.stop_gradient(y.astype(jnp.float32))
    R, N, C = x.shape
    M = y.shape[1]
    assert C == y.shape[2] and C <= 8

    # channel-major layout: lane axis = points, sublane axis = 8 channels
    xt = _pad_axis(jnp.swapaxes(x, 1, 2), 1, 8)  # (R, 8, N)
    yt = _pad_axis(jnp.swapaxes(y, 1, 2), 1, 8)  # (R, 8, M)
    bn = min(block_n, -(-N // 128) * 128)
    bm = min(block_m, -(-M // 128) * 128)
    xt = _pad_axis(xt, 2, bn)
    yt = _pad_axis(yt, 2, bm)
    n_n = xt.shape[2] // bn
    n_m = yt.shape[2] // bm

    out = pl.pallas_call(
        functools.partial(_nn_kernel, block_m=bm, m_total=M, precision=precision),
        grid=(R, n_n, n_m),
        in_specs=[
            pl.BlockSpec((1, 8, bn), lambda r, n, m: (r, 0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, bm), lambda r, n, m: (r, 0, m),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, bn), lambda r, n, m: (r, 0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 8, xt.shape[2]), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((bn, 128), jnp.float32),
            pltpu.VMEM((bn, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xt, yt)
    return out[:, 0, :N]
