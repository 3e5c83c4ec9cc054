"""Fused qk rms-norm + RoPE as a single Pallas VMEM pass.

The reference applies per-head rms qk-norm and rotary embeddings as separate
ops before SDPA (reference: actionmesh/model/utils/attention_processor.py:
121-130, rotary_embedding.py:72-124). As plain XLA ops on TPU these cost
~23 ms per Stage-I block at production shapes (fp32 intermediates of the
(B, H, 33k, 128) tensors materialize in HBM between the norm and the
rotation). This kernel reads the activation once, does norm + rotation in
float32 in VMEM, and writes the result once — memory-bound at HBM speed.

Only the ``half`` RoPE channel layout is supported (contiguous half-slice
rotation, no lane shuffles); both production models use it (the checkpoint
converter permutes projection columns accordingly, see ops/rotary.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _norm_rope_kernel(
    x_ref, scale_ref, cos_ref, sin_ref, o_ref,
    *, eps: float, with_norm: bool, with_rope: bool,
):
    x = x_ref[0].astype(jnp.float32)  # (block_h, block_s, D)
    if with_norm:
        var = jnp.mean(x * x, axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(var + eps)
        x = x * scale_ref[0].astype(jnp.float32)
    if with_rope:
        cos = cos_ref[0][None]  # (1, block_s, D) broadcasts over heads
        sin = sin_ref[0][None]
        h = x.shape[-1] // 2
        rot = jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)
        x = x * cos + rot * sin
    o_ref[0] = x.astype(o_ref.dtype)


def _pure_impl(eps, with_norm, with_rope, x, scale, cos, sin):
    """Pure-XLA reference of the fused op (drives the custom VJP)."""
    xf = x.astype(jnp.float32)
    if with_norm:
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        xf = xf * jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)
    if with_rope:
        cos_b = cos[:, None]
        sin_b = sin[:, None]
        h = xf.shape[-1] // 2
        rot = jnp.concatenate([-xf[..., h:], xf[..., :h]], axis=-1)
        xf = xf * cos_b + rot * sin_b
    return xf.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _fused(eps, with_norm, with_rope, block_s, interpret, x, scale, cos, sin):
    B, H, S, D = x.shape
    block_s = min(block_s, -(-S // 8) * 8)  # sublane-aligned
    # Head-blocked grid (r3): one grid step covers block_h heads. The r2c
    # per-head grid ran B*n_s*H = 512 steps at Stage-I shapes and the
    # fixed per-step cost dominated (measured ~3.5 ms/tensor vs a ~0.7 ms
    # HBM floor); 8 heads per block cuts grid steps 8x at ~25 MB VMEM.
    block_h = H
    while block_h > 1 and block_h * block_s * D * 8 > 24 * 1024 * 1024:
        block_h //= 2
    pad = (-S) % block_s
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        if with_rope:
            cos = jnp.pad(cos, ((0, 0), (0, pad), (0, 0)))
            sin = jnp.pad(sin, ((0, 0), (0, pad), (0, 0)))
    pad_h = (-H) % block_h
    if pad_h:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, 0), (0, 0)))
    n_s = x.shape[2] // block_s
    n_h = x.shape[1] // block_h

    cb = cos.shape[0]  # 1 (shared tables) or B (per-batch tables)
    tab_block = block_s if with_rope else 8
    # Head blocks iterate innermost so the (block_s, D) fp32 tables stay
    # resident across consecutive grid steps instead of re-fetching (the
    # tables are the dominant HBM traffic: fp32 vs the bf16 activations).
    tab_idx = (
        (lambda b, si, hi: (b % cb, si, 0))
        if with_rope
        else (lambda b, si, hi: (0, 0, 0))
    )

    out = pl.pallas_call(
        functools.partial(
            _norm_rope_kernel, eps=eps, with_norm=with_norm,
            with_rope=with_rope,
        ),
        grid=(B, n_s, n_h),
        in_specs=[
            pl.BlockSpec(
                (1, block_h, block_s, D),
                lambda b, si, hi: (b, hi, si, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, D), lambda b, si, hi: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, tab_block, D), tab_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tab_block, D), tab_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_h, block_s, D),
            lambda b, si, hi: (b, hi, si, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, scale[None], cos, sin)
    return out[:, :H, :S]


def _fused_fwd(eps, with_norm, with_rope, block_s, interpret, x, scale, cos, sin):
    out = _fused(eps, with_norm, with_rope, block_s, interpret, x, scale, cos, sin)
    return out, (x, scale, cos, sin)


def _fused_bwd(eps, with_norm, with_rope, block_s, interpret, res, g):
    x, scale, cos, sin = res
    _, vjp = jax.vjp(
        functools.partial(_pure_impl, eps, with_norm, with_rope),
        x, scale, cos, sin,
    )
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def _fused_sharded(
    eps, with_norm, with_rope, block_s, interpret, x, scale, cos, sin, mesh
):
    """Map the fused kernel per-shard: dp over batch, tp over heads, sp over
    sequence. GSPMD cannot partition a pallas_call — left unmapped it
    all-gathers the FULL (B, H, S, D) activation onto every device and runs
    the kernel redundantly (caught by the round-3 production-shape HLO
    audit: 21 x 8 gathers, 72 GB/step). The op is pointwise across
    (batch, head) and pointwise-per-row across S, so sharding needs no
    collectives; per-shard results are bitwise-identical.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    B, H, S, _ = x.shape
    dp = axis_sizes.get("dp", 1)
    b_ax = "dp" if dp > 1 and B % dp == 0 else None
    h_ax = "tp" if axis_sizes.get("tp", 1) > 1 and H % axis_sizes["tp"] == 0 else None
    sp = axis_sizes.get("sp", 1)
    s_ax = "sp" if sp > 1 and S % sp == 0 else None
    if s_ax is None and sp > 1:
        # Per-frame tensors on an sp mesh (odd per-frame S): shard the
        # merged (g*B*T) batch over sp instead of replicating — otherwise
        # this spec forces a per-layer all-gather of the sp-sharded
        # activations (21 x 134 MB q + 21 x 17 MB context k per Stage-I
        # step at production shape; same reasoning as
        # ops/attention._sharded_attention).
        if b_ax is not None and B % (dp * sp) == 0:
            b_ax = ("dp", "sp")
        elif b_ax is None and B % sp == 0:
            b_ax = "sp"
    cb = cos.shape[0]
    tab_b = b_ax if (with_rope and cb == B) else None
    tab_s = s_ax if with_rope else None

    fn = shard_map(
        lambda x_, sc_, c_, s_: _fused(
            eps, with_norm, with_rope, block_s, interpret, x_, sc_, c_, s_
        ),
        mesh=mesh,
        in_specs=(
            P(b_ax, h_ax, s_ax, None),
            P(None),
            P(tab_b, tab_s, None),
            P(tab_b, tab_s, None),
        ),
        out_specs=P(b_ax, h_ax, s_ax, None),
        check_rep=False,
    )
    return fn(x, scale, cos, sin)


@functools.partial(
    jax.jit,
    static_argnames=("eps", "block_s", "interpret", "mesh"),
)
def fused_rms_rope(
    x: jnp.ndarray,
    scale: Optional[jnp.ndarray],
    cos: Optional[jnp.ndarray],
    sin: Optional[jnp.ndarray],
    eps: float = 1e-6,
    block_s: int = 2048,
    interpret: Optional[bool] = None,
    mesh=None,
) -> jnp.ndarray:
    """rms_norm(x) then half-layout RoPE, fused; either step optional.

    Args:
        x: (B, H, S, D) activations (any float dtype; math is fp32).
        scale: (D,) rms-norm scale, or None to skip the norm.
        cos/sin: (S, D) or (B, S, D) float32 half-layout tables, or None
            to skip the rotation.
        mesh: device mesh — the kernel then runs per-shard under shard_map
            (see _fused_sharded); REQUIRED for multi-chip execution, since
            GSPMD would otherwise de-shard the activation around the
            pallas_call.

    Returns x.dtype, same shape. Matches
    ``apply_rotary_embedding(rms_norm(x), cos, sin, layout="half")``;
    differentiable via a custom VJP over that pure-XLA composition.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    with_norm = scale is not None
    with_rope = cos is not None
    if not (with_norm or with_rope):
        return x

    D = x.shape[-1]
    # Dummies keep the pallas_call arity fixed; blocks are tiny when unused.
    if scale is None:
        scale = jnp.zeros((D,), jnp.float32)
    if cos is None:
        cos = jnp.zeros((1, 8, D), jnp.float32)
        sin = jnp.zeros((1, 8, D), jnp.float32)
    elif cos.ndim == 2:
        cos = cos[None]
        sin = sin[None]
    if mesh is not None:
        return _fused_sharded(
            eps, with_norm, with_rope, block_s, interpret, x, scale, cos, sin,
            mesh,
        )
    return _fused(eps, with_norm, with_rope, block_s, interpret, x, scale, cos, sin)
