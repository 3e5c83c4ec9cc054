"""Functional NN layers: (params pytree, pure apply) pairs.

Every model in the framework is a pytree of parameters plus pure apply
functions, so whole pipeline stages jit/pjit-compile into single XLA
programs. Parameter naming mirrors the reference's diffusers modules
(to_q/to_k/to_v/to_out, net.0/net.2, ...) so the safetensors->JAX converter
(utils/weights.py) is a mechanical rename+transpose.

Precision policy (matches the reference's autocast islands):
  * linear kernels are stored in the inference compute dtype (bf16 on TPU);
  * all layer norms compute in float32 (diffusers FP32LayerNorm);
  * qk rms-norm, RoPE, and softmax are float32 (see ops/).

Reference: actionmesh/model/utils/block.py:19-154, diffusers Attention.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp

from actionmesh_tpu.ops.attention import dot_product_attention
from actionmesh_tpu.ops.rotary import apply_rotary_embedding

Params = dict

# Step-time levers (read at trace time; see BENCH_NOTES r3b for the
# measured effect of each). Single-chip only — both change batching or
# kernel concatenation in ways the dp/tp shardings don't cover (the
# `mesh is None` guards below keep sharded paths untouched).
# SKIP_UNCOND_XATTN is bitwise-exact (zero k/v => out-proj bias) and
# measured +3.5% at production shape, so it defaults ON; FUSE_QKV
# measured -3.8% (weight-concat rematerialization) and defaults OFF.
_FUSE_QKV = os.environ.get("ACTIONMESH_FUSE_QKV", "0") == "1"
_SKIP_UNCOND_XATTN = os.environ.get("ACTIONMESH_SKIP_UNCOND_XATTN", "1") == "1"


# ---------------------------------------------------------------------------
# Initializers (LeCun-uniform matching torch.nn.Linear defaults)
# ---------------------------------------------------------------------------

def init_linear(
    key: jax.Array,
    in_dim: int,
    out_dim: int,
    bias: bool = True,
    dtype: jnp.dtype = jnp.float32,
) -> Params:
    """Kaiming-uniform init like torch.nn.Linear: U(-1/sqrt(in), 1/sqrt(in))."""
    kkey, bkey = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    params = {
        "kernel": jax.random.uniform(
            kkey, (in_dim, out_dim), dtype=jnp.float32, minval=-bound, maxval=bound
        ).astype(dtype)
    }
    if bias:
        params["bias"] = jax.random.uniform(
            bkey, (out_dim,), dtype=jnp.float32, minval=-bound, maxval=bound
        ).astype(dtype)
    return params


def init_layer_norm(dim: int) -> Params:
    return {
        "scale": jnp.ones((dim,), jnp.float32),
        "bias": jnp.zeros((dim,), jnp.float32),
    }


def init_rms_norm(dim: int) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32)}


# ---------------------------------------------------------------------------
# Apply functions
# ---------------------------------------------------------------------------

def linear(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    w = params["kernel"]
    y = jnp.dot(x.astype(w.dtype), w)
    if "bias" in params:
        y = y + params["bias"]
    return y


def layer_norm(params: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Float32 layer norm (diffusers FP32LayerNorm); returns x.dtype.

    One-pass variance (E[x^2] - E[x]^2): both reductions share a single
    read of x, measurably faster than the two-pass form on TPU. Safe in
    fp32 at transformer activation scales (mean^2/var << 2^24).
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    msq = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(msq - mean * mean, 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(orig_dtype)


def rms_norm(params: Params, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Float32 RMS norm over the last axis; returns x.dtype."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32)
    return y.astype(orig_dtype)


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    """Exact erf GELU (torch nn.GELU default; jax default is tanh approx)."""
    return jax.nn.gelu(x, approximate=False)


def feed_forward(
    params: Params, x: jnp.ndarray, gelu_approx: bool = False
) -> jnp.ndarray:
    """diffusers FeedForward('gelu'): Linear -> GELU -> Linear.

    ``gelu_approx=True`` uses the tanh GELU approximation, which on TPU is
    fully fused into the surrounding matmuls (erf costs ~8 ms per Stage-I
    block at production shapes, tanh is free). The erf-vs-tanh output delta
    on a bf16 model is below the bf16-vs-fp32 quantization envelope
    (tests/test_models.py::test_gelu_tanh_within_bf16_noise), so bf16
    inference configs default to the approximation; fp32 parity tests pin
    ``gelu_approx=False``.
    """
    h = jax.nn.gelu(linear(params["net_0"], x), approximate=gelu_approx)
    return linear(params["net_2"], h)


def init_feed_forward(
    key: jax.Array, dim: int, inner_dim: int, bias: bool = True,
    dtype: jnp.dtype = jnp.float32,
) -> Params:
    k0, k2 = jax.random.split(key)
    return {
        "net_0": init_linear(k0, dim, inner_dim, bias=bias, dtype=dtype),
        "net_2": init_linear(k2, inner_dim, dim, bias=bias, dtype=dtype),
    }


# ---------------------------------------------------------------------------
# Multi-head attention layer (diffusers Attention + custom processor)
# ---------------------------------------------------------------------------

def init_attention(
    key: jax.Array,
    query_dim: int,
    heads: int,
    cross_attention_dim: Optional[int] = None,
    qk_norm: bool = False,
    cross_norm: Optional[str] = None,
    bias: bool = False,
    out_bias: bool = True,
    dtype: jnp.dtype = jnp.float32,
) -> Params:
    kv_dim = cross_attention_dim if cross_attention_dim is not None else query_dim
    dim_head = query_dim // heads
    kq, kk, kv, ko = jax.random.split(key, 4)
    params: Params = {
        "to_q": init_linear(kq, query_dim, query_dim, bias=bias, dtype=dtype),
        "to_k": init_linear(kk, kv_dim, query_dim, bias=bias, dtype=dtype),
        "to_v": init_linear(kv, kv_dim, query_dim, bias=bias, dtype=dtype),
        "to_out": init_linear(ko, query_dim, query_dim, bias=out_bias, dtype=dtype),
    }
    if qk_norm:
        params["norm_q"] = init_rms_norm(dim_head)
        params["norm_k"] = init_rms_norm(dim_head)
    if cross_norm == "layer_norm":
        params["norm_cross"] = init_layer_norm(kv_dim)
    return params


def attention(
    params: Params,
    hidden_states: jnp.ndarray,
    heads: int,
    encoder_hidden_states: Optional[jnp.ndarray] = None,
    freqs_rot: Optional[tuple[jnp.ndarray, jnp.ndarray]] = None,
    kv_mask: Optional[jnp.ndarray] = None,
    attn_impl: str = "auto",
    rope_layout: str = "interleaved",
    mesh=None,
    uncond_prefix: int = 0,
) -> jnp.ndarray:
    """Multi-head (self or cross) attention on (B, S, D) activations.

    Matches reference AttentionProcessor (attention_processor.py:36-168):
    optional per-head rms qk-norm, optional RoPE on q and k, fused SDPA with
    fp32 softmax, output projection.

    ``uncond_prefix``: number of leading batch entries whose
    ``encoder_hidden_states`` are all-zero (CFG unconditional-image
    branches). With no kv bias and no norm_cross, zero context gives
    k = v = 0 exactly, so softmax is uniform over zero values and the
    attention output is exactly the out-projection bias — those entries'
    cross-attention is a constant and is skipped (lever, single-chip).
    """
    B, S, _ = hidden_states.shape
    if (
        _SKIP_UNCOND_XATTN
        and encoder_hidden_states is not None
        and 0 < uncond_prefix < B
        and mesh is None
        and "norm_cross" not in params
        and "bias" not in params["to_k"]
        and "bias" not in params["to_v"]
    ):
        cond = attention(
            params,
            hidden_states[uncond_prefix:],
            heads,
            encoder_hidden_states[uncond_prefix:],
            freqs_rot=freqs_rot,
            kv_mask=kv_mask[uncond_prefix:] if kv_mask is not None else None,
            attn_impl=attn_impl,
            rope_layout=rope_layout,
        )
        out_bias = params["to_out"].get("bias")
        if out_bias is None:
            uncond = jnp.zeros((uncond_prefix, S, cond.shape[-1]), cond.dtype)
        else:
            uncond = jnp.broadcast_to(
                out_bias.astype(cond.dtype),
                (uncond_prefix, S, cond.shape[-1]),
            )
        return jnp.concatenate([uncond, cond], axis=0)

    kv_src = (
        hidden_states if encoder_hidden_states is None else encoder_hidden_states
    )
    if encoder_hidden_states is not None and "norm_cross" in params:
        kv_src = layer_norm(params["norm_cross"], kv_src)

    if (
        _FUSE_QKV
        and encoder_hidden_states is None
        and mesh is None
        and "bias" not in params["to_q"]
        and "bias" not in params["to_k"]
        and "bias" not in params["to_v"]
    ):
        # One (D, 3D) matmul instead of three (lever): XLA does not merge
        # sibling gemms itself. The concat re-materializes 3*D*D weights
        # per call (~25 MB bf16 at Stage-I width — negligible vs the gemm).
        w = jnp.concatenate(
            [params["to_q"]["kernel"], params["to_k"]["kernel"],
             params["to_v"]["kernel"]], axis=1,
        )
        qkv = hidden_states @ w.astype(hidden_states.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        q = linear(params["to_q"], hidden_states)
        k = linear(params["to_k"], kv_src)
        v = linear(params["to_v"], kv_src)

    dim_head = q.shape[-1] // heads
    # (B, S, H*Dh) -> (B, H, S, Dh)
    q = q.reshape(B, S, heads, dim_head).transpose(0, 2, 1, 3)
    k = k.reshape(B, -1, heads, dim_head).transpose(0, 2, 1, 3)
    v = v.reshape(B, -1, heads, dim_head).transpose(0, 2, 1, 3)

    has_norm = "norm_q" in params
    if (has_norm or freqs_rot is not None) and (
        freqs_rot is None or rope_layout == "half"
    ):
        # Single fused VMEM pass per tensor (ops/rope_norm.py) — the
        # separate-XLA-op path below costs ~23 ms/block at Stage-I shapes.
        from actionmesh_tpu.ops.rope_norm import fused_rms_rope

        cos, sin = freqs_rot if freqs_rot is not None else (None, None)
        q = fused_rms_rope(
            q, params["norm_q"]["scale"] if has_norm else None, cos, sin,
            mesh=mesh,
        )
        k = fused_rms_rope(
            k, params["norm_k"]["scale"] if has_norm else None, cos, sin,
            mesh=mesh,
        )
    else:
        if has_norm:
            q = rms_norm(params["norm_q"], q)
            k = rms_norm(params["norm_k"], k)
        if freqs_rot is not None:
            cos, sin = freqs_rot
            q = apply_rotary_embedding(q, cos, sin, layout=rope_layout)
            k = apply_rotary_embedding(k, cos, sin, layout=rope_layout)

    out = dot_product_attention(q, k, v, kv_mask=kv_mask, impl=attn_impl, mesh=mesh)
    out = out.transpose(0, 2, 1, 3).reshape(B, S, heads * dim_head)
    return linear(params["to_out"], out)


# ---------------------------------------------------------------------------
# FlowMatchingBlock
# ---------------------------------------------------------------------------

def init_flow_matching_block(
    key: jax.Array,
    dim: int,
    num_attention_heads: int,
    use_self_attention: bool = True,
    use_cross_attention: bool = True,
    cross_attention_dim: Optional[int] = None,
    cross_attention_norm: Optional[str] = None,
    attention_qk_norm: bool = True,
    attention_bias: bool = True,
    attention_out_bias: bool = True,
    ff_inner_dim: Optional[int] = None,
    skip: bool = False,
    dtype: jnp.dtype = jnp.float32,
) -> Params:
    keys = jax.random.split(key, 4)
    params: Params = {}
    if use_self_attention:
        params["norm_s_attn"] = init_layer_norm(dim)
        params["s_attn"] = init_attention(
            keys[0], dim, num_attention_heads,
            qk_norm=attention_qk_norm, bias=attention_bias,
            out_bias=attention_out_bias, dtype=dtype,
        )
    if use_cross_attention:
        assert cross_attention_dim is not None
        params["norm_x_attn"] = init_layer_norm(dim)
        params["x_attn"] = init_attention(
            keys[1], dim, num_attention_heads,
            cross_attention_dim=cross_attention_dim,
            qk_norm=attention_qk_norm,
            cross_norm=cross_attention_norm,
            bias=attention_bias, out_bias=attention_out_bias, dtype=dtype,
        )
    params["norm_ff"] = init_layer_norm(dim)
    params["ff"] = init_feed_forward(
        keys[2], dim, ff_inner_dim if ff_inner_dim is not None else 4 * dim,
        dtype=dtype,
    )
    if skip:
        params["norm_skip"] = init_layer_norm(dim)
        params["linear_skip"] = init_linear(keys[3], 2 * dim, dim, dtype=dtype)
    return params


def constrain_sp_layout(x, mesh, inflated: bool):
    """Pin the sp-mesh activation layout at the inflate/de-inflate reshape.

    On a (dp, tp, sp) mesh the inflated sequence axis is sp-sharded and the
    per-frame form's merged (g*B*T) batch axis is (dp, sp)-sharded; the sp
    shard boundary falls exactly on a frame boundary when T % sp == 0, so
    the two layouts hold identical bytes per device and the reshape between
    them is local. Without the explicit constraints GSPMD reshards the
    per-frame q/k/v with a generic all-gather + dynamic-slice (21 x 134 MB
    per Stage-I step at production shape — the r3c "spatial reshard").
    No-op off-mesh, on sp=1 meshes, and when the axes don't divide.
    """
    if mesh is None:
        return x
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    sp = axis_sizes.get("sp", 1)
    if sp <= 1:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P

    dp = axis_sizes.get("dp", 1)
    if inflated:
        if x.shape[0] % dp or x.shape[1] % sp:
            return x
        spec = P("dp" if dp > 1 else None, "sp", None)
    else:
        if x.shape[0] % (dp * sp):
            return x
        spec = P(("dp", "sp") if dp > 1 else "sp", None, None)
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def flow_matching_block(
    params: Params,
    hidden_states: jnp.ndarray,
    num_attention_heads: int,
    encoder_hidden_states: Optional[jnp.ndarray] = None,
    freqs_rot: Optional[tuple[jnp.ndarray, jnp.ndarray]] = None,
    skip: Optional[jnp.ndarray] = None,
    inflate_n_frames: Optional[int] = None,
    attn_impl: str = "auto",
    rope_layout: str = "interleaved",
    gelu_approx: bool = False,
    mesh=None,
    uncond_prefix: int = 0,
) -> jnp.ndarray:
    """Pre-norm transformer block with optional U-skip concat.

    With ``inflate_n_frames=T``, self-attention is "inflated": the per-frame
    layout (B*T, N, D) reshapes to the cross-frame sequence (B, T*N, D) for
    the attention only (reference: attention_processor.py:49-65,161-166).
    The reshape is free under XLA. Cross-attention and FF stay per-frame.
    ``freqs_rot`` must already match the self-attention layout (inflated
    when inflating).
    """
    from actionmesh_tpu.ops.tensor_ops import (
        flat_batch_to_flat_seq,
        flat_seq_to_flat_batch,
    )

    if "linear_skip" in params:
        assert skip is not None
        cat = jnp.concatenate([skip, hidden_states], axis=-1)
        hidden_states = layer_norm(
            params["norm_skip"], linear(params["linear_skip"], cat)
        )

    if "s_attn" in params:
        normed = layer_norm(params["norm_s_attn"], hidden_states)
        if inflate_n_frames is not None:
            normed = constrain_sp_layout(
                flat_batch_to_flat_seq(normed, inflate_n_frames),
                mesh, inflated=True,
            )
        att = attention(
            params["s_attn"],
            normed,
            heads=num_attention_heads,
            freqs_rot=freqs_rot,
            attn_impl=attn_impl,
            rope_layout=rope_layout,
            mesh=mesh,
        )
        if inflate_n_frames is not None:
            att = constrain_sp_layout(
                flat_seq_to_flat_batch(att, inflate_n_frames),
                mesh, inflated=False,
            )
        hidden_states = hidden_states + att

    if "x_attn" in params:
        hidden_states = hidden_states + attention(
            params["x_attn"],
            layer_norm(params["norm_x_attn"], hidden_states),
            heads=num_attention_heads,
            encoder_hidden_states=encoder_hidden_states,
            attn_impl=attn_impl,
            mesh=mesh,
            uncond_prefix=uncond_prefix,
        )

    hidden_states = hidden_states + feed_forward(
        params["ff"],
        layer_norm(params["norm_ff"], hidden_states),
        gelu_approx=gelu_approx,
    )
    return hidden_states
