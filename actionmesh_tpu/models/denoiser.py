"""Stage I: temporal 3D flow-matching denoiser (DiT), TPU-native.

Functional re-design of the reference denoiser
(reference: actionmesh/model/temporal_denoiser.py:23-249):

  * 21 blocks, width 2048, 16 heads, mlp x4, latent 64ch, DINOv2-L (1024)
    cross-attention; U-Net long skips (blocks 0-9 push, 11-20 pop+concat).
  * Self-attention "inflated" across frames: one fused attention over
    T*(N+1) ~= 32,784 tokens per guidance branch.
  * Temporal RoPE from *centered real-valued video timesteps*, shared by all
    tokens of a frame; computed once per AR window, reused across all
    denoising steps.
  * Per-frame diffusion-time token prepended (N -> N+1); diffusion time is
    zeroed for mask=1 (ground-truth conditioned) frames.

The whole forward is a pure function of (params, inputs) and jit-compiles to
one XLA program; the denoising loop scans over it (sampling/denoise_loop.py).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Optional

import jax
import jax.numpy as jnp

from actionmesh_tpu.models.layers import (
    Params,
    flow_matching_block,
    init_flow_matching_block,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
)
from actionmesh_tpu.ops.embeddings import (
    scale_timestep,
    sinusoidal_timestep_embedding,
)
from actionmesh_tpu.ops.rotary import compute_rotary_embeddings
from actionmesh_tpu.ops.tensor_ops import (
    merge_batch_time,
    split_batch_time,
)

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class DenoiserConfig:
    num_tokens_nominal: int = 2048
    temporal_context_size: int = 16
    in_channels: int = 64
    num_layers: int = 21
    num_attention_heads: int = 16
    width: int = 2048
    mlp_ratio: float = 4.0
    cross_attention_dim: int = 1024
    inflated_layers: tuple[int, ...] = tuple(range(21))
    # tanh GELU: fused (free) on TPU vs ~8 ms/block for erf; output delta is
    # below bf16 quantization noise (see models/layers.feed_forward). fp32
    # golden-parity tests pin this to False.
    gelu_approx: bool = True

    @property
    def width_per_head(self) -> int:
        return self.width // self.num_attention_heads

    @property
    def out_channels(self) -> int:
        return self.in_channels


def init_denoiser(
    key: jax.Array, cfg: DenoiserConfig, dtype: jnp.dtype = jnp.float32
) -> Params:
    # U-ViT long skips pair layer i with layer L-1-i around the middle
    # block. An even layer count is self-consistent (each skip block pops
    # a pushed value; params match) but asymmetric: layer 0's push is
    # never consumed and pairings shift by one (r5 review). The reference
    # architecture is odd (21); warn so toy/closed-loop specs with even
    # counts keep working knowingly.
    if cfg.num_layers % 2 == 0:
        logger.warning(
            "num_layers=%d is even: U-skip pairing is asymmetric (layer "
            "0's skip is unused); the reference architecture uses odd "
            "depths (21).", cfg.num_layers,
        )
    keys = jax.random.split(key, cfg.num_layers + 4)
    tkey1, tkey2, pkey_in, pkey_out = keys[:4]
    params: Params = {
        # diffusers TimestepEmbedding: linear(W -> 4W) -> gelu -> linear(4W -> W)
        "time_proj": {
            "linear_1": init_linear(tkey1, cfg.width, cfg.width * 4, dtype=dtype),
            "linear_2": init_linear(tkey2, cfg.width * 4, cfg.width, dtype=dtype),
        },
        "proj_in": init_linear(pkey_in, cfg.in_channels, cfg.width, dtype=dtype),
        "blocks": [
            init_flow_matching_block(
                keys[4 + layer],
                dim=cfg.width,
                num_attention_heads=cfg.num_attention_heads,
                use_self_attention=True,
                use_cross_attention=True,
                cross_attention_dim=cfg.cross_attention_dim,
                cross_attention_norm=None,
                attention_qk_norm=True,
                attention_bias=False,
                ff_inner_dim=int(cfg.width * cfg.mlp_ratio),
                skip=layer > cfg.num_layers // 2,
                dtype=dtype,
            )
            for layer in range(cfg.num_layers)
        ],
        "norm_out": init_layer_norm(cfg.width),
        "proj_out": init_linear(pkey_out, cfg.width, cfg.out_channels, dtype=dtype),
    }
    return params


def precompute_freqs_rot(
    cfg: DenoiserConfig,
    framestep: jnp.ndarray,
    n_tokens: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """RoPE tables for the *inflated* sequence layout (B, T*(N+1), Dh).

    framestep (B, T) are real video timesteps; each frame's centered value
    is shared by its N+1 tokens (reference: temporal_denoiser.py:114-149).
    Computed once per AR window, constant across denoising steps.

    Tables use the ``half`` channel layout (ops/rotary.py): the rotation is
    then two contiguous slices instead of a stride-2 lane shuffle. The
    checkpoint converter permutes to_q/to_k columns to match
    (utils/weights.py); attention scores are identical.
    """
    B, T = framestep.shape
    framestep_rel = merge_batch_time(
        scale_timestep(framestep, center=True, scale=False)
    )  # (B*T,)
    cos, sin = compute_rotary_embeddings(
        embed_dim=cfg.width_per_head, positions=framestep_rel, layout="half"
    )  # (B*T, Dh)
    # Each frame's freqs repeat for its N+1 tokens; lay out as (B, T*(N+1), Dh)
    cos = jnp.repeat(cos[:, None, :], n_tokens + 1, axis=1).reshape(
        B, T * (n_tokens + 1), -1
    )
    sin = jnp.repeat(sin[:, None, :], n_tokens + 1, axis=1).reshape(
        B, T * (n_tokens + 1), -1
    )
    return cos, sin


def denoiser_forward(
    params: Params,
    cfg: DenoiserConfig,
    hidden_states: jnp.ndarray,
    context: jnp.ndarray,
    framestep: jnp.ndarray,
    diffusion_time: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    freqs_rot: Optional[tuple[jnp.ndarray, jnp.ndarray]] = None,
    attn_impl: str = "auto",
    mesh=None,
    uncond_batch: int = 0,
    remat: bool = False,
) -> jnp.ndarray:
    """One denoising step (velocity prediction).

    Args:
        hidden_states (B, T, N, D_in): latents to denoise.
        context (B, T, S, D_ctx): DINOv2 conditioning per frame.
        framestep (B, T): video timesteps.
        diffusion_time (B,): flow time (0=clean .. num_train_timesteps=noise).
        mask (B, T): 1 = ground-truth frame (diffusion time zeroed).
        freqs_rot: precomputed RoPE tables (see precompute_freqs_rot).
        uncond_batch: leading batch entries whose context is all-zero (CFG
            unconditional-image branches) — their cross-attention reduces
            to a constant and can be skipped (layers.attention lever).
        remat: rematerialize each block under ``jax.checkpoint`` — trades
            FLOPs for HBM so the *training* backward pass fits; identical
            forward values (training/flow_train.py pins this).

    Returns:
        (B, T, N, D_in) predicted velocity.
    """
    B, T, N, _ = hidden_states.shape

    if freqs_rot is None:
        freqs_rot = precompute_freqs_rot(cfg, framestep, N)

    x = merge_batch_time(hidden_states)  # (B*T, N, Din)
    x = linear(params["proj_in"], x)
    compute_dtype = x.dtype

    # -- Diffusion-time token (per frame), zeroed on GT frames.
    # Batch-major (B*T,) ordering, consistent with merge_batch_time. (The
    # reference's `repeat(T)` is time-major, but diffusion_time is always a
    # broadcast scalar there, so the orderings are equivalent.)
    dt = jnp.repeat(diffusion_time, T)  # (B*T,)
    if mask is not None:
        dt = dt * (1.0 - merge_batch_time(mask).astype(dt.dtype))
    dt_emb = sinusoidal_timestep_embedding(
        dt, cfg.width, flip_sin_to_cos=False, downscale_freq_shift=0.0
    ).astype(compute_dtype)
    dt_emb = linear(
        params["time_proj"]["linear_2"],
        jax.nn.gelu(
            linear(params["time_proj"]["linear_1"], dt_emb), approximate=False
        ),
    )

    # -- Prepend time token: (B*T, N+1, W)
    x = jnp.concatenate([dt_emb[:, None, :], x], axis=1)

    context_merged = merge_batch_time(context).astype(compute_dtype)

    # -- Transformer blocks with U-Net long skips
    skips = []
    half = cfg.num_layers // 2
    for layer, block_params in enumerate(params["blocks"]):
        skip = None if layer <= half else skips.pop()
        inflate = T if layer in cfg.inflated_layers else None

        def apply_block(bp, x, skip, ctx, freqs, _inflate=inflate):
            return flow_matching_block(
                bp,
                x,
                num_attention_heads=cfg.num_attention_heads,
                encoder_hidden_states=ctx,
                freqs_rot=freqs,
                skip=skip,
                inflate_n_frames=_inflate,
                attn_impl=attn_impl,
                rope_layout="half",
                gelu_approx=cfg.gelu_approx,
                mesh=mesh,
                uncond_prefix=uncond_batch * T,  # batch-major merge_batch_time
            )

        if remat:
            apply_block = jax.checkpoint(apply_block)
        x = apply_block(
            block_params,
            x,
            skip,
            context_merged,
            freqs_rot if inflate is not None else None,
        )
        if layer < half:
            skips.append(x)

    x = layer_norm(params["norm_out"], x)
    x = x[:, -N:]  # drop the prepended time token
    x = linear(params["proj_out"], x)
    return split_batch_time(x, T)
