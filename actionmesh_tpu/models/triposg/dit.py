"""TripoSG rectified-flow DiT (image -> 3D latent denoiser).

TPU-native rebuild of the TripoSG shape transformer the reference calls
through its adapter (reference: actionmesh/external/triposg.py:26-100; the
upstream source is an empty submodule). ActionMesh's Stage-I denoiser is
the *temporally inflated* extension of this DiT (same 21-layer width-2048
U-ViT skeleton, same diffusion-time token, same DINOv2 cross-attention) —
so the single-shape DiT is exactly our denoiser with T=1, no inflation and
no temporal RoPE, and we reuse that implementation directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from actionmesh_tpu.models.denoiser import (
    DenoiserConfig,
    denoiser_forward,
    init_denoiser,
)

Params = dict


def triposg_dit_config(
    num_tokens: int = 2048,
    in_channels: int = 64,
    num_layers: int = 21,
    width: int = 2048,
    num_attention_heads: int = 16,
    cross_attention_dim: int = 1024,
    mlp_ratio: float = 4.0,
) -> DenoiserConfig:
    """Single-shape DiT = denoiser with no inflated (temporal) layers."""
    return DenoiserConfig(
        num_tokens_nominal=num_tokens,
        temporal_context_size=1,
        in_channels=in_channels,
        num_layers=num_layers,
        num_attention_heads=num_attention_heads,
        width=width,
        mlp_ratio=mlp_ratio,
        cross_attention_dim=cross_attention_dim,
        inflated_layers=(),  # no cross-frame attention, no RoPE
    )


def init_triposg_dit(
    key: jax.Array, cfg: DenoiserConfig, dtype: jnp.dtype = jnp.float32
) -> Params:
    return init_denoiser(key, cfg, dtype=dtype)


def triposg_dit_forward(
    params: Params,
    cfg: DenoiserConfig,
    latents: jnp.ndarray,
    context: jnp.ndarray,
    diffusion_time: jnp.ndarray,
    attn_impl: str = "auto",
    mesh=None,
    uncond_batch: int = 0,
) -> jnp.ndarray:
    """One velocity prediction. latents (B, N, C), context (B, S, Dc).

    ``uncond_batch``: leading batch entries whose context is all-zero (the
    CFG unconditional branch) — their cross-attention collapses to the
    out-projection bias exactly (same skip as Stage I, BENCH_NOTES r3b).
    """
    B = latents.shape[0]
    out = denoiser_forward(
        params,
        cfg,
        latents[:, None],  # (B, 1, N, C): single "frame"
        context[:, None],
        framestep=jnp.zeros((B, 1), jnp.float32),
        diffusion_time=diffusion_time,
        mask=None,
        attn_impl=attn_impl,
        mesh=mesh,
        uncond_batch=uncond_batch,
    )
    return out[:, 0]
