"""Rotary positional embeddings (RoPE) from arbitrary float positions.

TPU-native counterpart of the reference rotary implementation
(reference: actionmesh/model/utils/rotary_embedding.py:10-124). ActionMesh
uses *real-valued video timesteps* as positions (not integer token indices):
all tokens of one frame share that frame's (centered) timestep, which makes
AR windows translation-invariant in time.

All trig math is float32 regardless of activation dtype; the rotation is
applied in float32 and cast back (matches the reference's fp32 RoPE island).
"""

from __future__ import annotations

import jax.numpy as jnp


def compute_rotary_embeddings(
    embed_dim: int,
    positions: jnp.ndarray,
    base_freq: float = 10000.0,
    freq_scale: float = 1.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Compute (cos, sin) rotary tables for float positions.

    Args:
        embed_dim: rotary dimension (the attention head dim). Must be even.
        positions: (S,) float positions, e.g. centered video timesteps.

    Returns:
        (cos, sin), each (S, embed_dim) float32. Frequencies are
        repeat-interleaved pairwise so adjacent channel pairs rotate together.
    """
    assert embed_dim % 2 == 0, f"embed_dim must be even, got {embed_dim}"
    positions = positions.astype(jnp.float32)
    inv_freq = (
        1.0
        / (base_freq ** (jnp.arange(0, embed_dim, 2, dtype=jnp.float32) / embed_dim))
        / freq_scale
    )
    phases = jnp.outer(positions, inv_freq)  # (S, D/2)
    cos = jnp.repeat(jnp.cos(phases), 2, axis=-1)  # (S, D)
    sin = jnp.repeat(jnp.sin(phases), 2, axis=-1)
    return cos, sin


def rotate_half_pairwise(x: jnp.ndarray) -> jnp.ndarray:
    """Pairwise 90-degree rotation: (x0, x1, x2, x3, ...) -> (-x1, x0, -x3, x2, ...)."""
    x_pairs = x.reshape(x.shape[:-1] + (x.shape[-1] // 2, 2))
    x_real = x_pairs[..., 0]
    x_imag = x_pairs[..., 1]
    rotated = jnp.stack([-x_imag, x_real], axis=-1)
    return rotated.reshape(x.shape)


def apply_rotary_embedding(
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
) -> jnp.ndarray:
    """Apply RoPE to a (B, H, S, D) query/key tensor.

    cos/sin may be (S, D) or (B, S, D); broadcast over batch and heads.
    Math in float32, result cast back to x.dtype.
    """
    if cos.ndim == 2:
        cos_b = cos[None, None]
        sin_b = sin[None, None]
    elif cos.ndim == 3:
        cos_b = cos[:, None]
        sin_b = sin[:, None]
    else:
        raise ValueError(f"cos/sin must be 2D or 3D, got {cos.ndim}D")
    xf = x.astype(jnp.float32)
    out = xf * cos_b + rotate_half_pairwise(xf) * sin_b
    return out.astype(x.dtype)
