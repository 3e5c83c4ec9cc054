"""Rotary positional embeddings (RoPE) from arbitrary float positions.

TPU-native counterpart of the reference rotary implementation
(reference: actionmesh/model/utils/rotary_embedding.py:10-124). ActionMesh
uses *real-valued video timesteps* as positions (not integer token indices):
all tokens of one frame share that frame's (centered) timestep, which makes
AR windows translation-invariant in time.

All trig math is float32 regardless of activation dtype; the rotation is
applied in float32 and cast back (matches the reference's fp32 RoPE island).

Two channel layouts are supported:

  * ``interleaved`` — the reference's: channels (2i, 2i+1) form the rotating
    pair. Applying it needs a stride-2 lane shuffle, which is slow on the
    TPU VPU (the 128-channel head dim is the lane axis).
  * ``half`` — channels (i, D/2+i) pair up, so the rotation is two
    contiguous half-width slices (GPT-NeoX style). Identical math when q/k
    projection columns are permuted by :func:`rope_half_permutation`
    (attention scores are invariant to any permutation applied to both q
    and k); the checkpoint converter applies that permutation
    (utils/weights.py), and models use ``half`` end-to-end.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rope_half_permutation(dim_head: int) -> np.ndarray:
    """Channel permutation taking interleaved RoPE pairs to half-layout pairs.

    ``new[i] = old[perm[i]]``: even source channels fill the first half,
    odd ones the second, so interleaved pair (2i, 2i+1) becomes half-layout
    pair (i, D/2+i).
    """
    return np.concatenate(
        [np.arange(0, dim_head, 2), np.arange(1, dim_head, 2)]
    )


def compute_rotary_embeddings(
    embed_dim: int,
    positions: jnp.ndarray,
    base_freq: float = 10000.0,
    freq_scale: float = 1.0,
    layout: str = "interleaved",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Compute (cos, sin) rotary tables for float positions.

    Args:
        embed_dim: rotary dimension (the attention head dim). Must be even.
        positions: (S,) float positions, e.g. centered video timesteps.
        layout: ``interleaved`` (adjacent channel pairs share a frequency,
            reference layout) or ``half`` (channel i pairs with D/2+i).

    Returns:
        (cos, sin), each (S, embed_dim) float32.
    """
    assert embed_dim % 2 == 0, f"embed_dim must be even, got {embed_dim}"
    positions = positions.astype(jnp.float32)
    inv_freq = (
        1.0
        / (base_freq ** (jnp.arange(0, embed_dim, 2, dtype=jnp.float32) / embed_dim))
        / freq_scale
    )
    phases = jnp.outer(positions, inv_freq)  # (S, D/2)
    if layout == "half":
        cos = jnp.concatenate([jnp.cos(phases)] * 2, axis=-1)  # (S, D)
        sin = jnp.concatenate([jnp.sin(phases)] * 2, axis=-1)
    elif layout == "interleaved":
        cos = jnp.repeat(jnp.cos(phases), 2, axis=-1)  # (S, D)
        sin = jnp.repeat(jnp.sin(phases), 2, axis=-1)
    else:
        raise ValueError(f"unknown rope layout: {layout}")
    return cos, sin


def rotate_half_pairwise(x: jnp.ndarray) -> jnp.ndarray:
    """Pairwise 90-degree rotation: (x0, x1, x2, x3, ...) -> (-x1, x0, -x3, x2, ...)."""
    x_pairs = x.reshape(x.shape[:-1] + (x.shape[-1] // 2, 2))
    x_real = x_pairs[..., 0]
    x_imag = x_pairs[..., 1]
    rotated = jnp.stack([-x_imag, x_real], axis=-1)
    return rotated.reshape(x.shape)


def rotate_half_split(x: jnp.ndarray) -> jnp.ndarray:
    """Half-layout 90-degree rotation: (x1 | x2) -> (-x2 | x1).

    Two contiguous half-width slices — no lane shuffles on TPU, unlike the
    stride-2 pairwise rotation.
    """
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def apply_rotary_embedding(
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    layout: str = "interleaved",
) -> jnp.ndarray:
    """Apply RoPE to a (B, H, S, D) query/key tensor.

    cos/sin may be (S, D) or (B, S, D); broadcast over batch and heads, and
    must have been built with the same ``layout``. Math in float32, result
    cast back to x.dtype.
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
    if layout == "half":
        rotated = rotate_half_split(xf)
    elif layout == "interleaved":
        rotated = rotate_half_pairwise(xf)
    else:
        raise ValueError(f"unknown rope layout: {layout}")
    out = xf * cos_b + rotated * sin_b
    return out.astype(x.dtype)
