"""Positional / timestep embedding math (pure functions, no parameters).

TPU-native counterpart of reference embedding utilities
(reference: actionmesh/model/utils/embeddings.py:14-242 and diffusers
``Timesteps``). Everything here is stateless float math, computed in float32.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def sinusoidal_timestep_embedding(
    timesteps: jnp.ndarray,
    embedding_dim: int,
    max_period: float = 10000.0,
    flip_sin_to_cos: bool = False,
    downscale_freq_shift: float = 0.0,
    scale: float = 1.0,
) -> jnp.ndarray:
    """Sinusoidal embedding matching diffusers ``get_timestep_embedding``.

    Used for the Stage-I diffusion-time token (reference:
    temporal_denoiser.py:57-61 with flip_sin_to_cos=False,
    downscale_freq_shift=0 -> output layout [sin | cos]).

    Args:
        timesteps: (...,) float timestep values.
        embedding_dim: output channels (must be even).

    Returns:
        (..., embedding_dim) float32 embedding.
    """
    half = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[..., None] * freqs * scale
    sin, cos = jnp.sin(args), jnp.cos(args)
    if flip_sin_to_cos:
        return jnp.concatenate([cos, sin], axis=-1)
    return jnp.concatenate([sin, cos], axis=-1)


def timestep_embedder(
    *timesteps: jnp.ndarray,
    frequency_embedding_size: int = 256,
    max_period: float = 10_000.0,
) -> jnp.ndarray:
    """Multi-input sinusoidal embedder with [cos | sin] layout per input.

    Matches reference ``TimestepEmbedder.forward`` (embeddings.py:89-128):
    each input tensor embeds to ``frequency_embedding_size`` channels laid out
    as [cos(args) | sin(args)]; multiple inputs concatenate along the last
    axis. Stage II uses this for (source_alpha, target_alpha) pairs.
    """
    if frequency_embedding_size % 2 != 0:
        raise ValueError("frequency_embedding_size must be even")
    half = frequency_embedding_size // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    outs = []
    for t in timesteps:
        args = t.astype(jnp.float32)[..., None] * freqs
        outs.append(jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1))
    return jnp.concatenate(outs, axis=-1)


def frequency_positional_embedding(
    x: jnp.ndarray,
    num_freqs: int = 8,
    logspace: bool = True,
    include_input: bool = True,
    include_pi: bool = False,
) -> jnp.ndarray:
    """Frequency-encode xyz coordinates (NeRF-style).

    Matches reference ``FrequencyPositionalEmbedding`` (embeddings.py:14-52).
    Stage II query embedding uses num_freqs=8, logspace, include_input,
    include_pi=False -> 3*(8*2+1)=51 output channels for xyz input.

    Output layout: [x, sin(x*f_0..f_K interleaved per-channel), cos(...)].
    """
    if num_freqs == 0:
        return x
    if logspace:
        freqs = 2.0 ** np.arange(num_freqs, dtype=np.float32)
    else:
        freqs = np.linspace(1.0, 2.0 ** (num_freqs - 1), num_freqs, dtype=np.float32)
    if include_pi:
        freqs = freqs * np.pi
    freqs = jnp.asarray(freqs)
    # (..., C, F) -> (..., C*F); channel-major like torch's view flatten
    embed = (x[..., None] * freqs).reshape(x.shape[:-1] + (x.shape[-1] * num_freqs,))
    parts = [jnp.sin(embed), jnp.cos(embed)]
    if include_input:
        parts = [x] + parts
    return jnp.concatenate(parts, axis=-1)


def frequency_embedding_out_dim(
    input_dim: int = 3, num_freqs: int = 8, include_input: bool = True
) -> int:
    extra = 1 if (include_input or num_freqs == 0) else 0
    return input_dim * (num_freqs * 2 + extra)


def scale_timestep(
    timestep: jnp.ndarray, center: bool = True, scale: bool = False
) -> jnp.ndarray:
    """Center (and optionally scale) per-row timesteps. Input (B, T)."""
    t_min = timestep.min(axis=1, keepdims=True)
    t_max = timestep.max(axis=1, keepdims=True)
    if center:
        timestep = timestep - t_min
    if scale:
        timestep = timestep / (t_max - t_min)
    return timestep


def get_scaling(timesteps: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row (min, range) of (B, T) timesteps."""
    t_min = timesteps.min(axis=1)
    t_max = timesteps.max(axis=1)
    return t_min, t_max - t_min


def apply_scaling(
    timesteps: jnp.ndarray, t_min: jnp.ndarray, t_range: jnp.ndarray
) -> jnp.ndarray:
    """Normalize timesteps to [0, 1] with precomputed (min, range)."""
    if timesteps.ndim == 1:
        return (timesteps - t_min) / t_range
    return (timesteps - t_min[:, None]) / t_range[:, None]


def get_n_subdivisions(start: float, end: float, level: int = 1) -> int:
    """Number of points after recursive midpoint subdivision of [start, end]."""
    n_points = int(end - start + 1)
    for _ in range(1, level):
        n_points += n_points - 1
    return n_points


def interpolate_timesteps(
    timesteps: np.ndarray,
    subsampling_level: int,
    drop_first: bool = False,
) -> np.ndarray:
    """Linearly interpolate output timesteps between min and max.

    Host-side helper (shapes feed static jit dims). Returns (1, n_steps).
    """
    t_min = float(np.min(timesteps))
    t_max = float(np.max(timesteps))
    n_steps = get_n_subdivisions(t_min, t_max, level=subsampling_level)
    out = np.linspace(t_min, t_max, n_steps, dtype=np.float32).reshape(1, -1)
    if drop_first:
        out = out[:, 1:]
    return out
