"""Tensor reshaping utilities for batched temporal sequences.

Shape convention: ``(B, T, N, D)``
    B: batch size, T: frames, N: tokens per frame, D: feature dim.

TPU-native counterpart of the reference's reshape helpers
(reference: actionmesh/model/utils/tensor_ops.py:25-115). All functions are
pure ``jnp.reshape`` calls — XLA compiles them to free layout changes, so
"inflating" self-attention from per-frame to cross-frame sequences costs
nothing on device.
"""

from __future__ import annotations

import jax.numpy as jnp


def merge_batch_time(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, ...) -> (B*T, ...)."""
    return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])


def split_batch_time(x: jnp.ndarray, n_frames: int) -> jnp.ndarray:
    """(B*T, ...) -> (B, T, ...)."""
    return x.reshape((x.shape[0] // n_frames, n_frames) + x.shape[1:])


def merge_time_tokens(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, N, ...) -> (B, T*N, ...)."""
    return x.reshape((x.shape[0], x.shape[1] * x.shape[2]) + x.shape[3:])


def split_time_tokens(x: jnp.ndarray, n_frames: int) -> jnp.ndarray:
    """(B, T*N, ...) -> (B, T, N, ...)."""
    return x.reshape(
        (x.shape[0], n_frames, x.shape[1] // n_frames) + x.shape[2:]
    )


def flat_batch_to_flat_seq(x: jnp.ndarray, n_frames: int) -> jnp.ndarray:
    """(B*T, N, ...) -> (B, T*N, ...) — the attention "inflation" reshape."""
    b = x.shape[0] // n_frames
    return x.reshape((b, n_frames * x.shape[1]) + x.shape[2:])


def flat_seq_to_flat_batch(x: jnp.ndarray, n_frames: int) -> jnp.ndarray:
    """(B, T*N, ...) -> (B*T, N, ...)."""
    n = x.shape[1] // n_frames
    return x.reshape((x.shape[0] * n_frames, n) + x.shape[2:])
