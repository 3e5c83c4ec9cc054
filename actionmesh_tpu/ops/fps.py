"""Farthest point sampling (FPS) as a jit-able JAX loop + grouped variant.

TPU-native replacement for the reference's pytorch3d CUDA
``sample_farthest_points`` and the fpsample CPU fallback
(reference: actionmesh/model/utils/pointcloud_sampling.py:29-327). The
selection loop is a ``lax.fori_loop`` maintaining a running min-distance
field — O(K*N) vector work that stays on device.

Determinism: the reference's FPS is seeded but device-dependent; here the
start point comes from a jax PRNG key (or index 0), so selections are
reproducible across runs on the same backend (statistical parity is the
contract, SURVEY.md §7 hard part 6).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("n_samples",))
def farthest_point_sampling(
    points: jnp.ndarray,
    n_samples: int,
    key: Optional[jax.Array] = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """FPS over (B, N, 3) points -> (sampled (B, K, 3), indices (B, K)).

    With `key`, the first point is random per batch item (fps_random=True in
    the reference); otherwise index 0.
    """
    B, N, _ = points.shape

    if key is not None:
        start = jax.random.randint(key, (B,), 0, N)
    else:
        start = jnp.zeros((B,), jnp.int32)

    def sample_one(pts, start_idx):
        def body(i, state):
            min_dist, indices = state
            last = pts[indices[i - 1]]
            d = jnp.sum(jnp.square(pts - last), axis=-1)
            min_dist = jnp.minimum(min_dist, d)
            nxt = jnp.argmax(min_dist)
            indices = indices.at[i].set(nxt)
            return min_dist, indices

        indices0 = jnp.zeros((n_samples,), jnp.int32).at[0].set(start_idx)
        min_dist0 = jnp.full((N,), jnp.inf, jnp.float32)
        _, indices = jax.lax.fori_loop(1, n_samples, body, (min_dist0, indices0))
        return indices

    indices = jax.vmap(sample_one)(points.astype(jnp.float32), start)
    sampled = jnp.take_along_axis(points, indices[..., None], axis=1)
    return sampled, indices


def sample_pc(
    points: jnp.ndarray,
    n_samples: int,
    sampling_type: str = "fps",
    key: Optional[jax.Array] = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Point-cloud sampling dispatch (fps | random | identity).

    Mirrors reference sample_pc (pointcloud_sampling.py:213-268).
    """
    B, N, _ = points.shape
    if sampling_type == "identity" or n_samples >= N:
        idx = jnp.tile(jnp.arange(N)[None], (B, 1))
        return points, idx
    if sampling_type == "random":
        assert key is not None, "random sampling needs a key"
        idx = jax.vmap(
            lambda k: jax.random.choice(k, N, (n_samples,), replace=False)
        )(jax.random.split(key, B))
        return jnp.take_along_axis(points, idx[..., None], axis=1), idx
    if sampling_type == "fps":
        return farthest_point_sampling(points, n_samples, key=key)
    raise ValueError(f"unknown sampling_type: {sampling_type}")


def sample_pc_grouped(
    points: jnp.ndarray,
    n_samples: int,
    n_grouped_frames: int,
    sampling_type: str = "fps",
    key: Optional[jax.Array] = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Temporally-correspondent sampling: pick indices on frame 0, reuse
    across all T frames (reference: pointcloud_sampling.py:271-327).

    points (B*T, N, 3) with T = n_grouped_frames; the same per-batch index
    set applies to every frame of that batch element.
    """
    BT, N, _ = points.shape
    T = n_grouped_frames
    B = BT // T
    frame0 = points.reshape(B, T, N, -1)[:, 0]
    _, idx = sample_pc(frame0, n_samples, sampling_type, key=key)
    idx_full = jnp.repeat(idx, T, axis=0)  # (B*T, K)
    sampled = jnp.take_along_axis(points, idx_full[..., None], axis=1)
    return sampled, idx_full
