"""Shifted flow-matching sigma schedule (pure host math).

TPU-native counterpart of the reference schedule
(reference: actionmesh/scheduler/scheduler.py:43-98). The schedule is tiny
static data computed once on host with numpy; it feeds a ``lax.scan`` over
denoising steps as per-step (timestep, distance) scan inputs.
"""

from __future__ import annotations

import numpy as np


def compute_timesteps(
    num_inference_steps: int,
    num_train_timesteps: int = 1000,
    shift: float = 1.0,
) -> np.ndarray:
    """Shifted sigma schedule: sigma' = shift*sigma / (1 + (shift-1)*sigma).

    Returns (num_inference_steps,) float32 timesteps in [~0, num_train_timesteps],
    descending (noise -> clean).
    """
    full_sigmas = (
        np.linspace(1, num_train_timesteps, num_train_timesteps) / num_train_timesteps
    )
    full_sigmas = full_sigmas[::-1]
    full_sigmas_shifted = shift * full_sigmas / (1 + (shift - 1) * full_sigmas)
    sigma_max = full_sigmas_shifted[0]
    sigma_min = full_sigmas_shifted[-1]

    timesteps = np.linspace(
        sigma_max * num_train_timesteps,
        sigma_min * num_train_timesteps,
        num_inference_steps,
    )
    sigmas = timesteps / num_train_timesteps
    sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
    return (sigmas * num_train_timesteps).astype(np.float32)


def get_schedule(
    num_inference_steps: int,
    num_train_timesteps: int = 1000,
    shift: float = 3.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Return (timesteps, distances) for the Euler sampling loop.

    timesteps has num_inference_steps+1 entries; distances[i] is the
    (normalized) Euler step length from timesteps[i] to timesteps[i+1].
    """
    timesteps = compute_timesteps(
        num_inference_steps=num_inference_steps + 1,
        num_train_timesteps=num_train_timesteps,
        shift=shift,
    )
    distances = (timesteps[:-1] - timesteps[1:]) / num_train_timesteps
    return timesteps, distances
