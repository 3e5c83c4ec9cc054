"""Jitted flow-matching sampling loop (Stage I) as a ``lax.scan``.

TPU-native counterpart of the reference Euler sampler
(reference: actionmesh/scheduler/scheduler.py:100-295). Differences by
design:

  * The whole 30-step loop is ONE compiled XLA program (``lax.scan`` over
    steps) — no host round-trips between steps, unlike the reference's
    per-step Python loop.
  * The CFG branch batch is built once outside the scan (context zeroing is
    constant across steps) and rides a leading batch axis that the device
    mesh shards (parallel/mesh.py), replacing the reference's
    ``split_cfg_batch`` memory knob.
  * RoPE tables are computed once per window and closed over by the scan.
  * Noise comes from ``jax.random`` keyed streams; the reference's torch
    Generator bitstream is device-dependent anyway — seeding *structure*
    (per-window seed+i) is preserved at the pipeline level.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

from actionmesh_tpu.models.denoiser import (
    DenoiserConfig,
    denoiser_forward,
    precompute_freqs_rot,
)
from actionmesh_tpu.sampling.guidance import ClassifierFreeGuidance


def get_noise(
    key: jax.Array,
    latent_shape: tuple[int, ...],
    batch_size: int,
    n_timesteps: int,
    corr_noise: float = 0.0,
    dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Noise with optional temporal correlation (scheduler.py:100-137)."""
    assert 0.0 <= corr_noise <= 1.0
    k_same, k_ind = jax.random.split(key)
    same = jax.random.normal(
        k_same, (batch_size, 1) + tuple(latent_shape), dtype=dtype
    )
    same = jnp.broadcast_to(
        same, (batch_size, n_timesteps) + tuple(latent_shape)
    )
    ind = jax.random.normal(
        k_ind, (batch_size, n_timesteps) + tuple(latent_shape), dtype=dtype
    )
    return math.sqrt(corr_noise) * same + math.sqrt(1.0 - corr_noise) * ind


@functools.partial(
    jax.jit,
    static_argnames=(
        "dcfg", "guidance", "is_additive", "attn_impl", "mesh",
        "split_cfg_batch",
    ),
)
def denoise_window(
    params,
    dcfg: DenoiserConfig,
    guidance: ClassifierFreeGuidance,
    init_latent: jnp.ndarray,
    context: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    framestep: jnp.ndarray,
    timesteps: jnp.ndarray,
    distances: jnp.ndarray,
    is_additive: bool = True,
    attn_impl: str = "auto",
    mesh=None,
    split_cfg_batch: bool = False,
) -> jnp.ndarray:
    """Denoise one AR window.

    Args:
        init_latent (B, T, N, D): conditioning latents where mask=1, noise
            elsewhere.
        context (B, T, S, Dc): DINOv2 features.
        mask (B, T): 1 = ground-truth (frozen) frame.
        framestep (B, T): video timesteps.
        timesteps (num_steps+1,), distances (num_steps,): flow schedule.

    Returns:
        (B, T, N, D) denoised latents.
    """
    B, T, N, _ = init_latent.shape
    compute_dtype = init_latent.dtype

    # -- Build the CFG branch batch once (constant across steps)
    latents0, context_g, mask_g, framestep_g = guidance.cfg_at_inference(
        init_latent, context, mask, framestep
    )
    del latents0  # latents re-stacked each step from the evolving state
    unobserved = guidance.get_unobserved_mask(mask)  # (B, T) bool or None

    # -- RoPE tables for the CFG-expanded batch, once per window
    freqs_rot = precompute_freqs_rot(dcfg, framestep_g, N)

    g = guidance.n_branches
    mask_f = (
        mask_g.astype(compute_dtype) if mask_g is not None else None
    )

    # Under a device mesh, pin the CFG branch axis to the dp mesh axis so
    # GSPMD splits the guidance branches across chips (parallel/mesh.py).
    def _dp(x):
        if mesh is None or x is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P("dp"))
        )

    context_g = _dp(context_g)

    def step(latents, step_inputs):
        t, dist = step_inputs
        if split_cfg_batch and g > 1:
            # Low-RAM parity (reference scheduler.py:139-170): run guidance
            # branches sequentially, halving peak activation memory. On a
            # multi-chip mesh the dp axis is the better answer; this path
            # serves single-chip memory-constrained runs.
            branch_freqs = jax.tree.map(
                lambda f: f[:B] if hasattr(f, "shape") else f, freqs_rot
            )
            preds = []
            for b in range(g):
                sl = slice(b * B, (b + 1) * B)
                preds.append(
                    denoiser_forward(
                        params,
                        dcfg,
                        latents,
                        context_g[sl],
                        framestep_g[sl],
                        jnp.full((B,), t, dtype=jnp.float32),
                        mask=mask_f[sl] if mask_f is not None else None,
                        freqs_rot=branch_freqs,
                        attn_impl=attn_impl,
                        mesh=mesh,
                    )
                )
            pred = jnp.concatenate(preds, axis=0)
        else:
            hidden = _dp(jnp.concatenate([latents] * g, axis=0))
            diffusion_time = jnp.full((g * B,), t, dtype=jnp.float32)
            pred = denoiser_forward(
                params,
                dcfg,
                hidden,
                context_g,
                framestep_g,
                diffusion_time,
                mask=mask_f,
                freqs_rot=freqs_rot,
                attn_impl=attn_impl,
                mesh=mesh,
                uncond_batch=guidance.leading_uncond_image_branches * B,
            )
        pred = guidance.aggregate_cfg(pred)
        # Euler step in fp32: dist is exact (a bf16 dist carries ~0.4%
        # systematic step-length error) and the sum rounds once on
        # storage; XLA fuses the casts into the update (r5 review)
        pred32 = pred.astype(jnp.float32)
        lat32 = latents.astype(jnp.float32)
        if is_additive:
            stepped = (lat32 + dist * pred32).astype(compute_dtype)
        else:
            stepped = (lat32 - dist * pred32).astype(compute_dtype)
        if unobserved is not None:
            latents = jnp.where(
                unobserved[..., None, None], stepped, latents
            )
        else:
            latents = stepped
        return latents, None

    final, _ = jax.lax.scan(
        step,
        init_latent,
        # schedule stays fp32: casting t/dist to bf16 would quantize the
        # diffusion-time conditioning (ulp 4 near t=1000) and the step
        # lengths before the fp32 embedding math sees them (r5 review)
        (timesteps[:-1].astype(jnp.float32), distances.astype(jnp.float32)),
    )
    return final


def denoise_window_segmented(
    params,
    dcfg: DenoiserConfig,
    guidance: ClassifierFreeGuidance,
    init_latent: jnp.ndarray,
    context: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    framestep: jnp.ndarray,
    timesteps: jnp.ndarray,
    distances: jnp.ndarray,
    is_additive: bool = True,
    attn_impl: str = "auto",
    mesh=None,
    steps_per_launch: int = 5,
    step_callback=None,
    split_cfg_batch: bool = False,
) -> jnp.ndarray:
    """Denoise in segments of `steps_per_launch` compiled steps.

    Chaining segments is mathematically identical to one long scan (the
    loop state is just the latents), but bounds per-launch device time —
    the axon TPU tunnel kills programs that run for several minutes — and
    lets all full segments share ONE compiled program regardless of the
    total step count. Also re-enables mid-loop progress callbacks.
    """
    n_steps = distances.shape[0]
    latents = init_latent
    done = 0
    while done < n_steps:
        seg = min(steps_per_launch, n_steps - done)
        latents = denoise_window(
            params,
            dcfg,
            guidance,
            latents,
            context,
            mask,
            framestep,
            timesteps[done : done + seg + 1],
            distances[done : done + seg],
            is_additive=is_additive,
            attn_impl=attn_impl,
            mesh=mesh,
            split_cfg_batch=split_cfg_batch,
        )
        done += seg
        if step_callback is not None:
            step_callback(done, n_steps)
    return latents
