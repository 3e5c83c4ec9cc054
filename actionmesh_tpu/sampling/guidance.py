"""Classifier-free guidance: CFG batch construction and aggregation.

TPU-native counterpart of the reference CFG
(reference: actionmesh/scheduler/guidance.py:14-118). The guidance branches
form a leading batch axis of size ``len(guidance_at_inference)`` — on TPU
this axis is the natural data-parallel shard (see parallel/mesh.py), in place
of the reference's ``split_cfg_batch`` memory knob.

Conditioning order is [image context, anchor-latent mask]; branch flags
(a, b) keep (a=1) or zero (a=0) the image context and keep/zero the latent
conditioning mask respectively.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ClassifierFreeGuidance:
    inference_enabled: bool = True
    guidance_at_inference: tuple[tuple[int, int], ...] = ((0, 0), (0, 1), (1, 1))
    guidance_scales: tuple[float, ...] = (1.0, 1.0)

    def __post_init__(self):
        assert len(self.guidance_at_inference) == len(self.guidance_scales) + 1, (
            "need one more guidance branch than scales"
        )

    @property
    def n_branches(self) -> int:
        return len(self.guidance_at_inference) if self.inference_enabled else 1

    @property
    def leading_uncond_image_branches(self) -> int:
        """How many LEADING branches zero the image context ((0, *) flags).

        Those branches' cross-attention collapses to a constant (k = v = 0
        under bias-free projections) — the denoiser skips it when told
        (layers.attention uncond_prefix lever). Only a leading prefix is
        exploitable, matching the conventional [uncond..., cond...] order.
        """
        if not self.inference_enabled:
            return 0
        n = 0
        for use_image, _ in self.guidance_at_inference:
            if use_image:
                break
            n += 1
        return n

    def get_unobserved_mask(
        self, mask: Optional[jnp.ndarray]
    ) -> Optional[jnp.ndarray]:
        """1 where the latent is to be denoised (not GT-conditioned)."""
        if mask is None:
            return None
        return mask == 0

    def cfg_at_inference(
        self,
        latent: jnp.ndarray,
        context: jnp.ndarray,
        mask: Optional[jnp.ndarray],
        framestep: Optional[jnp.ndarray],
    ) -> tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray]]:
        """Stack the guidance branches along the batch axis.

        latent (B, ...) -> (G*B, ...); context/mask zeroed per branch flags.
        """
        if not self.inference_enabled:
            return latent, context, mask, framestep

        g = len(self.guidance_at_inference)
        latent_out = jnp.concatenate([latent] * g, axis=0)
        framestep_out = (
            jnp.concatenate([framestep] * g, axis=0) if framestep is not None else None
        )

        context_list, mask_list = [], []
        for use_image, use_latent in self.guidance_at_inference:
            context_list.append(context if use_image else jnp.zeros_like(context))
            if mask is not None:
                mask_list.append(mask if use_latent else jnp.zeros_like(mask))
        context_out = jnp.concatenate(context_list, axis=0)
        mask_out = jnp.concatenate(mask_list, axis=0) if mask is not None else None
        return latent_out, context_out, mask_out, framestep_out

    def aggregate_cfg(self, stacked: jnp.ndarray) -> jnp.ndarray:
        """v0 + sum_i s_i * (v_{i+1} - v_i) over the branch axis."""
        if not self.inference_enabled:
            return stacked
        g = len(self.guidance_at_inference)
        outputs = jnp.split(stacked, g, axis=0)
        result = outputs[0]
        for i, scale in enumerate(self.guidance_scales):
            result = result + scale * (outputs[i + 1] - outputs[i])
        return result


def make_guidance(
    guidance_at_inference: Sequence[Sequence[int]],
    guidance_scales: Sequence[float],
    inference_enabled: bool = True,
) -> ClassifierFreeGuidance:
    return ClassifierFreeGuidance(
        inference_enabled=inference_enabled,
        guidance_at_inference=tuple(tuple(g) for g in guidance_at_inference),
        guidance_scales=tuple(guidance_scales),
    )
