"""Supervised training step for the Stage-II deformation decoder.

The decoder is not a diffusion model: it regresses absolute per-vertex
positions in (-1, 1) from (latents, vertex queries) — reference
``prediction_mode="direct"`` with the sigmoid squash
(ref:model/temporal_autoencoder.py:269). Training is therefore a plain
masked MSE against tracked ground-truth positions (the ActionBench data
layout: (T, V, 6) tracked point clouds), with the same SPMD structure as
the Stage-I trainer (training/flow_train.py): fp32 masters + bf16
compute, per-block remat, donated jitted adamw, tp-sharded moments.

The vertex mask handles XLA static shapes: V varies per mesh, so queries
pad to a bucket and padded rows carry mask 0 (SURVEY.md §7 hard part 5).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from actionmesh_tpu.models.autoencoder import (
    AutoencoderConfig,
    autoencoder_forward,
)
from actionmesh_tpu.training.flow_train import cast_params_for_compute


def masked_position_mse(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    vertex_mask: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """MSE over real (non-padding) vertices.

    pred/target: (B, T_out, V, 3); vertex_mask: (B, V) with 1 = real
    vertex. All-padding batches return 0, not NaN.
    """
    err = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    if vertex_mask is None:
        return err.mean()
    w = vertex_mask.astype(jnp.float32)  # (B, V)
    num = jnp.einsum("btvc,bv->", err, w)
    den = w.sum() * err.shape[1] * err.shape[3]
    return num / jnp.maximum(den, 1.0)


def decoder_loss(
    params,
    cfg: AutoencoderConfig,
    batch: dict,
    *,
    attn_impl: str = "auto_train",
    mesh=None,
    remat: bool = True,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """Masked position MSE for one batch.

    batch keys: ``latents`` (B,T,N,C), ``framestep`` (B,T),
    ``source_alpha`` (B,), ``target_alphas`` (B,T_out), ``query`` (B,V,3|6)
    anchor vertices(+normals), ``positions`` (B,T_out,V,3) tracked
    ground-truth positions in [-1,1], optional ``vertex_mask`` (B,V).
    """
    fwd_params = (
        params
        if compute_dtype is None
        else cast_params_for_compute(params, compute_dtype)
    )
    pred = autoencoder_forward(
        fwd_params,
        cfg,
        batch["latents"],
        batch["framestep"],
        batch["source_alpha"],
        batch["target_alphas"],
        batch["query"],
        attn_impl=attn_impl,
        compute_dtype=compute_dtype or jnp.float32,
        mesh=mesh,
        remat=remat,
    )
    return masked_position_mse(pred, batch["positions"], batch.get("vertex_mask"))


def make_decoder_train_step(
    cfg: AutoencoderConfig,
    optimizer: optax.GradientTransformation,
    *,
    attn_impl: str = "auto_train",
    mesh=None,
    remat: bool = True,
    compute_dtype: Optional[jnp.dtype] = None,
):
    """Jitted SPMD train step for the decoder: (state, batch) -> (state, loss).

    State layout and sharding conventions are shared with the Stage-I
    trainer (training/flow_train.init_train_state /
    optimizer_state_shardings); params shard with
    parallel/mesh.autoencoder_param_shardings.
    """

    def loss_fn(params, batch):
        return decoder_loss(
            params,
            cfg,
            batch,
            attn_impl=attn_impl,
            mesh=mesh,
            remat=remat,
            compute_dtype=compute_dtype,
        )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(state["params"], batch)
        updates, opt_state = optimizer.update(
            grads, state["opt_state"], state["params"]
        )
        new_params = optax.apply_updates(state["params"], updates)
        return (
            {
                "params": new_params,
                "opt_state": opt_state,
                "step": state["step"] + 1,
            },
            loss,
        )

    return train_step
