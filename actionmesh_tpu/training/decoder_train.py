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


def chamfer_eval_metrics(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    vertex_mask: Optional[jnp.ndarray] = None,
) -> dict:
    """Jittable chamfer-proxy metrics on tracked decoder outputs.

    Mirrors the ActionBench definitions (actionbench/chamfer.py:14-65) on
    the decoder's own (B, T_out, V, 3) predictions vs tracked ground truth,
    skipping ICP (decoder outputs already live in the GT's normalized
    frame):

      eval_cd      per-frame symmetric chamfer (sum of both directional
                   NN-distance means), averaged over frames and batch
      eval_motion  frame-0 NN index matching, tracked L2 averaged over
                   time, symmetric sum (compute_motion_chamfer_score)

    MSE is blind to the static-vs-motion trade-off the closed loop
    measured (BENCH_NOTES r4f: the MSE-best decoder checkpoint gives
    oracle-level CD-M but +16% CD-3D; the final checkpoint the reverse) —
    these metrics let checkpoint selection see both axes. Padded vertices
    (vertex_mask == 0) are excluded from both argmin targets and means.
    """
    p = pred.astype(jnp.float32)
    g = target.astype(jnp.float32)
    B, T, V, _ = p.shape
    if vertex_mask is None:
        w = jnp.ones((B, V), jnp.float32)
    else:
        w = vertex_mask.astype(jnp.float32)
    big = jnp.float32(1e9)
    n_valid = jnp.maximum(w.sum(axis=1), 1.0)  # (B,)

    # (B, T, V_pred, V_gt) pairwise distances; pred/target share the mask
    # (they are the same tracked vertices).
    d = jnp.sqrt(
        jnp.maximum(
            jnp.sum((p[:, :, :, None, :] - g[:, :, None, :, :]) ** 2, -1),
            1e-12,
        )
    )
    invalid_col = big * (1.0 - w)  # broadcast helpers
    # pred -> gt: for each valid pred point, nearest valid gt point
    min_pg = jnp.min(d + invalid_col[:, None, None, :], axis=3)  # (B,T,V)
    # gt -> pred
    min_gp = jnp.min(d + invalid_col[:, None, :, None], axis=2)  # (B,T,V)
    mean_pg = jnp.einsum("btv,bv->bt", min_pg, w) / n_valid[:, None]
    mean_gp = jnp.einsum("btv,bv->bt", min_gp, w) / n_valid[:, None]
    eval_cd = jnp.mean(mean_pg + mean_gp)

    # Motion: match indices on frame 0, average tracked L2 over time.
    d0 = d[:, 0]  # (B, V_pred, V_gt)
    idx_gt_to_pred = jnp.argmin(
        d0 + invalid_col[:, :, None], axis=1
    )  # (B, V_gt) nearest valid pred per gt point
    idx_pred_to_gt = jnp.argmin(
        d0 + invalid_col[:, None, :], axis=2
    )  # (B, V_pred) nearest valid gt per pred point
    p_matched = jnp.take_along_axis(
        p, idx_gt_to_pred[:, None, :, None], axis=2
    )  # (B, T, V_gt, 3)
    g_matched = jnp.take_along_axis(
        g, idx_pred_to_gt[:, None, :, None], axis=2
    )  # (B, T, V_pred, 3)
    l2_1 = jnp.linalg.norm(p_matched - g, axis=-1).mean(axis=1)  # (B, V_gt)
    l2_2 = jnp.linalg.norm(g_matched - p, axis=-1).mean(axis=1)  # (B, V_pred)
    m1 = jnp.einsum("bv,bv->b", l2_1, w) / n_valid
    m2 = jnp.einsum("bv,bv->b", l2_2, w) / n_valid
    eval_motion = jnp.mean(m1 + m2)
    return {"eval_cd": eval_cd, "eval_motion": eval_motion}


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


def decoder_eval_metrics(
    params,
    cfg: AutoencoderConfig,
    batch: dict,
    *,
    attn_impl: str = "auto_train",
    mesh=None,
    remat: bool = True,
    compute_dtype: Optional[jnp.dtype] = None,
    with_chamfer: bool = False,
) -> dict:
    """One eval forward -> {eval_loss[, eval_cd, eval_motion]}.

    Shares a single autoencoder forward between the MSE and the
    chamfer-proxy metrics (chamfer_eval_metrics)."""
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
    vertex_mask = batch.get("vertex_mask")
    out = {
        "eval_loss": masked_position_mse(pred, batch["positions"], vertex_mask)
    }
    if with_chamfer:
        out.update(
            chamfer_eval_metrics(pred, batch["positions"], vertex_mask)
        )
    return out


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
