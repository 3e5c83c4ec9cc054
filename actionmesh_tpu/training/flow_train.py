"""Rectified-flow training step for the Stage-I temporal denoiser.

The reference ships no training code (SURVEY.md §4: "no training code, no
tests directory, no distributed code"); its sampler conventions define the
training objective this module implements:

  * additive Euler sampling ``x <- x + dist * v`` with distances derived
    from the shift-3 sigma schedule (reference:
    actionmesh/scheduler/scheduler.py:58-98, 238-248; ours:
    sampling/flow_schedule.py). Integrating noise -> clean under
    ``x_sigma = (1 - sigma) x0 + sigma noise`` makes the velocity target
    ``v = x0 - noise``.
  * ground-truth conditioning frames (mask=1) enter the forward *clean*
    with their diffusion-time embedding zeroed (the model already does the
    zeroing, models/denoiser.py) and are excluded from the loss — the
    training-side mirror of the sampler's mask-freeze.
  * classifier-free guidance needs an unconditional branch
    (reference guidance tuple ``[[0,1],[1,1]]``): per-sample context
    dropout with probability ``p_uncond`` trains it.

TPU-native structure: the whole update is ONE jitted SPMD program. Params
stay fp32 masters and are cast to bf16 for compute (layer norms stay fp32,
matching the inference precision islands); every block rematerializes under
``jax.checkpoint`` so the 33k-token backward fits HBM; batch shards over
``dp``, Megatron tp shardings (parallel/mesh.py) propagate through
``value_and_grad`` and GSPMD inserts the gradient all-reduces over ICI.
Attention defaults to ``auto_train``: the Pallas flash forward + Pallas
flash backward (ops/flash_attention_bwd.py) on TPU, the differentiable
chunked-XLA path off-TPU — both O(S) memory at the 33k-token sequence.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from actionmesh_tpu.models.denoiser import DenoiserConfig, denoiser_forward


def sample_flow_sigma(
    key: jax.Array, batch: int, shift: float = 3.0
) -> jnp.ndarray:
    """Per-sample sigma in (0, 1]: uniform draws mapped through the same
    shift transform as the inference schedule, so the training-time density
    concentrates where the sampler actually steps
    (sampling/flow_schedule.compute_timesteps)."""
    u = jax.random.uniform(key, (batch,), jnp.float32, 1e-4, 1.0)
    return shift * u / (1.0 + (shift - 1.0) * u)


def masked_velocity_mse(
    v_pred: jnp.ndarray,
    v_target: jnp.ndarray,
    mask: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Mean squared error over non-conditioning frames.

    v_pred/v_target: (B, T, N, C); mask: (B, T) with 1 = ground-truth
    conditioning frame (excluded). All-masked batches return 0, not NaN.
    """
    err = (v_pred.astype(jnp.float32) - v_target.astype(jnp.float32)) ** 2
    if mask is None:
        return err.mean()
    w = 1.0 - mask.astype(jnp.float32)  # (B, T)
    num = jnp.einsum("btnc,bt->", err, w)
    den = w.sum() * err.shape[2] * err.shape[3]
    return num / jnp.maximum(den, 1.0)


def cast_params_for_compute(params, dtype=jnp.bfloat16):
    """Cast float params to the compute dtype, keeping norm params fp32.

    Mirrors the inference storage convention: init_denoiser(dtype=bf16)
    stores matmul weights in bf16 while init_layer_norm / qk-norm scales
    stay fp32 (the FP32LayerNorm islands of the reference,
    ref:model/utils/block.py).
    """

    def cast(path, p):
        if any("norm" in str(getattr(k, "key", k)) for k in path):
            return p
        if jnp.issubdtype(p.dtype, jnp.floating):
            return p.astype(dtype)
        return p

    return jax.tree_util.tree_map_with_path(cast, params)


def flow_matching_loss(
    params,
    cfg: DenoiserConfig,
    batch: dict,
    key: jax.Array,
    *,
    p_uncond: float = 0.1,
    shift: float = 3.0,
    num_train_timesteps: float = 1000.0,
    attn_impl: str = "auto_train",
    mesh=None,
    remat: bool = True,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """Rectified-flow MSE for one batch.

    batch keys: ``latents`` (B,T,N,C) clean Stage-I latents, ``context``
    (B,T,S,D_ctx) DINOv2 features, ``framestep`` (B,T) real video
    timesteps, optional ``mask`` (B,T) conditioning-frame indicator.
    """
    x0 = batch["latents"].astype(jnp.float32)
    mask = batch.get("mask")
    B = x0.shape[0]
    tkey, nkey, dkey = jax.random.split(key, 3)

    sigma = sample_flow_sigma(tkey, B, shift)
    noise = jax.random.normal(nkey, x0.shape, jnp.float32)
    s = sigma[:, None, None, None]
    x_t = (1.0 - s) * x0 + s * noise
    v_target = x0 - noise  # additive Euler: x += dist * v walks noise -> x0
    if mask is not None:
        m = mask.astype(jnp.float32)[:, :, None, None]
        x_t = x_t * (1.0 - m) + x0 * m  # conditioning frames enter clean

    context = batch["context"]
    if p_uncond > 0.0:
        drop = jax.random.bernoulli(dkey, p_uncond, (B,))
        context = context * (1.0 - drop.astype(context.dtype))[:, None, None, None]

    fwd_params = (
        params
        if compute_dtype is None
        else cast_params_for_compute(params, compute_dtype)
    )
    in_dtype = fwd_params["proj_in"]["kernel"].dtype
    v_pred = denoiser_forward(
        fwd_params,
        cfg,
        x_t.astype(in_dtype),
        context.astype(in_dtype),
        batch["framestep"],
        sigma * num_train_timesteps,
        mask,
        attn_impl=attn_impl,
        mesh=mesh,
        remat=remat,
    )
    return masked_velocity_mse(v_pred, v_target, mask)


def optimizer_state_shardings(
    params, param_shardings, optimizer: optax.GradientTransformation
):
    """Shardings for ``optimizer.init(params)``: any sub-tree that mirrors
    the param tree (Adam mu/nu) gets the param shardings; scalar state
    (step counts) replicates. Derived from ``jax.eval_shape`` so no real
    state is materialized."""
    from jax.sharding import NamedSharding, PartitionSpec

    mesh = jax.tree.leaves(param_shardings)[0].mesh
    rep = NamedSharding(mesh, PartitionSpec())
    shapes = jax.eval_shape(optimizer.init, params)
    pdef = jax.tree.structure(params)

    def mirrors_params(x):
        try:
            return jax.tree.structure(x) == pdef
        except Exception:
            return False

    def assign(x):
        if mirrors_params(x):
            return param_shardings
        return jax.tree.map(lambda _: rep, x)

    return jax.tree.map(assign, shapes, is_leaf=mirrors_params)


def init_train_state(
    params,
    optimizer: optax.GradientTransformation,
    param_shardings=None,
    ema_decay: Optional[float] = None,
) -> dict:
    """{'params', 'opt_state', 'step'[, 'ema_params']}.

    With ``param_shardings`` given, the Adam moments are laid out with the
    same tp shardings as the params they mirror — each device materializes
    only its shard, no host-side replication round-trip. ``ema_decay``
    adds an exponential-moving-average shadow of the params (the weights a
    diffusion sampler actually runs); pass the same value to
    ``make_train_step``."""
    if param_shardings is not None:
        opt_state = jax.jit(
            optimizer.init,
            out_shardings=optimizer_state_shardings(
                params, param_shardings, optimizer
            ),
        )(params)
    else:
        opt_state = jax.jit(optimizer.init)(params)
    state = {
        "params": params,
        "opt_state": opt_state,
        "step": jnp.zeros((), jnp.int32),
    }
    if ema_decay is not None:
        state["ema_params"] = jax.tree.map(jnp.copy, params)
    return state


def make_train_step(
    cfg: DenoiserConfig,
    optimizer: optax.GradientTransformation,
    *,
    p_uncond: float = 0.1,
    shift: float = 3.0,
    attn_impl: str = "auto_train",
    mesh=None,
    remat: bool = True,
    compute_dtype: Optional[jnp.dtype] = None,
    ema_decay: Optional[float] = None,
):
    """Build the jitted SPMD train step: (state, batch, key) -> (state, loss).

    The state is donated — updated params/moments reuse the same HBM
    buffers. Pass params already placed with
    parallel/mesh.denoiser_param_shardings and the batch with its leading
    axis on ``dp``; sharding propagates through grad/update untouched.
    ``ema_decay`` (e.g. 0.999) keeps an EMA shadow of the params in the
    state — init with ``init_train_state(..., ema_decay=...)``. For
    gradient clipping / schedules, compose the optimizer:
    ``optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(lr))``.
    """

    def loss_fn(params, batch, key):
        return flow_matching_loss(
            params,
            cfg,
            batch,
            key,
            p_uncond=p_uncond,
            shift=shift,
            attn_impl=attn_impl,
            mesh=mesh,
            remat=remat,
            compute_dtype=compute_dtype,
        )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(state["params"], batch, key)
        updates, opt_state = optimizer.update(
            grads, state["opt_state"], state["params"]
        )
        new_params = optax.apply_updates(state["params"], updates)
        new_state = {
            "params": new_params,
            "opt_state": opt_state,
            "step": state["step"] + 1,
        }
        if ema_decay is not None:
            new_state["ema_params"] = jax.tree.map(
                lambda e, p: e * ema_decay
                + p.astype(e.dtype) * (1.0 - ema_decay),
                state["ema_params"],
                new_params,
            )
        return new_state, loss

    return train_step
