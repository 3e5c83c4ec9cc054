"""Distillation recipes for the Stage-I temporal denoiser.

The reference samples Stage I with 30 Euler steps, each running a 2-branch
classifier-free-guidance batch (reference: actionmesh/scheduler/
scheduler.py:172-250, configs/actionmesh.yaml guidance [[0,1],[1,1]] at
scale 7.5) — 60 denoiser forwards per window. Two standard distillation
recipes compose to collapse that cost; the reference ships no training
code at all (SURVEY.md §4), so both are beyond-reference capability, built
on the same SPMD training step machinery as flow_train.py:

  * **Guidance distillation** (Meng et al., "On Distillation of Guided
    Diffusion Models"): a student with the same architecture regresses the
    teacher's *guided* velocity ``v_u + s (v_c - v_u)`` so inference runs
    a single conditional forward — the CFG batch pair disappears (2x per
    step, and the dp axis frees up for other batching).
  * **Progressive distillation** (Salimans & Ho) adapted to the additive
    rectified-flow Euler sampler: the student learns to cover two
    consecutive teacher Euler steps of the production shift-3 schedule in
    one step. The halved schedule aligns exactly with every second point
    of the full one (``get_schedule`` linspaces between fixed endpoints,
    then applies a pointwise shift), so each round exactly halves an EVEN
    ``stage_1_steps``: 16 -> 8 -> 4 (or 30 -> 15, one round — 15 is odd,
    so further exact halving stops there; progressive_distill_loss
    rejects odd teacher step counts).

Inference integration needs no new machinery: a distilled checkpoint runs
with guidance branches ``[[1, 1]]`` (single conditional branch,
``sampling/guidance.py`` aggregates to identity) and a reduced
``stage_1_steps`` — both existing config overrides.

Teacher forwards run under ``stop_gradient`` with the inference attention
kernels (no VJP needed); only the student uses the trainable flash path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from actionmesh_tpu.models.denoiser import DenoiserConfig, denoiser_forward
from actionmesh_tpu.sampling.flow_schedule import get_schedule
from actionmesh_tpu.training.flow_train import (
    cast_params_for_compute,
    masked_velocity_mse,
    sample_flow_sigma,
)


def _cast(params, compute_dtype):
    if compute_dtype is None:
        return params
    return cast_params_for_compute(params, compute_dtype)


def _freeze_conditioning(x, x0, mask):
    """Conditioning frames (mask=1) stay clean, mirroring the sampler's
    mask-freeze (sampling/denoise_loop.py ``unobserved``)."""
    if mask is None:
        return x
    m = mask.astype(jnp.float32)[:, :, None, None]
    return x * (1.0 - m) + x0 * m


def teacher_velocity(
    teacher_params,
    cfg: DenoiserConfig,
    x_t: jnp.ndarray,
    context: jnp.ndarray,
    framestep: jnp.ndarray,
    diffusion_time: jnp.ndarray,
    mask,
    *,
    guidance_scale: Optional[float],
    attn_impl: str = "auto",
    mesh=None,
    remat: bool = True,
) -> jnp.ndarray:
    """Teacher velocity field, optionally CFG-guided, gradient-free.

    With ``guidance_scale`` set, runs the reference 2-branch batch
    ([[0,1],[1,1]]: uncond branch zeroes the image context, keeps the
    latent mask) with the exact uncond cross-attention skip, and
    aggregates ``v_u + s (v_c - v_u)``. With ``None``, one conditional
    forward (a teacher that is itself guidance-distilled).
    """
    B = x_t.shape[0]
    in_dtype = teacher_params["proj_in"]["kernel"].dtype
    if guidance_scale is None:
        v = denoiser_forward(
            teacher_params,
            cfg,
            x_t.astype(in_dtype),
            context.astype(in_dtype),
            framestep,
            diffusion_time,
            mask,
            attn_impl=attn_impl,
            mesh=mesh,
            remat=remat,
        )
        return jax.lax.stop_gradient(v.astype(jnp.float32))
    hidden = jnp.concatenate([x_t, x_t], axis=0)
    ctx = jnp.concatenate([jnp.zeros_like(context), context], axis=0)
    fs = jnp.concatenate([framestep, framestep], axis=0)
    dt = jnp.concatenate([diffusion_time, diffusion_time], axis=0)
    m2 = None if mask is None else jnp.concatenate([mask, mask], axis=0)
    pred = denoiser_forward(
        teacher_params,
        cfg,
        hidden.astype(in_dtype),
        ctx.astype(in_dtype),
        fs,
        dt,
        m2,
        attn_impl=attn_impl,
        mesh=mesh,
        remat=remat,
        uncond_batch=B,
    )
    uncond, cond = jnp.split(pred.astype(jnp.float32), 2, axis=0)
    return jax.lax.stop_gradient(
        uncond + guidance_scale * (cond - uncond)
    )


def guidance_distill_loss(
    student_params,
    teacher_params,
    cfg: DenoiserConfig,
    batch: dict,
    key: jax.Array,
    *,
    guidance_scale: float = 7.5,
    shift: float = 3.0,
    num_train_timesteps: float = 1000.0,
    attn_impl: str = "auto_train",
    teacher_attn_impl: str = "auto",
    mesh=None,
    remat: bool = True,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """MSE between the student's conditional velocity and the teacher's
    CFG-guided velocity at flow-matched (x_sigma, sigma) points.

    batch: the training/data.flow_batches layout (``latents``, ``context``,
    ``framestep``, optional ``mask``); sigma draws follow the same shifted
    density as rectified-flow training so the student is accurate where
    the sampler steps.
    """
    x0 = batch["latents"].astype(jnp.float32)
    mask = batch.get("mask")
    B = x0.shape[0]
    tkey, nkey = jax.random.split(key)
    sigma = sample_flow_sigma(tkey, B, shift)
    noise = jax.random.normal(nkey, x0.shape, jnp.float32)
    s = sigma[:, None, None, None]
    x_t = _freeze_conditioning((1.0 - s) * x0 + s * noise, x0, mask)
    diffusion_time = sigma * num_train_timesteps

    v_t = teacher_velocity(
        _cast(teacher_params, compute_dtype),
        cfg,
        x_t,
        batch["context"],
        batch["framestep"],
        diffusion_time,
        mask,
        guidance_scale=guidance_scale,
        attn_impl=teacher_attn_impl,
        mesh=mesh,
        remat=remat,
    )

    fwd = _cast(student_params, compute_dtype)
    in_dtype = fwd["proj_in"]["kernel"].dtype
    v_s = denoiser_forward(
        fwd,
        cfg,
        x_t.astype(in_dtype),
        batch["context"].astype(in_dtype),
        batch["framestep"],
        diffusion_time,
        mask,
        attn_impl=attn_impl,
        mesh=mesh,
        remat=remat,
    )
    return masked_velocity_mse(v_s, v_t, mask)


def progressive_distill_loss(
    student_params,
    teacher_params,
    cfg: DenoiserConfig,
    batch: dict,
    key: jax.Array,
    *,
    num_teacher_steps: int = 30,
    teacher_guidance_scale: Optional[float] = None,
    shift: float = 3.0,
    num_train_timesteps: float = 1000.0,
    attn_impl: str = "auto_train",
    teacher_attn_impl: str = "auto",
    mesh=None,
    remat: bool = True,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """One-step-covers-two progressive distillation on the production
    schedule.

    Per sample: draw an even schedule index ``j``, diffuse data to
    ``x_t`` at ``sigma(ts[j])``, run TWO teacher Euler steps
    (``x += dist * v``, conditioning frames re-frozen after each — the
    sampler's semantics), and regress the student's velocity at ``ts[j]``
    onto the secant ``(x'' - x_t) / (dist_j + dist_{j+1})``. Because the
    halved schedule is exactly every second point of the full one, a
    converged student reproduces the teacher's ``n``-step trajectory with
    ``n/2`` steps of its own schedule.
    """
    if num_teacher_steps % 2 != 0:
        raise ValueError(
            f"num_teacher_steps={num_teacher_steps} must be even"
        )
    ts_np, dist_np = get_schedule(
        num_teacher_steps, int(num_train_timesteps), shift
    )
    ts = jnp.asarray(np.asarray(ts_np, np.float32))
    dist = jnp.asarray(np.asarray(dist_np, np.float32))

    x0 = batch["latents"].astype(jnp.float32)
    mask = batch.get("mask")
    B = x0.shape[0]
    ikey, nkey = jax.random.split(key)
    j = 2 * jax.random.randint(ikey, (B,), 0, num_teacher_steps // 2)
    t_j = jnp.take(ts, j)
    t_j1 = jnp.take(ts, j + 1)
    d_j = jnp.take(dist, j)[:, None, None, None]
    d_j1 = jnp.take(dist, j + 1)[:, None, None, None]

    sigma = (t_j / num_train_timesteps)[:, None, None, None]
    noise = jax.random.normal(nkey, x0.shape, jnp.float32)
    x_t = _freeze_conditioning(
        (1.0 - sigma) * x0 + sigma * noise, x0, mask
    )

    tparams = _cast(teacher_params, compute_dtype)
    tkw = dict(
        guidance_scale=teacher_guidance_scale,
        attn_impl=teacher_attn_impl,
        mesh=mesh,
        remat=remat,
    )
    v1 = teacher_velocity(
        tparams, cfg, x_t, batch["context"], batch["framestep"], t_j, mask,
        **tkw,
    )
    x1 = _freeze_conditioning(x_t + d_j * v1, x0, mask)
    v2 = teacher_velocity(
        tparams, cfg, x1, batch["context"], batch["framestep"], t_j1, mask,
        **tkw,
    )
    x2 = _freeze_conditioning(x1 + d_j1 * v2, x0, mask)
    v_star = jax.lax.stop_gradient((x2 - x_t) / (d_j + d_j1))

    fwd = _cast(student_params, compute_dtype)
    in_dtype = fwd["proj_in"]["kernel"].dtype
    v_s = denoiser_forward(
        fwd,
        cfg,
        x_t.astype(in_dtype),
        batch["context"].astype(in_dtype),
        batch["framestep"],
        t_j,
        mask,
        attn_impl=attn_impl,
        mesh=mesh,
        remat=remat,
    )
    return masked_velocity_mse(v_s, v_star, mask)


def make_distill_step(
    cfg: DenoiserConfig,
    optimizer: optax.GradientTransformation,
    teacher_params,
    *,
    mode: str = "guidance",
    guidance_scale: float = 7.5,
    num_teacher_steps: int = 30,
    teacher_guidance_scale: Optional[float] = None,
    shift: float = 3.0,
    attn_impl: str = "auto_train",
    teacher_attn_impl: str = "auto",
    mesh=None,
    remat: bool = True,
    compute_dtype: Optional[jnp.dtype] = None,
    ema_decay: Optional[float] = None,
):
    """Jitted SPMD distillation step: (state, batch, key) -> (state, loss).

    Same contract as flow_train.make_train_step (donated state, dp-sharded
    batch, tp-sharded params); ``teacher_params`` are closed over — shard
    them with the same ``denoiser_param_shardings`` as the student so the
    teacher forward partitions identically.
    """
    if mode == "guidance":

        def loss_fn(params, teacher, batch, key):
            return guidance_distill_loss(
                params, teacher, cfg, batch, key,
                guidance_scale=guidance_scale, shift=shift,
                attn_impl=attn_impl, teacher_attn_impl=teacher_attn_impl,
                mesh=mesh, remat=remat, compute_dtype=compute_dtype,
            )

    elif mode == "progressive":

        def loss_fn(params, teacher, batch, key):
            return progressive_distill_loss(
                params, teacher, cfg, batch, key,
                num_teacher_steps=num_teacher_steps,
                teacher_guidance_scale=teacher_guidance_scale,
                shift=shift, attn_impl=attn_impl,
                teacher_attn_impl=teacher_attn_impl, mesh=mesh,
                remat=remat, compute_dtype=compute_dtype,
            )

    else:
        raise ValueError(f"unknown distillation mode: {mode!r}")

    # The teacher tree is a runtime ARGUMENT of the jitted step, never a
    # closure: closed-over multi-GB pytrees become XLA constants and the
    # production-shape compile hangs (see the verify-skill gotcha).
    @functools.partial(jax.jit, donate_argnums=(0,))
    def _distill_step(state, teacher, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(
            state["params"], teacher, batch, key
        )
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

    def distill_step(state, batch, key):
        return _distill_step(state, teacher_params, batch, key)

    return distill_step
