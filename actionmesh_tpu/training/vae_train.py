"""TSDF-supervised training for the TripoSG vecset VAE.

The reference ships this VAE pretrained (its upstream source is an empty
submodule, SURVEY.md §2.1 "TripoSG adapter"); the closed loop's Stage-0
extension trains the tiny in-environment instance from scratch instead:
encode a surface point cloud to the token posterior, decode, and supervise
``query_sdf`` against the exact truncated signed distance of the source
mesh (preprocessing/sdf.mesh_tsdf — NEGATIVE inside, matching the
``value < level`` extraction convention of ops/isosurface).

Loss = TSDF MSE at mixed near-surface + uniform query points
     + kl_weight * KL(posterior || N(0, 1))

Same SPMD/train-state conventions as the Stage-I trainer
(training/flow_train.py): fp32 masters, donated jitted step, optax chain
from training/loop.make_optimizer.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from actionmesh_tpu.models.triposg.vae import (
    TripoSGVAEConfig,
    decode_kv,
    encode_moments,
    query_sdf,
)


def vae_loss(
    params,
    cfg: TripoSGVAEConfig,
    batch: dict,
    key: jax.Array,
    *,
    kl_weight: float = 1e-4,
    sample_posterior: bool = True,
    fps_stochastic: bool = False,
    attn_impl: str = "auto",
) -> tuple[jnp.ndarray, dict]:
    """(loss, {"mse": ..., "kl": ...}) for one batch.

    batch keys: ``surface`` (B, N, 6) points+normals, ``points`` (B, Q, 3)
    query positions, ``tsdf`` (B, Q) truncated signed-distance targets.

    FPS token selection is deterministic by default — the inference encode
    path (``encode_to_latent(seed=None)``, the MeanEncodeVAE convention the
    closed loop conditions with) runs FPS without the random presample, so
    training sees the same token-selection distribution.
    """
    fkey, nkey = jax.random.split(key)
    mean, logvar = encode_moments(
        params, cfg, batch["surface"],
        fps_key=fkey if fps_stochastic else None,
        attn_impl=attn_impl,
    )
    if sample_posterior:
        std = jnp.exp(0.5 * logvar)
        latent = mean + std * jax.random.normal(nkey, mean.shape, mean.dtype)
    else:
        latent = mean
    kv = decode_kv(params, cfg, latent, attn_impl=attn_impl)
    pred = query_sdf(params, cfg, kv, batch["points"], attn_impl=attn_impl)
    mse = jnp.mean((pred - batch["tsdf"].astype(jnp.float32)) ** 2)
    kl = 0.5 * jnp.mean(
        jnp.sum(mean**2 + jnp.exp(logvar) - 1.0 - logvar, axis=-1)
    )
    return mse + kl_weight * kl, {"mse": mse, "kl": kl}


def make_vae_train_step(
    cfg: TripoSGVAEConfig,
    optimizer: optax.GradientTransformation,
    *,
    kl_weight: float = 1e-4,
    attn_impl: str = "auto",
):
    """Jitted train step: (state, batch, key) -> (state, loss). State layout
    matches training/flow_train.init_train_state (no EMA for the VAE)."""

    def loss_fn(params, batch, key):
        loss, _ = vae_loss(
            params, cfg, batch, key, kl_weight=kl_weight, attn_impl=attn_impl
        )
        return loss

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(state["params"], batch, key)
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


def sdf_batches(
    scenes: list[dict],
    batch_size: int,
    q_points: int,
    *,
    seed: int = 0,
    epochs: Optional[int] = None,
):
    """Yield VAE training batches from per-scene SDF sample pools.

    ``scenes``: list of {"surface" (N, 6), "points" (P, 3), "tsdf" (P,)}
    host arrays with P >= q_points. Each draw picks ``batch_size`` scenes
    (with reshuffled epochs) and subsamples ``q_points`` fresh query points
    per scene, so successive epochs see different supervision subsets.
    """
    import numpy as np

    if len(scenes) < batch_size:
        raise ValueError(
            f"{len(scenes)} scenes < batch_size {batch_size}"
        )
    rng = np.random.default_rng(seed)
    epoch = 0
    while epochs is None or epoch < epochs:
        order = rng.permutation(len(scenes))
        for lo in range(0, len(order) - batch_size + 1, batch_size):
            items = [scenes[int(i)] for i in order[lo : lo + batch_size]]
            sel = [
                rng.choice(len(it["points"]), q_points, replace=False)
                for it in items
            ]
            yield {
                "surface": np.stack([it["surface"] for it in items]),
                "points": np.stack(
                    [it["points"][s] for it, s in zip(items, sel)]
                ),
                "tsdf": np.stack(
                    [it["tsdf"][s] for it, s in zip(items, sel)]
                ),
            }
        epoch += 1
