"""Stage II: temporal 3D autoencoder / deformation decoder, TPU-native.

Functional re-design of the reference autoencoder
(reference: actionmesh/model/temporal_autoencoder.py:32-269):

  * 16 self-attention blocks (width 1024, 8 heads, RoPE over T*N latent
    tokens + T alpha tokens) + 1 final cross-attention block whose queries
    are frequency-embedded mesh vertices (+normals).
  * Per target timestep, a (source_alpha, target_alpha) sinusoidal embedding
    token is appended per frame; the reference then runs the full KV stack
    once per target timestep in a Python loop (temporal_autoencoder.py:249).
    Here the T_out targets are folded into the *batch axis* instead — one
    batched XLA program decodes every target timestep in parallel on the
    MXU (the alpha token is the only thing that differs per target).
  * Precision islands kept from the reference: KV stack in the compute dtype
    (bf16); query embedder and final cross-attention in float32
    (temporal_autoencoder.py:240,266).
  * Output: displacement = 2*sigmoid(-logits) - 1, "direct" mode clamps to
    [-1, 1] as absolute positions.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from actionmesh_tpu.models.layers import (
    Params,
    flow_matching_block,
    init_flow_matching_block,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
)
from actionmesh_tpu.ops.embeddings import (
    frequency_embedding_out_dim,
    frequency_positional_embedding,
    scale_timestep,
    timestep_embedder,
)
from actionmesh_tpu.ops.rotary import compute_rotary_embeddings
from actionmesh_tpu.ops.tensor_ops import merge_batch_time, merge_time_tokens


@dataclasses.dataclass(frozen=True)
class AutoencoderConfig:
    temporal_context_size: int = 16
    in_channels: int = 3
    in_extra_channels: int = 3
    out_dim: int = 3
    latent_channels: int = 64
    width: int = 1024
    num_layers: int = 16
    num_attention_heads: int = 8
    embed_frequency: int = 8
    embed_include_pi: bool = False
    prediction_mode: str = "direct"  # direct | residual
    # tanh GELU (see models/denoiser.DenoiserConfig.gelu_approx)
    gelu_approx: bool = True

    @property
    def width_per_head(self) -> int:
        return self.width // self.num_attention_heads

    @property
    def query_input_dim(self) -> int:
        return (
            frequency_embedding_out_dim(self.in_channels, self.embed_frequency)
            + self.in_extra_channels
        )


def init_autoencoder(
    key: jax.Array, cfg: AutoencoderConfig, dtype: jnp.dtype = jnp.float32
) -> Params:
    keys = jax.random.split(key, cfg.num_layers + 5)
    self_blocks = [
        init_flow_matching_block(
            keys[i],
            dim=cfg.width,
            num_attention_heads=cfg.num_attention_heads,
            use_self_attention=True,
            use_cross_attention=False,
            attention_qk_norm=False,
            attention_bias=False,
            dtype=dtype,
        )
        for i in range(cfg.num_layers)
    ]
    # Final cross-attention block stays float32 (fp32 precision island).
    cross_block = init_flow_matching_block(
        keys[cfg.num_layers],
        dim=cfg.width,
        num_attention_heads=cfg.num_attention_heads,
        use_self_attention=False,
        use_cross_attention=True,
        cross_attention_dim=cfg.width,
        cross_attention_norm="layer_norm",
        attention_qk_norm=False,
        attention_bias=False,
        dtype=jnp.float32,
    )
    return {
        "blocks": self_blocks + [cross_block],
        "proj_query": init_linear(
            keys[cfg.num_layers + 1], cfg.query_input_dim, cfg.width,
            dtype=jnp.float32,
        ),
        "norm_out": init_layer_norm(cfg.width),
        "proj_out": init_linear(
            keys[cfg.num_layers + 2], cfg.width, cfg.out_dim, dtype=jnp.float32
        ),
        "post_quant": init_linear(
            keys[cfg.num_layers + 3], cfg.latent_channels, cfg.width, dtype=dtype
        ),
    }


def apply_displacement(
    cfg: AutoencoderConfig,
    vertex: jnp.ndarray,
    displacement: jnp.ndarray,
    scale: float = 1.0,
) -> jnp.ndarray:
    """(B, V, 3) x (B, T_out, V, 3) -> deformed vertices clamped to [-1, 1]."""
    if cfg.prediction_mode == "direct":
        return jnp.clip(displacement, -1.0 * scale, 1.0 * scale)
    elif cfg.prediction_mode == "residual":
        return jnp.clip(vertex[:, None] + displacement, -1.0 * scale, 1.0 * scale)
    raise ValueError(f"Invalid prediction_mode: {cfg.prediction_mode}")


def embed_queries(cfg: AutoencoderConfig, query: jnp.ndarray) -> jnp.ndarray:
    """Frequency-embed vertex xyz (+ passthrough normals). Float32.

    query (B, V, 3|6) -> (B, V, 51(+3)).
    """
    qf = query.astype(jnp.float32)
    embed = frequency_positional_embedding(
        qf[..., :3],
        num_freqs=cfg.embed_frequency,
        logspace=True,
        include_input=True,
        include_pi=cfg.embed_include_pi,
    )
    if cfg.in_extra_channels > 0:
        embed = jnp.concatenate([embed, qf[..., 3:]], axis=-1)
    return embed


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "attn_impl", "compute_dtype", "mesh", "remat"),
)
def autoencoder_forward(
    params: Params,
    cfg: AutoencoderConfig,
    latent: jnp.ndarray,
    framestep: jnp.ndarray,
    source_alpha: jnp.ndarray,
    target_alphas: jnp.ndarray,
    query: jnp.ndarray,
    attn_impl: str = "auto",
    compute_dtype: jnp.dtype = jnp.float32,
    mesh=None,
    remat: bool = False,
) -> jnp.ndarray:
    """Decode latents into per-vertex displacements for all target timesteps.

    Args:
        latent (B, T, N, D): denoised Stage-I latents.
        framestep (B, T): video timesteps.
        source_alpha (B,): anchor timestep in normalized [0, 1] time.
        target_alphas (B, T_out): target timesteps in normalized [0, 1] time.
        query (B, V, 3|6): vertex positions (+normals).

    Returns:
        displacement (B, T_out, V, out_dim) in (-1, 1).
    """
    def constrain_target_batch(x):
        """Shard the folded (B*T_out) target-batch axis over dp: each
        target's KV stack is independent (see r5c analysis — no exact
        prefix cache exists), so targets are embarrassingly parallel.
        Without the explicit constraint GSPMD is free to replicate the
        folded batch and only tp-shard heads, which wastes the dp chips
        in multichip decode. dp ONLY — the sp axis belongs to the
        attention dispatch's own ring schedule over the [T*N | T]
        sequence (ops/attention.py rings when S % sp == 0; pinning batch
        over sp here would fight it with per-layer reshards). No-op
        off-mesh or when dp doesn't divide the padded batch."""
        if mesh is None:
            return x
        sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
        if sizes.get("dp", 1) <= 1 or x.shape[0] % sizes["dp"]:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P("dp"))
        )

    assert target_alphas.ndim == 2 and source_alpha.ndim == 1

    # Pad T_out up to a multiple of the mesh's dp shards so the folded
    # target batch always shards (production T_out=15 would otherwise not
    # divide dp=2 and silently replicate); padded targets repeat the last
    # alpha and their outputs are sliced off below.
    n_target_shards = 1
    if mesh is not None:
        sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
        n_target_shards = sizes.get("dp", 1)
    T_out_real = target_alphas.shape[1]
    pad_t = (-T_out_real) % n_target_shards
    if pad_t:
        target_alphas = jnp.concatenate(
            [target_alphas,
             jnp.repeat(target_alphas[:, -1:], pad_t, axis=1)], axis=1
        )

    B, T, N, _ = latent.shape
    _, T_out = target_alphas.shape
    V = query.shape[1]
    S = T * N + T  # latent tokens + one alpha token per frame

    framestep_centered = merge_batch_time(
        scale_timestep(framestep, center=True, scale=False)
    )  # (B*T,)

    # -- Project latents to model width: (B, T*N, W)
    latent_proj = merge_time_tokens(
        linear(params["post_quant"], latent.astype(compute_dtype))
    )

    # -- RoPE tables over [T*N latent tokens | T alpha tokens]
    # half channel layout (ops/rotary.py); converter permutes q/k columns
    cos, sin = compute_rotary_embeddings(
        embed_dim=cfg.width_per_head, positions=framestep_centered,
        layout="half",
    )
    cos = cos.reshape(B, T, -1)
    sin = sin.reshape(B, T, -1)
    cos = jnp.concatenate([jnp.repeat(cos, N, axis=1), cos], axis=1)  # (B, S, Dh)
    sin = jnp.concatenate([jnp.repeat(sin, N, axis=1), sin], axis=1)

    # -- (source, target) alpha embedding per target timestep: (B, T_out, W)
    source_alphas = jnp.broadcast_to(source_alpha[:, None], target_alphas.shape)
    alpha_embedded = timestep_embedder(
        source_alphas, target_alphas, frequency_embedding_size=cfg.width // 2
    ).astype(compute_dtype)

    # -- Fold T_out into the batch axis: every target decodes in parallel.
    # seq = [latent tokens (shared) | alpha token repeated T times]
    latent_b = jnp.broadcast_to(
        latent_proj[:, None], (B, T_out) + latent_proj.shape[1:]
    ).reshape(B * T_out, T * N, cfg.width)
    alpha_b = jnp.broadcast_to(
        alpha_embedded[:, :, None, :], (B, T_out, T, cfg.width)
    ).reshape(B * T_out, T, cfg.width)
    x = constrain_target_batch(
        jnp.concatenate([latent_b, alpha_b], axis=1)
    )  # (B*T_out, S, W)

    # RoPE tables are identical across targets; avoid materializing them per
    # batch item (15 x 33k x 128 fp32 would be ~2.5 GB). With B==1 a 2-D
    # table broadcasts inside attention.
    if B == 1:
        cos_b, sin_b = cos[0], sin[0]
    else:
        cos_b = jnp.repeat(cos, T_out, axis=0)
        sin_b = jnp.repeat(sin, T_out, axis=0)

    # -- KV stack: self-attention blocks (compute dtype)
    def apply_block(bp, x, freqs):
        return flow_matching_block(
            bp,
            x,
            num_attention_heads=cfg.num_attention_heads,
            freqs_rot=freqs,
            attn_impl=attn_impl,
            rope_layout="half",
            gelu_approx=cfg.gelu_approx,
            mesh=mesh,
        )

    if remat:
        apply_block = jax.checkpoint(apply_block)
    for block_params in params["blocks"][:-1]:
        x = apply_block(block_params, x, (cos_b, sin_b))

    # -- Final cross-attention with vertex queries (float32 island)
    kv_cache = x.astype(jnp.float32)
    query_embed = embed_queries(cfg, query)  # (B, V, Dq) fp32
    queries = linear(params["proj_query"], query_embed)
    queries_b = constrain_target_batch(
        jnp.broadcast_to(
            queries[:, None], (B, T_out) + queries.shape[1:]
        ).reshape(B * T_out, V, cfg.width)
    )

    logits = flow_matching_block(
        params["blocks"][-1],
        queries_b,
        num_attention_heads=cfg.num_attention_heads,
        encoder_hidden_states=kv_cache,
        attn_impl=attn_impl,
        mesh=mesh,
    )
    logits = linear(params["proj_out"], layer_norm(params["norm_out"], logits))
    logits = logits * -1.0  # sign flip (temporal_autoencoder.py:160)

    displacement = 2.0 * jax.nn.sigmoid(logits) - 1.0
    out = displacement.reshape(B, T_out, V, cfg.out_dim)
    return out[:, :T_out_real] if pad_t else out
