"""DINOv2 vision transformer (ViT-L/14) in functional JAX.

TPU-native replacement for the reference's HF ``Dinov2Model`` conditioning
encoder (reference: actionmesh/model/image_encoder.py:17-55). The whole
batched T-frame encode jit-compiles into one XLA program; patch embedding is
a conv that XLA maps onto the MXU.

Architecture (dinov2-large): patch 14, width 1024, 24 layers, 16 heads,
MLP ratio 4, LayerScale, CLS token, learned pos-embed (bicubic-interpolated
to the input grid). Param names mirror the HF checkpoint so the converter
(utils/weights.py) is a rename.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from actionmesh_tpu.models.layers import (
    Params,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
)
from actionmesh_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class DinoV2Config:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_ratio: int = 4
    patch_size: int = 14
    image_size: int = 518  # checkpoint's native pos-embed grid (37x37)
    layerscale_init: float = 1.0e-5
    eps: float = 1e-6


def init_dinov2(
    key: jax.Array, cfg: DinoV2Config, dtype: jnp.dtype = jnp.float32
) -> Params:
    n_patches = (cfg.image_size // cfg.patch_size) ** 2
    keys = jax.random.split(key, cfg.num_layers + 3)
    w = cfg.hidden_size

    def init_block(k):
        k1, k2, k3, k4, k5, k6 = jax.random.split(k, 6)
        return {
            "norm1": init_layer_norm(w),
            "attention": {
                "query": init_linear(k1, w, w, dtype=dtype),
                "key": init_linear(k2, w, w, dtype=dtype),
                "value": init_linear(k3, w, w, dtype=dtype),
                "output": init_linear(k4, w, w, dtype=dtype),
            },
            "layer_scale1": {
                "lambda1": jnp.full((w,), cfg.layerscale_init, jnp.float32)
            },
            "norm2": init_layer_norm(w),
            "mlp": {
                "fc1": init_linear(k5, w, w * cfg.mlp_ratio, dtype=dtype),
                "fc2": init_linear(k6, w * cfg.mlp_ratio, w, dtype=dtype),
            },
            "layer_scale2": {
                "lambda1": jnp.full((w,), cfg.layerscale_init, jnp.float32)
            },
        }

    return {
        "patch_embed": {
            # conv kernel stored as (P, P, 3, W) HWIO
            "kernel": (
                jax.random.normal(
                    keys[0], (cfg.patch_size, cfg.patch_size, 3, w)
                ).astype(dtype)
                * 0.02
            ),
            "bias": jnp.zeros((w,), dtype),
        },
        "cls_token": jnp.zeros((1, 1, w), jnp.float32),
        "pos_embed": (
            jax.random.normal(keys[1], (1, n_patches + 1, w)).astype(jnp.float32)
            * 0.02
        ),
        "blocks": [init_block(keys[2 + i]) for i in range(cfg.num_layers)],
        "norm": init_layer_norm(w),
    }


def _interpolate_pos_embed(
    pos_embed: jnp.ndarray, grid: int, cfg: DinoV2Config
) -> jnp.ndarray:
    """Bicubic-resample the patch pos-embed grid to `grid` x `grid`."""
    src_grid = int(math.sqrt(pos_embed.shape[1] - 1))
    cls_pe = pos_embed[:, :1]
    patch_pe = pos_embed[:, 1:]
    if src_grid == grid:
        return pos_embed
    patch_pe = patch_pe.reshape(1, src_grid, src_grid, -1)
    patch_pe = jax.image.resize(
        patch_pe, (1, grid, grid, patch_pe.shape[-1]), method="bicubic"
    )
    patch_pe = patch_pe.reshape(1, grid * grid, -1)
    return jnp.concatenate([cls_pe, patch_pe], axis=1)


def dinov2_forward(
    params: Params,
    cfg: DinoV2Config,
    pixel_values: jnp.ndarray,
    attn_impl: str = "auto",
) -> jnp.ndarray:
    """pixel_values (B, H, W, 3) normalized -> last_hidden_state (B, S, W)."""
    B, H, W, _ = pixel_values.shape
    grid = H // cfg.patch_size

    x = jax.lax.conv_general_dilated(
        pixel_values.astype(params["patch_embed"]["kernel"].dtype),
        params["patch_embed"]["kernel"],
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["patch_embed"]["bias"]
    x = x.reshape(B, grid * grid, cfg.hidden_size)

    cls = jnp.broadcast_to(
        params["cls_token"].astype(x.dtype), (B, 1, cfg.hidden_size)
    )
    x = jnp.concatenate([cls, x], axis=1)
    pos = _interpolate_pos_embed(params["pos_embed"], grid, cfg)
    x = x + pos.astype(x.dtype)

    heads = cfg.num_heads
    dim_head = cfg.hidden_size // heads
    for block in params["blocks"]:
        h = layer_norm(block["norm1"], x, eps=cfg.eps)
        q = linear(block["attention"]["query"], h)
        k = linear(block["attention"]["key"], h)
        v = linear(block["attention"]["value"], h)
        S = h.shape[1]
        q = q.reshape(B, S, heads, dim_head).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, heads, dim_head).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, heads, dim_head).transpose(0, 2, 1, 3)
        att = dot_product_attention(q, k, v, impl=attn_impl)
        att = att.transpose(0, 2, 1, 3).reshape(B, S, cfg.hidden_size)
        att = linear(block["attention"]["output"], att)
        x = x + att * block["layer_scale1"]["lambda1"].astype(att.dtype)

        h = layer_norm(block["norm2"], x, eps=cfg.eps)
        h = linear(
            block["mlp"]["fc2"],
            jax.nn.gelu(linear(block["mlp"]["fc1"], h), approximate=False),
        )
        x = x + h * block["layer_scale2"]["lambda1"].astype(h.dtype)

    return layer_norm(params["norm"], x, eps=cfg.eps)
