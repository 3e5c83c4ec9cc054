"""Step-time levers (layers.py) must be EXACT rewrites, not approximations.

Two single-chip levers (BENCH_NOTES r3b):
  * fused qkv — one (D, 3D) matmul for self-attention's three projections;
  * uncond cross-attention skip — a CFG branch with all-zero image context
    has k = v = 0 under bias-free projections, so softmax is uniform over
    zero values and the output is exactly the out-projection bias.
Both are gated on module flags (env ACTIONMESH_FUSE_QKV /
ACTIONMESH_SKIP_UNCOND_XATTN); tests force the flags and demand equality
with the plain path in fp32.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

import actionmesh_tpu.models.layers as layers
from actionmesh_tpu.models.denoiser import (
    DenoiserConfig,
    denoiser_forward,
    init_denoiser,
)

CFG = DenoiserConfig(
    num_tokens_nominal=8,
    temporal_context_size=4,
    in_channels=8,
    num_layers=3,
    num_attention_heads=2,
    width=32,
    mlp_ratio=2.0,
    cross_attention_dim=16,
    inflated_layers=(0, 1, 2),
)


def _inputs(g=2):
    rng = np.random.default_rng(0)
    B, T, N, S = g, 4, CFG.num_tokens_nominal, 5
    hidden = jnp.asarray(rng.normal(size=(B, T, N, CFG.in_channels)), jnp.float32)
    ctx = rng.normal(size=(B, T, S, CFG.cross_attention_dim)).astype(np.float32)
    ctx[0] = 0.0  # leading unconditional-image branch
    framestep = jnp.tile(jnp.arange(T, dtype=jnp.float32)[None], (B, 1))
    dt = jnp.full((B,), 300.0, jnp.float32)
    return hidden, jnp.asarray(ctx), framestep, dt


def test_uncond_xattn_skip_is_exact(monkeypatch):
    params = init_denoiser(jax.random.PRNGKey(1), CFG)
    hidden, ctx, framestep, dt = _inputs()

    monkeypatch.setattr(layers, "_SKIP_UNCOND_XATTN", False)
    ref = np.asarray(
        denoiser_forward(params, CFG, hidden, ctx, framestep, dt,
                         attn_impl="naive", uncond_batch=1)
    )
    monkeypatch.setattr(layers, "_SKIP_UNCOND_XATTN", True)
    # different leading shape-irrelevant arg would not bust the jit cache —
    # the flag is read at trace time, so clear caches explicitly
    jax.clear_caches()
    out = np.asarray(
        denoiser_forward(params, CFG, hidden, ctx, framestep, dt,
                         attn_impl="naive", uncond_batch=1)
    )
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_uncond_skip_requires_zero_context(monkeypatch):
    """With NON-zero context in branch 0 the lever must not be equal —
    proving the test above actually exercises the skip path."""
    params = init_denoiser(jax.random.PRNGKey(1), CFG)
    hidden, ctx, framestep, dt = _inputs()
    ctx = ctx.at[0].set(1.0)  # violate the all-zero precondition

    monkeypatch.setattr(layers, "_SKIP_UNCOND_XATTN", False)
    ref = np.asarray(
        denoiser_forward(params, CFG, hidden, ctx, framestep, dt,
                         attn_impl="naive", uncond_batch=1)
    )
    monkeypatch.setattr(layers, "_SKIP_UNCOND_XATTN", True)
    jax.clear_caches()
    out = np.asarray(
        denoiser_forward(params, CFG, hidden, ctx, framestep, dt,
                         attn_impl="naive", uncond_batch=1)
    )
    assert not np.allclose(out, ref, atol=1e-5)


def test_fused_qkv_matches_separate_projections(monkeypatch):
    params = init_denoiser(jax.random.PRNGKey(2), CFG)
    hidden, ctx, framestep, dt = _inputs()

    monkeypatch.setattr(layers, "_FUSE_QKV", False)
    ref = np.asarray(
        denoiser_forward(params, CFG, hidden, ctx, framestep, dt,
                         attn_impl="naive")
    )
    monkeypatch.setattr(layers, "_FUSE_QKV", True)
    jax.clear_caches()
    out = np.asarray(
        denoiser_forward(params, CFG, hidden, ctx, framestep, dt,
                         attn_impl="naive")
    )
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_levers_compose_in_denoise_window(monkeypatch):
    """Both levers on, through the real CFG loop (guidance supplies the
    zeroed branch): must match the plain path."""
    from actionmesh_tpu.sampling.denoise_loop import denoise_window, get_noise
    from actionmesh_tpu.sampling.flow_schedule import get_schedule
    from actionmesh_tpu.sampling.guidance import make_guidance

    params = init_denoiser(jax.random.PRNGKey(3), CFG)
    guidance = make_guidance([[0, 1], [1, 1]], [7.5])
    assert guidance.leading_uncond_image_branches == 1
    B, T, N = 1, 4, CFG.num_tokens_nominal
    rng = np.random.default_rng(5)
    init_latent = get_noise(jax.random.PRNGKey(4), (N, CFG.in_channels), B, T)
    context = jnp.asarray(
        rng.normal(size=(B, T, 5, CFG.cross_attention_dim)), jnp.float32
    )
    mask = jnp.concatenate(
        [jnp.ones((B, 1), jnp.int32), jnp.zeros((B, T - 1), jnp.int32)], axis=1
    )
    framestep = jnp.tile(jnp.arange(T, dtype=jnp.float32)[None], (B, 1))
    ts, dist = get_schedule(3, shift=3.0)

    def run():
        jax.clear_caches()
        return np.asarray(
            denoise_window(
                params, CFG, guidance, init_latent, context, mask, framestep,
                jnp.asarray(ts), jnp.asarray(dist),
                is_additive=True, attn_impl="chunked",
            )
        )

    monkeypatch.setattr(layers, "_SKIP_UNCOND_XATTN", False)
    monkeypatch.setattr(layers, "_FUSE_QKV", False)
    ref = run()
    monkeypatch.setattr(layers, "_SKIP_UNCOND_XATTN", True)
    monkeypatch.setattr(layers, "_FUSE_QKV", True)
    out = run()
    np.testing.assert_allclose(out, ref, atol=5e-5)
