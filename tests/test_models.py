"""Stage I / Stage II model tests on tiny configs (CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from actionmesh_tpu.models.autoencoder import (
    AutoencoderConfig,
    apply_displacement,
    autoencoder_forward,
    embed_queries,
    init_autoencoder,
)
from actionmesh_tpu.models.denoiser import (
    DenoiserConfig,
    denoiser_forward,
    init_denoiser,
    precompute_freqs_rot,
)
from actionmesh_tpu.sampling.denoise_loop import denoise_window, get_noise
from actionmesh_tpu.sampling.flow_schedule import get_schedule
from actionmesh_tpu.sampling.guidance import make_guidance

TINY_DENOISER = DenoiserConfig(
    num_tokens_nominal=8,
    temporal_context_size=4,
    in_channels=8,
    num_layers=5,
    num_attention_heads=2,
    width=32,
    mlp_ratio=2.0,
    cross_attention_dim=16,
    inflated_layers=tuple(range(5)),
)

TINY_AE = AutoencoderConfig(
    temporal_context_size=4,
    latent_channels=8,
    width=32,
    num_layers=3,
    num_attention_heads=2,
)


class TestDenoiser:
    def test_forward_shapes_and_finite(self):
        cfg = TINY_DENOISER
        params = init_denoiser(jax.random.PRNGKey(0), cfg)
        B, T, N = 2, 4, 8
        x = jax.random.normal(jax.random.PRNGKey(1), (B, T, N, cfg.in_channels))
        ctx = jax.random.normal(jax.random.PRNGKey(2), (B, T, 5, 16))
        framestep = jnp.tile(jnp.arange(T, dtype=jnp.float32)[None], (B, 1))
        dt = jnp.full((B,), 500.0)
        mask = jnp.zeros((B, T))
        out = denoiser_forward(
            params, cfg, x, ctx, framestep, dt, mask=mask, attn_impl="naive"
        )
        assert out.shape == (B, T, N, cfg.in_channels)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_freqs_precompute_matches_inline(self):
        cfg = TINY_DENOISER
        params = init_denoiser(jax.random.PRNGKey(0), cfg)
        B, T, N = 1, 4, 8
        x = jax.random.normal(jax.random.PRNGKey(1), (B, T, N, cfg.in_channels))
        ctx = jax.random.normal(jax.random.PRNGKey(2), (B, T, 5, 16))
        framestep = jnp.array([[0.0, 1.0, 2.0, 3.0]])
        dt = jnp.full((B,), 100.0)
        freqs = precompute_freqs_rot(cfg, framestep, N)
        out1 = denoiser_forward(
            params, cfg, x, ctx, framestep, dt, freqs_rot=freqs, attn_impl="naive"
        )
        out2 = denoiser_forward(
            params, cfg, x, ctx, framestep, dt, attn_impl="naive"
        )
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)

    def test_mask_zeroes_diffusion_time(self):
        """A GT frame (mask=1) must see diffusion_time 0 in its time token."""
        cfg = TINY_DENOISER
        params = init_denoiser(jax.random.PRNGKey(0), cfg)
        B, T, N = 1, 4, 8
        x = jax.random.normal(jax.random.PRNGKey(1), (B, T, N, cfg.in_channels))
        ctx = jnp.zeros((B, T, 5, 16))
        framestep = jnp.array([[0.0, 1.0, 2.0, 3.0]])
        mask_all = jnp.ones((B, T))
        out_masked_t500 = denoiser_forward(
            params, cfg, x, ctx, framestep, jnp.full((B,), 500.0),
            mask=mask_all, attn_impl="naive",
        )
        out_masked_t0 = denoiser_forward(
            params, cfg, x, ctx, framestep, jnp.zeros((B,)),
            mask=mask_all, attn_impl="naive",
        )
        np.testing.assert_allclose(
            np.asarray(out_masked_t500), np.asarray(out_masked_t0), atol=1e-6
        )

    def test_framestep_translation_invariance(self):
        """Centered RoPE => shifting all timesteps leaves output unchanged."""
        cfg = TINY_DENOISER
        params = init_denoiser(jax.random.PRNGKey(0), cfg)
        B, T, N = 1, 4, 8
        x = jax.random.normal(jax.random.PRNGKey(1), (B, T, N, cfg.in_channels))
        ctx = jax.random.normal(jax.random.PRNGKey(2), (B, T, 5, 16))
        dt = jnp.full((B,), 250.0)
        fs1 = jnp.array([[0.0, 1.0, 2.0, 3.0]])
        fs2 = fs1 + 100.0
        out1 = denoiser_forward(params, cfg, x, ctx, fs1, dt, attn_impl="naive")
        out2 = denoiser_forward(params, cfg, x, ctx, fs2, dt, attn_impl="naive")
        np.testing.assert_allclose(
            np.asarray(out1), np.asarray(out2), atol=1e-5
        )


class TestDenoiseLoop:
    def test_denoise_window_runs_and_freezes_observed(self):
        cfg = TINY_DENOISER
        params = init_denoiser(jax.random.PRNGKey(0), cfg)
        guidance = make_guidance([[0, 1], [1, 1]], [7.5])
        B, T, N = 1, 4, 8
        key = jax.random.PRNGKey(42)
        noise = get_noise(key, (N, cfg.in_channels), B, T)
        cond = jnp.full((B, T, N, cfg.in_channels), 0.5)
        mask = jnp.array([[1, 0, 0, 0]], dtype=jnp.int32)
        init = cond * mask[..., None, None] + noise * (1 - mask[..., None, None])
        ctx = jax.random.normal(jax.random.PRNGKey(2), (B, T, 5, 16))
        framestep = jnp.arange(T, dtype=jnp.float32)[None]
        ts, dist = get_schedule(3, shift=3.0)
        out = denoise_window(
            params, cfg, guidance, init, ctx, mask, framestep,
            jnp.asarray(ts), jnp.asarray(dist),
            is_additive=True, attn_impl="naive",
        )
        assert out.shape == init.shape
        assert bool(jnp.all(jnp.isfinite(out)))
        # observed frame 0 must be exactly frozen
        np.testing.assert_array_equal(np.asarray(out[0, 0]), np.asarray(init[0, 0]))
        # unobserved frames must have changed
        assert not np.allclose(np.asarray(out[0, 1]), np.asarray(init[0, 1]))

    def test_noise_temporal_correlation(self):
        key = jax.random.PRNGKey(0)
        n = get_noise(key, (16, 4), 1, 5, corr_noise=1.0)
        # full correlation -> all frames identical
        np.testing.assert_allclose(np.asarray(n[0, 0]), np.asarray(n[0, 4]))
        n2 = get_noise(key, (16, 4), 1, 5, corr_noise=0.0)
        assert not np.allclose(np.asarray(n2[0, 0]), np.asarray(n2[0, 1]))


class TestAutoencoder:
    def test_forward_shapes(self):
        cfg = TINY_AE
        params = init_autoencoder(jax.random.PRNGKey(0), cfg)
        B, T, N, V, T_out = 1, 4, 8, 33, 3
        latent = jax.random.normal(
            jax.random.PRNGKey(1), (B, T, N, cfg.latent_channels)
        )
        framestep = jnp.arange(T, dtype=jnp.float32)[None]
        source_alpha = jnp.zeros((B,))
        target_alphas = jnp.array([[1 / 3, 2 / 3, 1.0]])
        query = jax.random.uniform(
            jax.random.PRNGKey(2), (B, V, 6), minval=-1, maxval=1
        )
        disp = autoencoder_forward(
            params, cfg, latent, framestep, source_alpha, target_alphas, query,
            attn_impl="naive",
        )
        assert disp.shape == (B, T_out, V, 3)
        assert bool(jnp.all(jnp.isfinite(disp)))
        assert float(disp.max()) < 1.0 and float(disp.min()) > -1.0

    def test_batched_targets_match_sequential(self):
        """Folding T_out into batch must equal decoding targets one at a time."""
        cfg = TINY_AE
        params = init_autoencoder(jax.random.PRNGKey(0), cfg)
        B, T, N, V = 1, 4, 8, 17
        latent = jax.random.normal(
            jax.random.PRNGKey(1), (B, T, N, cfg.latent_channels)
        )
        framestep = jnp.arange(T, dtype=jnp.float32)[None]
        source_alpha = jnp.zeros((B,))
        target_alphas = jnp.array([[0.5, 1.0]])
        query = jax.random.uniform(
            jax.random.PRNGKey(2), (B, V, 6), minval=-1, maxval=1
        )
        batched = autoencoder_forward(
            params, cfg, latent, framestep, source_alpha, target_alphas, query,
            attn_impl="naive",
        )
        for i in range(2):
            single = autoencoder_forward(
                params, cfg, latent, framestep, source_alpha,
                target_alphas[:, i : i + 1], query, attn_impl="naive",
            )
            np.testing.assert_allclose(
                np.asarray(batched[:, i]), np.asarray(single[:, 0]), atol=1e-5
            )

    def test_embed_queries_dims(self):
        q = jnp.ones((1, 10, 6))
        e = embed_queries(TINY_AE, q)
        assert e.shape == (1, 10, 54)
        assert e.dtype == jnp.float32

    def test_apply_displacement_modes(self):
        cfg = TINY_AE
        v = jnp.zeros((1, 5, 3))
        d = jnp.full((1, 2, 5, 3), 2.0)
        out = apply_displacement(cfg, v, d)
        np.testing.assert_allclose(np.asarray(out), 1.0)  # clamped
        cfg_res = AutoencoderConfig(prediction_mode="residual")
        out2 = apply_displacement(cfg_res, jnp.full((1, 5, 3), -0.5), d)
        np.testing.assert_allclose(np.asarray(out2), 1.0)


class TestSegmentedDenoise:
    def test_segmented_equals_monolithic(self):
        from actionmesh_tpu.sampling.denoise_loop import (
            denoise_window_segmented,
        )

        cfg = TINY_DENOISER
        params = init_denoiser(jax.random.PRNGKey(0), cfg)
        guidance = make_guidance([[0, 1], [1, 1]], [7.5])
        B, T, N = 1, 4, 8
        init = get_noise(jax.random.PRNGKey(42), (N, cfg.in_channels), B, T)
        ctx = jax.random.normal(jax.random.PRNGKey(2), (B, T, 5, 16))
        mask = jnp.array([[1, 0, 0, 0]], dtype=jnp.int32)
        framestep = jnp.arange(T, dtype=jnp.float32)[None]
        ts, dist = get_schedule(7, shift=3.0)
        args = (params, cfg, guidance, init, ctx, mask, framestep,
                jnp.asarray(ts), jnp.asarray(dist))
        mono = denoise_window(*args, is_additive=True, attn_impl="naive")
        calls = []
        segmented = denoise_window_segmented(
            *args, is_additive=True, attn_impl="naive",
            steps_per_launch=3,
            step_callback=lambda s, t: calls.append((s, t)),
        )
        np.testing.assert_allclose(
            np.asarray(segmented), np.asarray(mono), atol=1e-5
        )
        assert calls == [(3, 7), (6, 7), (7, 7)]

    def test_split_cfg_batch_equals_joint(self):
        cfg = TINY_DENOISER
        params = init_denoiser(jax.random.PRNGKey(0), cfg)
        guidance = make_guidance([[0, 1], [1, 1]], [7.5])
        B, T, N = 1, 4, 8
        init = get_noise(jax.random.PRNGKey(42), (N, cfg.in_channels), B, T)
        ctx = jax.random.normal(jax.random.PRNGKey(2), (B, T, 5, 16))
        mask = jnp.array([[1, 0, 0, 0]], dtype=jnp.int32)
        framestep = jnp.arange(T, dtype=jnp.float32)[None]
        ts, dist = get_schedule(3, shift=3.0)
        args = (params, cfg, guidance, init, ctx, mask, framestep,
                jnp.asarray(ts), jnp.asarray(dist))
        joint = denoise_window(*args, is_additive=True, attn_impl="naive")
        split = denoise_window(
            *args, is_additive=True, attn_impl="naive", split_cfg_batch=True
        )
        np.testing.assert_allclose(
            np.asarray(split), np.asarray(joint), atol=1e-5
        )


@pytest.mark.slow
class TestTrainability:
    def test_grad_flows_through_denoiser(self):
        """The functional design is trainable: flow-matching loss gradients
        exist for every parameter (the reference is inference-only)."""
        cfg = TINY_DENOISER
        params = init_denoiser(jax.random.PRNGKey(0), cfg)
        B, T, N = 1, 4, 8
        x = jax.random.normal(jax.random.PRNGKey(1), (B, T, N, cfg.in_channels))
        target_v = jax.random.normal(jax.random.PRNGKey(3), x.shape)
        ctx = jax.random.normal(jax.random.PRNGKey(2), (B, T, 5, 16))
        framestep = jnp.arange(T, dtype=jnp.float32)[None]
        dt = jnp.full((B,), 400.0)

        def loss_fn(p):
            pred = denoiser_forward(
                p, cfg, x, ctx, framestep, dt, attn_impl="naive"
            )
            return jnp.mean((pred - target_v) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert jnp.isfinite(loss)
        leaves = jax.tree.leaves(grads)
        assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
        # every parameter receives nonzero gradient signal
        nonzero = sum(bool(jnp.any(g != 0)) for g in leaves)
        assert nonzero / len(leaves) > 0.95


@pytest.mark.slow
def test_gelu_tanh_within_bf16_noise():
    """The tanh-GELU speed default stays inside the bf16 quantization envelope.

    Justifies DenoiserConfig.gelu_approx=True: on a bf16 model the
    erf-vs-tanh output delta must be no larger than the bf16-vs-fp32 delta
    itself (both ~3% of output std on random weights) — i.e. the
    approximation does not add error beyond what bf16 inference already
    carries. Reference runs erf-GELU under bf16/fp16 autocast, which sits in
    the same envelope.
    """
    cfg_erf = dataclasses.replace(TINY_DENOISER, gelu_approx=False)
    cfg_tanh = TINY_DENOISER  # gelu_approx defaults True
    key = jax.random.PRNGKey(11)
    p32 = init_denoiser(key, cfg_erf, dtype=jnp.float32)
    p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p32)
    B, T, N = 1, 4, 8
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, N, cfg_erf.in_channels))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (B, T, 5, 16))
    framestep = jnp.tile(jnp.arange(T, dtype=jnp.float32)[None], (B, 1))
    dt = jnp.full((B,), 500.0)

    def fwd(p, cfg, xd, cd):
        return denoiser_forward(
            p, cfg, xd, cd, framestep, dt, attn_impl="naive"
        ).astype(jnp.float32)

    out_fp32 = fwd(p32, cfg_erf, x, ctx)
    out_bf16_erf = fwd(p16, cfg_erf, x.astype(jnp.bfloat16), ctx.astype(jnp.bfloat16))
    out_bf16_tanh = fwd(p16, cfg_tanh, x.astype(jnp.bfloat16), ctx.astype(jnp.bfloat16))

    bf16_noise = float(jnp.max(jnp.abs(out_fp32 - out_bf16_erf)))
    tanh_delta = float(jnp.max(jnp.abs(out_bf16_erf - out_bf16_tanh)))
    assert tanh_delta <= 1.5 * bf16_noise, (tanh_delta, bf16_noise)
