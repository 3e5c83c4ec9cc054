"""Full-size synthetic-checkpoint dry-runs for every converter family.

Round-2 verdict item 3: converters had only ever been exercised at toy
widths, so first contact with a real checkpoint (downloadable only outside
this environment) was set up to fail slow. These tests:

  * synthesize reference-shaped state dicts at the PRODUCTION
    hyperparameters (21x2048 denoiser, 16+1x1024 autoencoder, ViT-L
    DINOv2 via HF transformers itself, TripoSG DiT+VAE; ISNet lives in
    test_rmbg_parity.py),
  * pin the synthesizers to the torch transcriptions at the parity tests'
    sizes (exact key-set + shape equality), so the synthetic checkpoints
    cannot drift from the validated naming,
  * run each converter (with the new verify_converted structural check) and
    one forward pass, asserting shapes/dtypes/fp32 islands,
  * and prove the fail-fast paths: a wrong-but-present hyperparameter in a
    config raises from verify_converted, and an unknown TripoSG config.json
    key raises from from_pretrained instead of silently defaulting.

Production-size cases are ``slow``-marked.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# State-dict synthesizers (reference checkpoint names at any size)
# ---------------------------------------------------------------------------

def _lin(rng, out_f, in_f, bias=True, scale=0.02):
    d = {"weight": (rng.standard_normal((out_f, in_f)) * scale).astype(np.float32)}
    if bias:
        d["bias"] = np.zeros((out_f,), np.float32)
    return d


def _emit(out, prefix, tensors):
    for name, arr in tensors.items():
        out[f"{prefix}.{name}"] = arr


def synth_denoiser_state(cfg, seed=0) -> dict:
    """ActionMesh Stage-I denoiser checkpoint names (also the TripoSG DiT:
    the DiT is the T=1 ancestor with the identical parameter layout)."""
    rng = np.random.default_rng(seed)
    W, C, X = cfg.width, cfg.in_channels, cfg.cross_attention_dim
    dh = W // cfg.num_attention_heads
    inner = int(W * cfg.mlp_ratio)
    out: dict = {}
    _emit(out, "time_proj.linear_1", _lin(rng, W * 4, W))
    _emit(out, "time_proj.linear_2", _lin(rng, W, W * 4))
    _emit(out, "proj_in", _lin(rng, W, C))
    ones = np.ones
    for i in range(cfg.num_layers):
        p = f"blocks.{i}"
        for attn, kv_dim in (("s_attn", W), ("x_attn", X)):
            out[f"{p}.norm_{attn}.weight"] = ones(W, np.float32)
            out[f"{p}.norm_{attn}.bias"] = np.zeros(W, np.float32)
            _emit(out, f"{p}.{attn}.to_q", _lin(rng, W, W, bias=False))
            _emit(out, f"{p}.{attn}.to_k", _lin(rng, W, kv_dim, bias=False))
            _emit(out, f"{p}.{attn}.to_v", _lin(rng, W, kv_dim, bias=False))
            _emit(out, f"{p}.{attn}.to_out.0", _lin(rng, W, W))
            out[f"{p}.{attn}.norm_q.weight"] = ones(dh, np.float32)
            out[f"{p}.{attn}.norm_k.weight"] = ones(dh, np.float32)
        out[f"{p}.norm_ff.weight"] = ones(W, np.float32)
        out[f"{p}.norm_ff.bias"] = np.zeros(W, np.float32)
        _emit(out, f"{p}.ff.net.0.proj", _lin(rng, inner, W))
        _emit(out, f"{p}.ff.net.2", _lin(rng, W, inner))
        if i > cfg.num_layers // 2:
            out[f"{p}.norm_skip.weight"] = ones(W, np.float32)
            out[f"{p}.norm_skip.bias"] = np.zeros(W, np.float32)
            _emit(out, f"{p}.linear_skip", _lin(rng, W, 2 * W))
    out["norm_out.weight"] = ones(W, np.float32)
    out["norm_out.bias"] = np.zeros(W, np.float32)
    _emit(out, "proj_out", _lin(rng, cfg.out_channels, W))
    return out


def synth_autoencoder_state(cfg, seed=0) -> dict:
    """ActionMesh Stage-II autoencoder checkpoint names (self blocks have no
    qk-norm; the final block is cross-attention with norm_cross)."""
    rng = np.random.default_rng(seed)
    W, L = cfg.width, cfg.latent_channels
    inner = W * 4
    out: dict = {}
    ones = np.ones
    for i in range(cfg.num_layers):
        p = f"blocks.{i}"
        out[f"{p}.norm_s_attn.weight"] = ones(W, np.float32)
        out[f"{p}.norm_s_attn.bias"] = np.zeros(W, np.float32)
        for n in ("q", "k", "v"):
            _emit(out, f"{p}.s_attn.to_{n}", _lin(rng, W, W, bias=False))
        _emit(out, f"{p}.s_attn.to_out.0", _lin(rng, W, W))
        out[f"{p}.norm_ff.weight"] = ones(W, np.float32)
        out[f"{p}.norm_ff.bias"] = np.zeros(W, np.float32)
        _emit(out, f"{p}.ff.net.0.proj", _lin(rng, inner, W))
        _emit(out, f"{p}.ff.net.2", _lin(rng, W, inner))
    p = f"blocks.{cfg.num_layers}"
    out[f"{p}.norm_x_attn.weight"] = ones(W, np.float32)
    out[f"{p}.norm_x_attn.bias"] = np.zeros(W, np.float32)
    out[f"{p}.x_attn.norm_cross.weight"] = ones(W, np.float32)
    out[f"{p}.x_attn.norm_cross.bias"] = np.zeros(W, np.float32)
    for n in ("q", "k", "v"):
        _emit(out, f"{p}.x_attn.to_{n}", _lin(rng, W, W, bias=False))
    _emit(out, f"{p}.x_attn.to_out.0", _lin(rng, W, W))
    out[f"{p}.norm_ff.weight"] = ones(W, np.float32)
    out[f"{p}.norm_ff.bias"] = np.zeros(W, np.float32)
    _emit(out, f"{p}.ff.net.0.proj", _lin(rng, inner, W))
    _emit(out, f"{p}.ff.net.2", _lin(rng, W, inner))
    _emit(out, "post_quant", _lin(rng, W, L))
    _emit(out, "proj_query", _lin(rng, W, cfg.query_input_dim))
    out["norm_out.weight"] = ones(W, np.float32)
    out["norm_out.bias"] = np.zeros(W, np.float32)
    _emit(out, "proj_out", _lin(rng, cfg.out_dim, W))
    return out


def _shapes(state: dict) -> dict:
    return {k: tuple(np.asarray(v).shape) for k, v in state.items()}


# ---------------------------------------------------------------------------
# Synthesizers pinned to the torch transcriptions (fast)
# ---------------------------------------------------------------------------

class TestSynthesizersMatchTranscriptions:
    def test_denoiser_synth_matches_torch_names(self):
        from tests.test_denoiser_parity import (
            CROSS_DIM, HEADS, IN_CH, LAYERS, WIDTH,
            RefDenoiser, state_dict_with_reference_names,
        )
        from actionmesh_tpu.models.denoiser import DenoiserConfig

        torch.manual_seed(0)
        ref = _shapes(state_dict_with_reference_names(RefDenoiser()))
        cfg = DenoiserConfig(
            num_tokens_nominal=8, temporal_context_size=4, in_channels=IN_CH,
            num_layers=LAYERS, num_attention_heads=HEADS, width=WIDTH,
            mlp_ratio=2.0, cross_attention_dim=CROSS_DIM,
        )
        ours = _shapes(synth_denoiser_state(cfg))
        assert ours == ref

    def test_autoencoder_synth_matches_torch_names(self):
        from tests.test_autoencoder_parity import (
            HEADS, LATENT, LAYERS, WIDTH, FREQS,
            RefAutoencoder, reference_state_dict,
        )
        from actionmesh_tpu.models.autoencoder import AutoencoderConfig

        torch.manual_seed(0)
        ref = _shapes(reference_state_dict(RefAutoencoder()))
        cfg = AutoencoderConfig(
            temporal_context_size=4, latent_channels=LATENT, width=WIDTH,
            num_layers=LAYERS, num_attention_heads=HEADS, embed_frequency=FREQS,
        )
        ours = _shapes(synth_autoencoder_state(cfg))
        assert ours == ref


# ---------------------------------------------------------------------------
# Fail-fast behavior (fast)
# ---------------------------------------------------------------------------

class TestFailFast:
    def test_wrong_mlp_ratio_raises_structural_report(self):
        """A wrong-but-present hyperparameter that converts CLEANLY (pure
        rename, no mechanical failure) must still raise from
        verify_converted, not build a garbage model."""
        from actionmesh_tpu.models.denoiser import DenoiserConfig
        from actionmesh_tpu.utils.weights import convert_denoiser

        good = DenoiserConfig(
            num_tokens_nominal=8, temporal_context_size=4, in_channels=8,
            num_layers=3, num_attention_heads=2, width=32, mlp_ratio=2.0,
            cross_attention_dim=16,
        )
        state = synth_denoiser_state(good)
        import dataclasses

        wrong = dataclasses.replace(good, mlp_ratio=4.0)
        with pytest.raises(ValueError, match="does not match the configured"):
            convert_denoiser(state, wrong, dtype=jnp.float32)

    def test_fewer_layers_than_checkpoint_raises(self):
        """Configuring FEWER layers than the checkpoint has would silently
        drop the extra blocks during conversion — verify_converted must
        refuse (the skip topology shifts, so shapes mismatch)."""
        from actionmesh_tpu.models.denoiser import DenoiserConfig
        from actionmesh_tpu.utils.weights import convert_denoiser

        good = DenoiserConfig(
            num_tokens_nominal=8, temporal_context_size=4, in_channels=8,
            num_layers=5, num_attention_heads=2, width=32, mlp_ratio=2.0,
            cross_attention_dim=16,
        )
        state = synth_denoiser_state(good)
        import dataclasses

        wrong = dataclasses.replace(good, num_layers=3)
        with pytest.raises((ValueError, KeyError)):
            convert_denoiser(state, wrong, dtype=jnp.float32)

    def test_wrong_layer_count_raises(self):
        from actionmesh_tpu.models.autoencoder import AutoencoderConfig
        from actionmesh_tpu.utils.weights import convert_autoencoder

        good = AutoencoderConfig(
            temporal_context_size=4, latent_channels=8, width=32,
            num_layers=2, num_attention_heads=2,
        )
        state = synth_autoencoder_state(good)
        import dataclasses

        # fewer layers than the checkpoint: blocks.2 keys become UNEXPECTED
        # only via the missing-final-block shift -> structural mismatch
        wrong = dataclasses.replace(good, num_layers=1)
        with pytest.raises((ValueError, KeyError)):
            convert_autoencoder(state, wrong, dtype=jnp.float32)

    def test_triposg_unknown_config_key_raises(self, tmp_path):
        from actionmesh_tpu.models.triposg.pipeline import TripoSGPipeline

        (tmp_path / "transformer").mkdir()
        (tmp_path / "transformer" / "config.json").write_text(
            '{"width": 64, "mystery_knob": 3}'
        )
        with pytest.raises(ValueError, match="mystery_knob"):
            TripoSGPipeline.from_pretrained(tmp_path)

    def test_triposg_meta_keys_are_ignored(self, tmp_path):
        """_class_name/_diffusers_version etc. must not trip the check; the
        load then proceeds to (and fails at) the missing weights files."""
        from actionmesh_tpu.models.triposg.pipeline import TripoSGPipeline

        (tmp_path / "transformer").mkdir()
        (tmp_path / "transformer" / "config.json").write_text(
            '{"_class_name": "TripoSGDiTModel", "_diffusers_version": "0.30",'
            ' "width": 64}'
        )
        with pytest.raises(FileNotFoundError):
            TripoSGPipeline.from_pretrained(tmp_path)


# ---------------------------------------------------------------------------
# Production-size dry-runs (slow)
# ---------------------------------------------------------------------------

@pytest.mark.slow
class TestProductionSizeDryruns:
    def test_denoiser_full_size_convert_and_forward(self):
        """21-layer width-2048 synthetic checkpoint -> convert -> forward."""
        from actionmesh_tpu.models.denoiser import (
            DenoiserConfig, denoiser_forward,
        )
        from actionmesh_tpu.utils.weights import convert_denoiser

        cfg = DenoiserConfig()  # production
        state = synth_denoiser_state(cfg)
        params = convert_denoiser(state, cfg, dtype=jnp.bfloat16)
        # dtype contract: matmul weights bf16, norms fp32
        assert params["blocks"][0]["s_attn"]["to_q"]["kernel"].dtype == jnp.bfloat16
        assert params["blocks"][0]["norm_s_attn"]["scale"].dtype == jnp.float32
        assert len(params["blocks"]) == 21

        B, T, N, S = 1, 2, 16, 5
        rng = np.random.default_rng(1)
        out = denoiser_forward(
            params, cfg,
            jnp.asarray(rng.normal(size=(B, T, N, cfg.in_channels)), jnp.bfloat16),
            jnp.asarray(
                rng.normal(size=(B, T, S, cfg.cross_attention_dim)), jnp.bfloat16
            ),
            jnp.asarray(np.arange(T, dtype=np.float32)[None]),
            jnp.asarray(np.full((B,), 400.0), jnp.bfloat16),
            mask=None, attn_impl="chunked",
        )
        assert out.shape == (B, T, N, cfg.in_channels)
        assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))

    def test_autoencoder_full_size_convert_and_forward(self):
        """16+1-layer width-1024 synthetic checkpoint with fp32 islands."""
        from actionmesh_tpu.models.autoencoder import (
            AutoencoderConfig, autoencoder_forward,
        )
        from actionmesh_tpu.utils.weights import convert_autoencoder

        cfg = AutoencoderConfig()  # production
        state = synth_autoencoder_state(cfg)
        params = convert_autoencoder(state, cfg, dtype=jnp.bfloat16)
        # fp32 island: final cross block + heads (temporal_autoencoder.py:240,266)
        assert params["blocks"][-1]["x_attn"]["to_q"]["kernel"].dtype == jnp.float32
        assert params["proj_out"]["kernel"].dtype == jnp.float32
        assert params["proj_query"]["kernel"].dtype == jnp.float32
        assert params["blocks"][0]["s_attn"]["to_q"]["kernel"].dtype == jnp.bfloat16

        B, T, N, V, T_out = 1, 2, 16, 33, 2
        rng = np.random.default_rng(2)
        disp = autoencoder_forward(
            params, cfg,
            jnp.asarray(rng.normal(size=(B, T, N, cfg.latent_channels)), jnp.bfloat16),
            jnp.asarray(np.arange(T, dtype=np.float32)[None]),
            jnp.zeros((B,), jnp.float32),
            jnp.asarray([[0.5, 1.0]], jnp.float32),
            jnp.asarray(rng.uniform(-1, 1, size=(B, V, 6)), jnp.float32),
            attn_impl="chunked", compute_dtype=jnp.bfloat16,
        )
        assert disp.shape == (B, T_out, V, cfg.out_dim)
        assert bool(jnp.all(jnp.isfinite(disp.astype(jnp.float32))))

    def test_dinov2_vitl_hf_state_dict_convert_and_forward(self):
        """ViT-L/14 at production size, state dict from HF transformers
        itself (a third-party oracle for the checkpoint names)."""
        transformers = pytest.importorskip("transformers")
        from actionmesh_tpu.models.dinov2 import DinoV2Config, dinov2_forward
        from actionmesh_tpu.utils.weights import convert_dinov2

        hf_cfg = transformers.Dinov2Config(
            hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
            intermediate_size=4096, patch_size=14, image_size=518,
            layerscale_value=1e-5,
        )
        torch.manual_seed(0)
        model = transformers.Dinov2Model(hf_cfg).eval()
        state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        cfg = DinoV2Config()  # production ViT-L
        params = convert_dinov2(state, cfg, dtype=jnp.bfloat16)
        assert len(params["blocks"]) == 24

        x = jnp.asarray(
            np.random.default_rng(3).normal(size=(1, 224, 224, 3)), jnp.float32
        )
        feats = dinov2_forward(params, cfg, x, attn_impl="chunked")
        assert feats.shape == (1, 257, 1024)  # 16x16 grid + cls
        assert bool(jnp.all(jnp.isfinite(feats.astype(jnp.float32))))

    def test_triposg_dit_full_size_convert_and_forward(self):
        from actionmesh_tpu.models.triposg.dit import (
            triposg_dit_config, triposg_dit_forward,
        )
        from actionmesh_tpu.utils.weights import convert_triposg_dit

        cfg = triposg_dit_config()  # production 21x2048
        state = synth_denoiser_state(cfg)
        params = convert_triposg_dit(state, cfg, dtype=jnp.bfloat16)
        rng = np.random.default_rng(4)
        out = triposg_dit_forward(
            params, cfg,
            jnp.asarray(rng.normal(size=(1, 16, cfg.in_channels)), jnp.bfloat16),
            jnp.asarray(
                rng.normal(size=(1, 5, cfg.cross_attention_dim)), jnp.bfloat16
            ),
            jnp.asarray([700.0], jnp.bfloat16),
            attn_impl="chunked",
        )
        assert out.shape == (1, 16, cfg.in_channels)
        assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))

    def test_triposg_vae_full_size_convert_and_decode(self):
        """Full-size VAE state dict from the torch transcription itself."""
        from tests.test_triposg_parity import RefVAE
        from actionmesh_tpu.models.triposg.vae import (
            TripoSGVAEConfig, decode_kv, query_sdf,
        )
        from actionmesh_tpu.utils.weights import convert_triposg_vae

        cfg = TripoSGVAEConfig()  # production: enc 8x512, dec 16x1024
        torch.manual_seed(5)
        ref = RefVAE(cfg).eval()
        state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = convert_triposg_vae(state, cfg, dtype=jnp.bfloat16)
        assert params["dec_proj_out"]["kernel"].dtype == jnp.float32

        rng = np.random.default_rng(6)
        latents = jnp.asarray(
            rng.normal(size=(1, 64, cfg.latent_channels)), jnp.float32
        )
        kv = decode_kv(params, cfg, latents, attn_impl="chunked")
        sdf = query_sdf(
            params, cfg, kv,
            jnp.asarray(rng.uniform(-1, 1, size=(1, 65, 3)), jnp.float32),
            attn_impl="chunked",
        )
        assert sdf.shape == (1, 65)
        assert bool(jnp.all(jnp.isfinite(sdf)))
