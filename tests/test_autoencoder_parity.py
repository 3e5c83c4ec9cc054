"""End-to-end Stage-II parity: torch reference transcription vs JAX port.

Transcribes the reference autoencoder math exactly
(temporal_autoencoder.py:163-269: post_quant -> merged latent+alpha tokens
with RoPE -> per-target KV stack -> fp32 vertex cross-attention with
layer-norm on encoder states -> sign flip -> 2*sigmoid-1), exports under
reference state-dict names, converts via load_autoencoder, compares.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

from tests.test_denoiser_parity import (
    RefFP32LayerNorm,
    apply_rope,
    compute_rope,
)

WIDTH = 32
HEADS = 2
LAYERS = 2
LATENT = 8
DIM_HEAD = WIDTH // HEADS
FREQS = 8
QUERY_DIM = 3 * (FREQS * 2 + 1) + 3  # 54 scaled to small dims? keep 54


class RefSelfBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.norm_s_attn = RefFP32LayerNorm(WIDTH, eps=1e-5)
        self.s_attn_to_q = nn.Linear(WIDTH, WIDTH, bias=False)
        self.s_attn_to_k = nn.Linear(WIDTH, WIDTH, bias=False)
        self.s_attn_to_v = nn.Linear(WIDTH, WIDTH, bias=False)
        self.s_attn_to_out = nn.Linear(WIDTH, WIDTH)
        self.norm_ff = RefFP32LayerNorm(WIDTH, eps=1e-5)
        self.ff_0 = nn.Linear(WIDTH, WIDTH * 4)
        self.ff_2 = nn.Linear(WIDTH * 4, WIDTH)

    def forward(self, x, freqs):
        h = self.norm_s_attn(x)
        B, S, _ = h.shape
        q = self.s_attn_to_q(h).view(B, S, HEADS, DIM_HEAD).transpose(1, 2)
        k = self.s_attn_to_k(h).view(B, S, HEADS, DIM_HEAD).transpose(1, 2)
        v = self.s_attn_to_v(h).view(B, S, HEADS, DIM_HEAD).transpose(1, 2)
        q = apply_rope(q, *freqs)
        k = apply_rope(k, *freqs)
        att = F.scaled_dot_product_attention(q, k, v)
        x = x + self.s_attn_to_out(att.transpose(1, 2).reshape(B, S, WIDTH))
        x = x + self.ff_2(F.gelu(self.ff_0(self.norm_ff(x))))
        return x


class RefCrossBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.norm_x_attn = RefFP32LayerNorm(WIDTH, eps=1e-5)
        self.norm_cross = nn.LayerNorm(WIDTH)  # cross_attention_norm
        self.to_q = nn.Linear(WIDTH, WIDTH, bias=False)
        self.to_k = nn.Linear(WIDTH, WIDTH, bias=False)
        self.to_v = nn.Linear(WIDTH, WIDTH, bias=False)
        self.to_out = nn.Linear(WIDTH, WIDTH)
        self.norm_ff = RefFP32LayerNorm(WIDTH, eps=1e-5)
        self.ff_0 = nn.Linear(WIDTH, WIDTH * 4)
        self.ff_2 = nn.Linear(WIDTH * 4, WIDTH)

    def forward(self, queries, kv):
        h = self.norm_x_attn(queries)
        kvn = self.norm_cross(kv)
        B, V, _ = h.shape
        q = self.to_q(h).view(B, V, HEADS, DIM_HEAD).transpose(1, 2)
        k = self.to_k(kvn).view(B, kv.shape[1], HEADS, DIM_HEAD).transpose(1, 2)
        vv = self.to_v(kvn).view(B, kv.shape[1], HEADS, DIM_HEAD).transpose(1, 2)
        att = F.scaled_dot_product_attention(q, k, vv)
        x = queries + self.to_out(att.transpose(1, 2).reshape(B, V, WIDTH))
        x = x + self.ff_2(F.gelu(self.ff_0(self.norm_ff(x))))
        return x


class RefAutoencoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.post_quant = nn.Linear(LATENT, WIDTH)
        self.self_blocks = nn.ModuleList([RefSelfBlock() for _ in range(LAYERS)])
        self.cross_block = RefCrossBlock()
        self.proj_query = nn.Linear(QUERY_DIM, WIDTH)
        self.norm_out = nn.LayerNorm(WIDTH)
        self.proj_out = nn.Linear(WIDTH, 3)

    def timestep_embed(self, *ts):
        half = (WIDTH // 2) // 2
        freqs = torch.exp(
            -math.log(10000.0) * torch.arange(half).float() / half
        )
        outs = []
        for t in ts:
            args = t[..., None].float() * freqs
            outs.append(torch.cat([args.cos(), args.sin()], dim=-1))
        return torch.cat(outs, dim=-1)

    def embed_query(self, q):
        xyz = q[..., :3]
        f = 2.0 ** torch.arange(FREQS).float()
        emb = (xyz[..., None] * f).reshape(*xyz.shape[:-1], -1)
        return torch.cat([xyz, emb.sin(), emb.cos(), q[..., 3:]], dim=-1)

    def forward(self, latent, framestep, source_alpha, target_alphas, query):
        B, T, N, _ = latent.shape
        T_out = target_alphas.shape[1]
        fs_rel = (
            framestep - framestep.min(dim=1, keepdim=True).values
        ).reshape(-1)
        cos, sin = compute_rope(fs_rel, dim=DIM_HEAD)
        cos = cos.reshape(B, T, -1)
        sin = sin.reshape(B, T, -1)
        cos = torch.cat([cos.repeat_interleave(N, dim=1), cos], dim=1)
        sin = torch.cat([sin.repeat_interleave(N, dim=1), sin], dim=1)

        latent_proj = self.post_quant(latent).reshape(B, T * N, WIDTH)
        src = source_alpha[:, None].expand_as(target_alphas)
        alpha = self.timestep_embed(src, target_alphas)[:, None].repeat(1, T, 1, 1)

        q_embed = self.embed_query(query)
        queries = self.proj_query(q_embed)

        outs = []
        for i in range(T_out):
            x = torch.cat([latent_proj, alpha[:, :, i]], dim=1)
            for blk in self.self_blocks:
                x = blk(x, (cos, sin))
            logits = self.cross_block(queries, x)
            logits = self.proj_out(self.norm_out(logits)) * -1
            outs.append(logits)
        disp = torch.stack(outs, dim=1)
        return 2 * torch.sigmoid(disp) - 1.0


def reference_state_dict(model: RefAutoencoder) -> dict:
    """Emit the reference checkpoint parameter names."""
    out = {}
    sd = model.state_dict()
    for i in range(LAYERS):
        p = f"self_blocks.{i}."
        r = f"blocks.{i}."
        out[r + "norm_s_attn.weight"] = sd[p + "norm_s_attn.weight"]
        out[r + "norm_s_attn.bias"] = sd[p + "norm_s_attn.bias"]
        for n in ("q", "k", "v"):
            out[r + f"s_attn.to_{n}.weight"] = sd[p + f"s_attn_to_{n}.weight"]
        out[r + "s_attn.to_out.0.weight"] = sd[p + "s_attn_to_out.weight"]
        out[r + "s_attn.to_out.0.bias"] = sd[p + "s_attn_to_out.bias"]
        out[r + "norm_ff.weight"] = sd[p + "norm_ff.weight"]
        out[r + "norm_ff.bias"] = sd[p + "norm_ff.bias"]
        out[r + "ff.net.0.proj.weight"] = sd[p + "ff_0.weight"]
        out[r + "ff.net.0.proj.bias"] = sd[p + "ff_0.bias"]
        out[r + "ff.net.2.weight"] = sd[p + "ff_2.weight"]
        out[r + "ff.net.2.bias"] = sd[p + "ff_2.bias"]
    p, r = "cross_block.", f"blocks.{LAYERS}."
    out[r + "norm_x_attn.weight"] = sd[p + "norm_x_attn.weight"]
    out[r + "norm_x_attn.bias"] = sd[p + "norm_x_attn.bias"]
    out[r + "x_attn.norm_cross.weight"] = sd[p + "norm_cross.weight"]
    out[r + "x_attn.norm_cross.bias"] = sd[p + "norm_cross.bias"]
    for n in ("q", "k", "v"):
        out[r + f"x_attn.to_{n}.weight"] = sd[p + f"to_{n}.weight"]
    out[r + "x_attn.to_out.0.weight"] = sd[p + "to_out.weight"]
    out[r + "x_attn.to_out.0.bias"] = sd[p + "to_out.bias"]
    out[r + "norm_ff.weight"] = sd[p + "norm_ff.weight"]
    out[r + "norm_ff.bias"] = sd[p + "norm_ff.bias"]
    out[r + "ff.net.0.proj.weight"] = sd[p + "ff_0.weight"]
    out[r + "ff.net.0.proj.bias"] = sd[p + "ff_0.bias"]
    out[r + "ff.net.2.weight"] = sd[p + "ff_2.weight"]
    out[r + "ff.net.2.bias"] = sd[p + "ff_2.bias"]
    for name in ("post_quant", "proj_query", "norm_out", "proj_out"):
        out[name + ".weight"] = sd[name + ".weight"]
        out[name + ".bias"] = sd[name + ".bias"]
    return {k: v.detach().numpy() for k, v in out.items()}


class TestAutoencoderParity:
    def test_forward_matches_torch_transcription(self, tmp_path):
        import jax.numpy as jnp
        from safetensors.numpy import save_file

        from actionmesh_tpu.models.autoencoder import (
            AutoencoderConfig,
            autoencoder_forward,
        )
        from actionmesh_tpu.utils.weights import load_autoencoder

        torch.manual_seed(1)
        model = RefAutoencoder().eval()
        save_file(reference_state_dict(model), str(tmp_path / "model.safetensors"))

        cfg = AutoencoderConfig(
            temporal_context_size=4,
            latent_channels=LATENT,
            width=WIDTH,
            num_layers=LAYERS,
            num_attention_heads=HEADS,
            embed_frequency=FREQS,
            gelu_approx=False,  # exact erf to match the torch transcription
        )
        params = load_autoencoder(tmp_path, cfg, dtype=jnp.float32)

        rng = np.random.default_rng(2)
        B, T, N, V, T_out = 1, 4, 8, 13, 3
        latent = rng.normal(size=(B, T, N, LATENT)).astype(np.float32)
        framestep = np.arange(T, dtype=np.float32)[None] + 2.0
        source_alpha = np.zeros((B,), np.float32)
        target_alphas = np.array([[1 / 3, 2 / 3, 1.0]], np.float32)
        query = rng.uniform(-1, 1, size=(B, V, 6)).astype(np.float32)

        with torch.no_grad():
            ref = model(
                torch.from_numpy(latent),
                torch.from_numpy(framestep),
                torch.from_numpy(source_alpha),
                torch.from_numpy(target_alphas),
                torch.from_numpy(query),
            ).numpy()

        ours = np.asarray(
            autoencoder_forward(
                params, cfg,
                jnp.asarray(latent), jnp.asarray(framestep),
                jnp.asarray(source_alpha), jnp.asarray(target_alphas),
                jnp.asarray(query), attn_impl="naive",
            )
        )
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=5e-4)
