"""TripoSG VAE golden parity: torch transcription vs JAX port.

Same pattern as tests/test_denoiser_parity.py: build a small torch VAE
whose state dict uses the exact parameter names convert_triposg_vae
expects (the documented checkpoint schema), convert it through the
weights mapping, and demand the JAX encode/decode forwards agree. This
validates the converter and the VAE block numerics; the *architecture*
itself remains a documented best-effort reconstruction (the upstream
TripoSG source is an empty submodule in the reference snapshot).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from actionmesh_tpu.models.triposg.vae import (
    TripoSGVAEConfig,
    decode_kv,
    encode_surface,
    query_sdf,
)
from actionmesh_tpu.ops.fps import farthest_point_sampling
from actionmesh_tpu.utils.weights import convert_triposg_vae

CFG = TripoSGVAEConfig(
    latent_channels=4,
    num_tokens=8,
    embed_frequency=2,
    encoder_width=32,
    encoder_layers=2,
    encoder_heads=2,
    decoder_width=32,
    decoder_layers=2,
    decoder_heads=2,
)


def freq_embed(x: torch.Tensor, num_freqs: int) -> torch.Tensor:
    freqs = torch.tensor(
        [2.0 ** i for i in range(num_freqs)], dtype=torch.float32
    )
    emb = (x[..., None] * freqs).reshape(*x.shape[:-1], x.shape[-1] * num_freqs)
    return torch.cat([x, emb.sin(), emb.cos()], dim=-1)


class RefFP32LayerNorm(nn.LayerNorm):
    def forward(self, x):
        return F.layer_norm(
            x.float(), self.normalized_shape, self.weight.float(),
            self.bias.float(), self.eps,
        ).to(x.dtype)


class RefAttention(nn.Module):
    """No qk-norm, no bias (the VAE's attention flavor)."""

    def __init__(self, dim, heads, cross_norm=False):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(dim, dim, bias=False)
        self.to_k = nn.Linear(dim, dim, bias=False)
        self.to_v = nn.Linear(dim, dim, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim, bias=False)])
        if cross_norm:
            self.norm_cross = RefFP32LayerNorm(dim)

    def forward(self, x, kv=None):
        kv_src = x if kv is None else kv
        if kv is not None and hasattr(self, "norm_cross"):
            kv_src = self.norm_cross(kv_src)
        B, S, D = x.shape
        h, dh = self.heads, D // self.heads
        q = self.to_q(x).view(B, S, h, dh).transpose(1, 2)
        k = self.to_k(kv_src).view(B, -1, h, dh).transpose(1, 2)
        v = self.to_v(kv_src).view(B, -1, h, dh).transpose(1, 2)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(B, S, D)
        return self.to_out[0](o)


class RefFeedForward(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.net = nn.ModuleDict(
            {
                "0": nn.ModuleDict({"proj": nn.Linear(dim, 4 * dim)}),
                "2": nn.Linear(4 * dim, dim),
            }
        )

    def forward(self, x):
        return self.net["2"](F.gelu(self.net["0"]["proj"](x)))


class RefBlock(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm_s_attn = RefFP32LayerNorm(dim)
        self.s_attn = RefAttention(dim, heads)
        self.norm_ff = RefFP32LayerNorm(dim)
        self.ff = RefFeedForward(dim)

    def forward(self, x):
        x = x + self.s_attn(self.norm_s_attn(x))
        return x + self.ff(self.norm_ff(x))


class RefEncoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.proj_in = nn.Linear(cfg.point_feat_dim, cfg.encoder_width)
        self.cross_attn = nn.ModuleDict(
            {
                "attn": RefAttention(cfg.encoder_width, cfg.encoder_heads),
                "norm": RefFP32LayerNorm(cfg.encoder_width),
            }
        )
        self.blocks = nn.ModuleList(
            [RefBlock(cfg.encoder_width, cfg.encoder_heads)
             for _ in range(cfg.encoder_layers)]
        )
        self.norm_out = RefFP32LayerNorm(cfg.encoder_width)
        self.proj_out = nn.Linear(cfg.encoder_width, 2 * cfg.latent_channels)


class RefDecoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        qdim = cfg.point_feat_dim - cfg.extra_channels
        self.blocks = nn.ModuleList(
            [RefBlock(cfg.decoder_width, cfg.decoder_heads)
             for _ in range(cfg.decoder_layers)]
        )
        self.proj_query = nn.Linear(qdim, cfg.decoder_width)
        self.cross_attn = nn.ModuleDict(
            {
                "attn": RefAttention(
                    cfg.decoder_width, cfg.decoder_heads, cross_norm=True
                ),
                "norm": RefFP32LayerNorm(cfg.decoder_width),
            }
        )
        self.norm_out = RefFP32LayerNorm(cfg.decoder_width)
        self.proj_out = nn.Linear(cfg.decoder_width, 1)


class RefVAE(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.encoder = RefEncoder(cfg)
        self.post_quant = nn.Linear(cfg.latent_channels, cfg.decoder_width)
        self.decoder = RefDecoder(cfg)

    def encode_mean(self, surface, fps_idx):
        """surface (B, N, 6); fps_idx (B, K) externally computed FPS order."""
        xyz = surface[..., :3]
        feats = torch.cat(
            [freq_embed(xyz, CFG.embed_frequency), surface[..., 3:]], dim=-1
        )
        feats = self.encoder.proj_in(feats)
        queries = torch.take_along_dim(feats, fps_idx[..., None], dim=1)
        x = queries + self.encoder.cross_attn["attn"](
            self.encoder.cross_attn["norm"](queries), kv=feats
        )
        for b in self.encoder.blocks:
            x = b(x)
        moments = self.encoder.proj_out(self.encoder.norm_out(x))
        return moments[..., : CFG.latent_channels]

    def decode_query(self, latents, points):
        x = self.post_quant(latents)
        for b in self.decoder.blocks:
            x = b(x)
        q = self.decoder.proj_query(freq_embed(points, CFG.embed_frequency))
        h = q + self.decoder.cross_attn["attn"](
            self.decoder.cross_attn["norm"](q), kv=x
        )
        return self.decoder.proj_out(self.decoder.norm_out(h))[..., 0]


class TestTripoSGVAEParity:
    def test_encode_decode_match_torch_transcription(self):
        torch.manual_seed(0)
        ref = RefVAE(CFG).eval()
        # non-trivial layer-norm params
        for m in ref.modules():
            if isinstance(m, nn.LayerNorm):
                with torch.no_grad():
                    m.weight.add_(torch.randn_like(m.weight) * 0.1)
                    m.bias.add_(torch.randn_like(m.bias) * 0.1)

        state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = convert_triposg_vae(state, CFG, dtype=jnp.float32)

        rng = np.random.default_rng(1)
        B, N = 1, 32
        surface = rng.normal(size=(B, N, 6)).astype(np.float32)
        surface[..., :3] = np.clip(surface[..., :3] * 0.4, -1, 1)

        # FPS order computed once (JAX) and shared with the torch side
        _, idx = farthest_point_sampling(
            jnp.asarray(surface[..., :3]), CFG.num_tokens, key=None
        )

        lat_jax = np.asarray(
            encode_surface(
                params, CFG, jnp.asarray(surface), attn_impl="naive"
            )
        )
        with torch.no_grad():
            lat_ref = ref.encode_mean(
                torch.from_numpy(surface), torch.from_numpy(np.asarray(idx)).long()
            ).numpy()
        np.testing.assert_allclose(lat_jax, lat_ref, rtol=2e-4, atol=2e-5)

        latents = rng.normal(size=(B, CFG.num_tokens, CFG.latent_channels))
        points = rng.uniform(-1, 1, size=(B, 17, 3)).astype(np.float32)
        kv = decode_kv(params, CFG, jnp.asarray(latents, jnp.float32),
                       attn_impl="naive")
        sdf_jax = np.asarray(
            query_sdf(params, CFG, kv, jnp.asarray(points), attn_impl="naive")
        )
        with torch.no_grad():
            sdf_ref = ref.decode_query(
                torch.from_numpy(latents.astype(np.float32)),
                torch.from_numpy(points),
            ).numpy()
        np.testing.assert_allclose(sdf_jax, sdf_ref, rtol=2e-4, atol=2e-5)
