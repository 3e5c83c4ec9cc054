"""End-to-end Stage-I parity: torch reference transcription vs JAX port.

Builds a small torch denoiser transcribing the reference math exactly
(temporal_denoiser.py:151-249, block.py:110-153,
attention_processor.py:36-168, rotary_embedding.py:10-124, diffusers
Timesteps/TimestepEmbedding/FeedForward/FP32LayerNorm/RMSNorm semantics),
exports its state dict under the reference parameter names, converts it
through utils/weights.load_denoiser's mapping, and demands the JAX forward
agree. This validates the converter *and* the full block numerics in one
shot.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# Torch transcription of the reference denoiser (small config)
# ---------------------------------------------------------------------------

WIDTH = 32
HEADS = 2
LAYERS = 3  # skip on layer > 1 (num_layers//2 == 1)
IN_CH = 8
CROSS_DIM = 16
DIM_HEAD = WIDTH // HEADS


class RefRMSNorm(nn.Module):
    def __init__(self, dim, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(dim) * 0.1 + 1.0)
        self.eps = eps

    def forward(self, x):
        dt = x.dtype
        x = x.float()
        var = x.pow(2).mean(-1, keepdim=True)
        return (x * torch.rsqrt(var + self.eps) * self.weight).to(dt)


class RefFP32LayerNorm(nn.LayerNorm):
    def forward(self, x):
        return F.layer_norm(
            x.float(), self.normalized_shape, self.weight.float(),
            self.bias.float(), self.eps,
        ).to(x.dtype)


class RefAttention(nn.Module):
    """diffusers Attention + reference AttentionProcessor math."""

    def __init__(self, query_dim, cross_dim=None, qk_norm=True, bias=False):
        super().__init__()
        kv_dim = cross_dim if cross_dim is not None else query_dim
        self.to_q = nn.Linear(query_dim, query_dim, bias=bias)
        self.to_k = nn.Linear(kv_dim, query_dim, bias=bias)
        self.to_v = nn.Linear(kv_dim, query_dim, bias=bias)
        self.to_out = nn.ModuleList([nn.Linear(query_dim, query_dim)])
        self.norm_q = RefRMSNorm(DIM_HEAD) if qk_norm else None
        self.norm_k = RefRMSNorm(DIM_HEAD) if qk_norm else None

    def forward(self, x, context=None, freqs=None):
        kv = x if context is None else context
        B, S, _ = x.shape
        q = self.to_q(x).view(B, S, HEADS, DIM_HEAD).transpose(1, 2)
        k = self.to_k(kv).view(B, kv.shape[1], HEADS, DIM_HEAD).transpose(1, 2)
        v = self.to_v(kv).view(B, kv.shape[1], HEADS, DIM_HEAD).transpose(1, 2)
        if self.norm_q is not None:
            q = self.norm_q(q)
            k = self.norm_k(k)
        if freqs is not None:
            cos, sin = freqs
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
        out = F.scaled_dot_product_attention(q, k, v)
        out = out.transpose(1, 2).reshape(B, S, WIDTH)
        return self.to_out[0](out)


def apply_rope(x, cos, sin):
    # reference rotary_embedding.py:72-124 (cos/sin (B, S, D) -> [:, None])
    cos = cos[:, None]
    sin = sin[:, None]
    x_real, x_imag = x.reshape(*x.shape[:-1], -1, 2).unbind(-1)
    x_rot = torch.stack([-x_imag, x_real], dim=-1).flatten(3)
    return (x.float() * cos + x_rot.float() * sin).to(x.dtype)


def compute_rope(positions, dim=DIM_HEAD):
    inv = 1.0 / (10000.0 ** (torch.arange(0, dim, 2).float() / dim))
    ph = torch.outer(positions, inv)
    return (
        ph.cos().repeat_interleave(2, dim=1),
        ph.sin().repeat_interleave(2, dim=1),
    )


class RefBlock(nn.Module):
    def __init__(self, skip=False, qk_norm=True):
        super().__init__()
        self.norm_s_attn = RefFP32LayerNorm(WIDTH, eps=1e-5)
        self.s_attn = RefAttention(WIDTH, qk_norm=qk_norm)
        self.norm_x_attn = RefFP32LayerNorm(WIDTH, eps=1e-5)
        self.x_attn = RefAttention(WIDTH, cross_dim=CROSS_DIM, qk_norm=qk_norm)
        self.norm_ff = RefFP32LayerNorm(WIDTH, eps=1e-5)
        # diffusers FeedForward('gelu'): net.0 = GELU(proj), net.2 = Linear
        self.ff = nn.ModuleDict(
            {
                "net": nn.ModuleList(
                    [
                        nn.ModuleDict(
                            {"proj": nn.Linear(WIDTH, WIDTH * 2)}
                        ),
                        nn.Identity(),
                        nn.Linear(WIDTH * 2, WIDTH),
                    ]
                )
            }
        )
        self.has_skip = skip
        if skip:
            self.norm_skip = RefFP32LayerNorm(WIDTH, eps=1e-5)
            self.linear_skip = nn.Linear(2 * WIDTH, WIDTH)

    def forward(self, x, context, n_frames, freqs, skip=None):
        if self.has_skip:
            x = self.norm_skip(self.linear_skip(torch.cat([skip, x], -1)))
        # inflate: (B*T, N, D) -> (B, T*N, D)
        BT, N, D = x.shape
        B = BT // n_frames
        xi = x.reshape(B, n_frames * N, D)
        att = self.s_attn(self.norm_s_attn(xi), freqs=freqs)
        x = x + att.reshape(BT, N, D)
        x = x + self.x_attn(self.norm_x_attn(x), context=context)
        h = self.norm_ff(x)
        h = self.ff["net"][0]["proj"](h)
        h = F.gelu(h)
        return x + self.ff["net"][2](h)


class RefDenoiser(nn.Module):
    def __init__(self, qk_norm=True):
        super().__init__()
        self.time_proj = nn.ModuleDict(
            {
                "linear_1": nn.Linear(WIDTH, WIDTH * 4),
                "linear_2": nn.Linear(WIDTH * 4, WIDTH),
            }
        )
        self.proj_in = nn.Linear(IN_CH, WIDTH)
        self.blocks = nn.ModuleList(
            [
                RefBlock(skip=layer > LAYERS // 2, qk_norm=qk_norm)
                for layer in range(LAYERS)
            ]
        )
        self.norm_out = nn.LayerNorm(WIDTH)
        self.proj_out = nn.Linear(WIDTH, IN_CH)

    def time_embed(self, t):
        # diffusers Timesteps: flip_sin_to_cos=False, shift=0 -> [sin|cos]
        half = WIDTH // 2
        freqs = torch.exp(
            -math.log(10000.0) * torch.arange(half).float() / half
        )
        args = t[:, None].float() * freqs
        return torch.cat([args.sin(), args.cos()], dim=-1)

    def forward(self, hidden, context, framestep, diffusion_time, mask):
        B, T, N, _ = hidden.shape
        # centered framesteps -> rope (per frame, repeated for N+1 tokens)
        fs_rel = (framestep - framestep.min(dim=1, keepdim=True).values).reshape(-1)
        cos, sin = compute_rope(fs_rel)
        cos = cos[:, None, :].repeat(1, N + 1, 1).reshape(B, T * (N + 1), -1)
        sin = sin[:, None, :].repeat(1, N + 1, 1).reshape(B, T * (N + 1), -1)

        x = hidden.reshape(B * T, N, -1)
        x = self.proj_in(x)
        dt = diffusion_time.repeat_interleave(T)
        dt = dt * (1 - mask.reshape(-1))
        emb = self.time_embed(dt)
        emb = self.time_proj["linear_2"](F.gelu(self.time_proj["linear_1"](emb)))
        x = torch.cat([emb[:, None], x], dim=1)

        ctx = context.reshape(B * T, context.shape[2], -1)
        skips = []
        for layer, blk in enumerate(self.blocks):
            skip = None if layer <= LAYERS // 2 else skips.pop()
            x = blk(x, ctx, T, (cos, sin), skip=skip)
            if layer < LAYERS // 2:
                skips.append(x)
        x = self.norm_out(x)[:, -N:]
        x = self.proj_out(x)
        return x.reshape(B, T, N, -1)


def state_dict_with_reference_names(model: RefDenoiser) -> dict:
    """Rename the transcription's params to the reference checkpoint names."""
    out = {}
    for k, v in model.state_dict().items():
        k = k.replace("ff.net.0.proj", "ff.net.0.proj")  # already aligned
        out[k] = v.detach().numpy()
    return out


class TestDenoiserParity:
    def test_forward_matches_torch_transcription(self, tmp_path):
        import jax.numpy as jnp
        from safetensors.numpy import save_file

        from actionmesh_tpu.models.denoiser import (
            DenoiserConfig,
            denoiser_forward,
        )
        from actionmesh_tpu.utils.weights import load_denoiser

        torch.manual_seed(0)
        model = RefDenoiser().eval()
        state = state_dict_with_reference_names(model)
        save_file(state, str(tmp_path / "model.safetensors"))

        cfg = DenoiserConfig(
            num_tokens_nominal=8,
            temporal_context_size=4,
            in_channels=IN_CH,
            num_layers=LAYERS,
            num_attention_heads=HEADS,
            width=WIDTH,
            mlp_ratio=2.0,
            cross_attention_dim=CROSS_DIM,
            inflated_layers=tuple(range(LAYERS)),
            gelu_approx=False,  # exact erf to match the torch transcription
        )
        params = load_denoiser(tmp_path, cfg, dtype=jnp.float32)

        rng = np.random.default_rng(0)
        B, T, N, S = 1, 4, 8, 5
        hidden = rng.normal(size=(B, T, N, IN_CH)).astype(np.float32)
        context = rng.normal(size=(B, T, S, CROSS_DIM)).astype(np.float32)
        framestep = np.arange(T, dtype=np.float32)[None] + 3.0
        dt = np.full((B,), 500.0, np.float32)
        mask = np.array([[1.0, 0.0, 0.0, 0.0]], np.float32)

        with torch.no_grad():
            ref = model(
                torch.from_numpy(hidden),
                torch.from_numpy(context),
                torch.from_numpy(framestep),
                torch.from_numpy(dt),
                torch.from_numpy(mask),
            ).numpy()

        ours = np.asarray(
            denoiser_forward(
                params, cfg,
                jnp.asarray(hidden), jnp.asarray(context),
                jnp.asarray(framestep), jnp.asarray(dt),
                mask=jnp.asarray(mask), attn_impl="naive",
            )
        )
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=5e-4)
