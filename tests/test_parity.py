"""Golden numeric parity vs torch/transformers reference implementations.

The reference's conditioning encoder is HF ``Dinov2Model`` and its attention
is torch SDPA (SURVEY.md §2). These tests instantiate small random torch
models, convert their weights through our safetensors->JAX path, and demand
numeric agreement — the same converter then validates the real checkpoints
when they are available.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


class TestAttentionParity:
    def test_sdpa_parity(self):
        """Our chunked attention vs torch F.scaled_dot_product_attention."""
        import jax.numpy as jnp

        from actionmesh_tpu.ops.attention import chunked_attention

        rng = np.random.default_rng(0)
        q = rng.normal(size=(2, 4, 33, 16)).astype(np.float32)
        k = rng.normal(size=(2, 4, 57, 16)).astype(np.float32)
        v = rng.normal(size=(2, 4, 57, 16)).astype(np.float32)
        ref = torch.nn.functional.scaled_dot_product_attention(
            torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v)
        ).numpy()
        ours = np.asarray(
            chunked_attention(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                q_chunk=16, k_chunk=16,
            )
        )
        np.testing.assert_allclose(ours, ref, atol=2e-5)

    def test_layer_norm_parity(self):
        from actionmesh_tpu.models.layers import layer_norm

        import jax.numpy as jnp

        rng = np.random.default_rng(1)
        x = rng.normal(size=(3, 7, 32)).astype(np.float32)
        w = rng.normal(size=(32,)).astype(np.float32)
        b = rng.normal(size=(32,)).astype(np.float32)
        ref = torch.nn.functional.layer_norm(
            torch.from_numpy(x), (32,), torch.from_numpy(w),
            torch.from_numpy(b), eps=1e-5,
        ).numpy()
        ours = np.asarray(
            layer_norm(
                {"scale": jnp.asarray(w), "bias": jnp.asarray(b)},
                jnp.asarray(x),
            )
        )
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_gelu_parity(self):
        from actionmesh_tpu.models.layers import gelu_exact

        import jax.numpy as jnp

        x = np.linspace(-4, 4, 101, dtype=np.float32)
        ref = torch.nn.functional.gelu(torch.from_numpy(x)).numpy()
        ours = np.asarray(gelu_exact(jnp.asarray(x)))
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_rms_norm_parity(self):
        """qk rms-norm matches torch RMSNorm semantics (fp32, eps inside)."""
        from actionmesh_tpu.models.layers import rms_norm

        import jax.numpy as jnp

        rng = np.random.default_rng(2)
        x = rng.normal(size=(2, 5, 16)).astype(np.float32)
        w = rng.normal(size=(16,)).astype(np.float32)
        ref = torch.nn.functional.rms_norm(
            torch.from_numpy(x), (16,), torch.from_numpy(w), eps=1e-6
        ).numpy()
        ours = np.asarray(
            rms_norm({"scale": jnp.asarray(w)}, jnp.asarray(x), eps=1e-6)
        )
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestDinoV2Parity:
    @pytest.mark.slow
    def test_forward_matches_transformers(self):
        """Full-model parity: HF Dinov2Model (random small) vs our JAX port."""
        transformers = pytest.importorskip("transformers")

        import jax.numpy as jnp

        from actionmesh_tpu.models.dinov2 import DinoV2Config, dinov2_forward
        from actionmesh_tpu.utils.weights import convert_dinov2

        # NB: HF Dinov2Config sizes its MLP via mlp_ratio (no
        # intermediate_size knob) — keep both configs on the same ratio or
        # the converter's architecture validation rejects the checkpoint.
        hf_cfg = transformers.Dinov2Config(
            hidden_size=32,
            num_hidden_layers=2,
            num_attention_heads=4,
            mlp_ratio=4,
            patch_size=14,
            image_size=70,
            layerscale_value=1e-2,
        )
        torch.manual_seed(0)
        model = transformers.Dinov2Model(hf_cfg).eval()

        state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        cfg = DinoV2Config(
            hidden_size=32, num_layers=2, num_heads=4, mlp_ratio=4,
            patch_size=14, image_size=70, layerscale_init=1e-2,
        )
        params = convert_dinov2(state, cfg, dtype=jnp.float32)

        rng = np.random.default_rng(3)
        pixels = rng.normal(size=(2, 70, 70, 3)).astype(np.float32)
        with torch.no_grad():
            ref = model(
                torch.from_numpy(pixels.transpose(0, 3, 1, 2))
            ).last_hidden_state.numpy()
        ours = np.asarray(
            dinov2_forward(params, cfg, jnp.asarray(pixels), attn_impl="naive")
        )
        assert ours.shape == ref.shape  # (2, 26, 32): 5x5 grid + cls
        np.testing.assert_allclose(ours, ref, atol=2e-4)


class TestPreprocessParity:
    def test_bit_image_processor_exact(self):
        """preprocess_for_dino matches HF BitImageProcessor bit-exactly."""
        transformers = pytest.importorskip("transformers")
        from PIL import Image

        from actionmesh_tpu.models.image_encoder import preprocess_for_dino

        proc = transformers.BitImageProcessor(
            do_resize=True, size={"shortest_edge": 256}, resample=3,
            do_center_crop=True, crop_size={"height": 224, "width": 224},
            do_rescale=True, rescale_factor=1 / 255,
            do_normalize=True,
            image_mean=[0.485, 0.456, 0.406],
            image_std=[0.229, 0.224, 0.225],
            do_convert_rgb=True,
        )
        rng = np.random.default_rng(0)
        img = Image.fromarray(
            rng.integers(0, 255, (300, 400, 3), dtype=np.uint8)
        )
        ref = proc.preprocess([img], return_tensors="np")["pixel_values"]
        ours = preprocess_for_dino([img])
        np.testing.assert_array_equal(ours.transpose(0, 3, 1, 2), ref)
