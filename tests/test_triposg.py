"""TripoSG backend tests (tiny configs, random weights, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from actionmesh_tpu.models.dinov2 import DinoV2Config
from actionmesh_tpu.models.image_encoder import ImageEncoder
from actionmesh_tpu.models.triposg.dit import triposg_dit_config
from actionmesh_tpu.models.triposg.pipeline import TripoSGPipeline
from actionmesh_tpu.models.triposg.vae import (
    TripoSGVAEConfig,
    decode_kv,
    encode_surface,
    init_triposg_vae,
    query_sdf,
)

TINY_VAE = TripoSGVAEConfig(
    latent_channels=8,
    num_tokens=16,
    encoder_width=32,
    encoder_layers=2,
    encoder_heads=2,
    decoder_width=32,
    decoder_layers=2,
    decoder_heads=2,
)


class TestVAE:
    def test_encode_decode_shapes(self):
        params = init_triposg_vae(jax.random.PRNGKey(0), TINY_VAE)
        surface = jax.random.uniform(
            jax.random.PRNGKey(1), (1, 128, 6), minval=-1, maxval=1
        )
        latent = encode_surface(
            params, TINY_VAE, surface, attn_impl="naive"
        )
        assert latent.shape == (1, 16, 8)
        kv = decode_kv(params, TINY_VAE, latent, attn_impl="naive")
        assert kv.shape == (1, 16, 32)
        pts = jax.random.uniform(
            jax.random.PRNGKey(2), (1, 64, 3), minval=-1, maxval=1
        )
        sdf = query_sdf(params, TINY_VAE, kv, pts, attn_impl="naive")
        assert sdf.shape == (1, 64)
        assert bool(jnp.all(jnp.isfinite(sdf)))

    def test_posterior_sampling_stochastic_vs_mean(self):
        params = init_triposg_vae(jax.random.PRNGKey(0), TINY_VAE)
        surface = jax.random.uniform(
            jax.random.PRNGKey(1), (1, 128, 6), minval=-1, maxval=1
        )
        mean = encode_surface(params, TINY_VAE, surface, attn_impl="naive")
        s1 = encode_surface(
            params, TINY_VAE, surface,
            noise_key=jax.random.PRNGKey(5), attn_impl="naive",
        )
        s2 = encode_surface(
            params, TINY_VAE, surface,
            noise_key=jax.random.PRNGKey(6), attn_impl="naive",
        )
        assert not np.allclose(np.asarray(s1), np.asarray(s2))
        assert not np.allclose(np.asarray(s1), np.asarray(mean))


@pytest.fixture(scope="module")
def tiny_pipeline():
    dit_cfg = triposg_dit_config(
        num_tokens=16, in_channels=8, num_layers=2, width=32,
        num_attention_heads=2, cross_attention_dim=16,
    )
    encoder = ImageEncoder(
        weights_dir=None,
        dtype=jnp.float32,
        config=DinoV2Config(
            hidden_size=16, num_layers=1, num_heads=2, patch_size=14,
            image_size=70,
        ),
    )
    return TripoSGPipeline.from_random(
        seed=0, dtype=jnp.float32,
        dit_cfg=dit_cfg, vae_cfg=TINY_VAE,
        image_encoder=encoder, attn_impl="naive",
    )


class TestPipeline:
    def test_image_to_mesh(self, tiny_pipeline):
        img = Image.fromarray(
            (np.random.default_rng(0).random((64, 64, 3)) * 255).astype(np.uint8)
        )
        latents, mesh = tiny_pipeline(
            img, seed=3, num_inference_steps=2,
            dense_octree_depth=4, hierarchical_octree_depth=5,
        )
        assert latents.shape == (1, 16, 8)
        # random-weight SDF field may or may not cross zero; mesh must be
        # structurally valid either way
        assert mesh.vertices.shape[1] == 3 and mesh.faces.shape[1] == 3
        if mesh.n_faces:
            assert np.isfinite(mesh.vertices).all()
            assert mesh.faces.max() < mesh.n_vertices

    def test_encode_to_latent_contract(self, tiny_pipeline):
        surface = np.random.default_rng(1).uniform(-1, 1, (1, 256, 6))
        latent = tiny_pipeline.encode_to_latent(surface, seed=7)
        assert latent.shape == (1, 16, 8)
        assert latent.dtype == jnp.float32
