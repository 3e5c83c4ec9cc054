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

    def test_guidance_free_sampling_equals_cfg_scale_one(self, tiny_pipeline):
        """The distilled serving path (guidance_scale=None: ONE conditional
        forward per Euler step) must integrate the same trajectory as the
        CFG path at scale 1.0, where uncond + 1*(cond - uncond) == cond —
        pinning that the no-CFG scan drops the batch pair without changing
        the velocity field it integrates."""
        from actionmesh_tpu.models.triposg.pipeline import _flow_sample
        from actionmesh_tpu.sampling.flow_schedule import get_schedule

        rng = np.random.default_rng(5)
        noise = jnp.asarray(rng.normal(size=(1, 16, 8)), jnp.float32)
        context = jnp.asarray(rng.normal(size=(1, 12, 16)), jnp.float32)
        ts, dist = get_schedule(4, 1000, 3.0)
        kw = dict(
            dit_cfg=tiny_pipeline.dit_cfg,
            init_noise=noise,
            context=context,
            timesteps=jnp.asarray(ts),
            distances=jnp.asarray(dist),
            attn_impl="naive",
        )
        free = _flow_sample(
            tiny_pipeline.dit_params, guidance_scale=None, **kw
        )
        cfg1 = _flow_sample(
            tiny_pipeline.dit_params, guidance_scale=1.0, **kw
        )
        np.testing.assert_allclose(
            np.asarray(free), np.asarray(cfg1), atol=1e-5, rtol=1e-5
        )
        # and the config knob maps 0 -> guidance-free in __call__
        img = Image.fromarray(np.zeros((64, 64, 3), np.uint8))
        latents, _ = tiny_pipeline(
            img, seed=3, num_inference_steps=2, guidance_scale=0.0,
            dense_octree_depth=4, hierarchical_octree_depth=5,
        )
        assert latents.shape == (1, 16, 8)
        assert np.isfinite(np.asarray(latents)).all()


class TestGridFastPath:
    """Single-dispatch device grid eval == chunked host-callback path.

    The fast path (query_sdf_grid_inside / query_sdf_at_ids) generates
    lattice points on device and returns signs/values in one transfer
    (BENCH_NOTES r3g); these tests pin it to the host path's results.
    """

    def _setup(self):
        from actionmesh_tpu.models.triposg.vae import (
            query_sdf_at_ids,
            query_sdf_grid_inside,
        )

        params = init_triposg_vae(jax.random.PRNGKey(0), TINY_VAE)
        latent = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 8))
        kv = decode_kv(params, TINY_VAE, latent, attn_impl="naive")
        return params, kv, query_sdf_grid_inside, query_sdf_at_ids

    def test_grid_inside_matches_host_values(self):
        params, kv, query_sdf_grid_inside, _ = self._setup()
        Rc = 9
        lo = np.array([-1.0, -1.0, -1.0])
        hi = np.array([1.0, 1.0, 1.0])
        step = (hi - lo) / (Rc - 1)
        inside = np.asarray(
            query_sdf_grid_inside(
                params, TINY_VAE, kv, jnp.asarray(lo), jnp.asarray(step),
                jnp.float32(0.0), Rc=Rc, chunk=128, attn_impl="naive",
            )
        )
        n = Rc**3
        assert inside.shape[0] >= n
        # host reference
        idx = np.arange(n)
        k = idx % Rc
        j = (idx // Rc) % Rc
        i = idx // (Rc * Rc)
        pts = np.stack([lo[0] + i * step[0], lo[1] + j * step[1],
                        lo[2] + k * step[2]], -1).astype(np.float32)
        vals = np.asarray(
            query_sdf(params, TINY_VAE, kv, jnp.asarray(pts)[None],
                      attn_impl="naive")
        )[0]
        np.testing.assert_array_equal(inside[:n], (vals < 0.0).astype(np.int8))

    def test_grid_inside_regularizer_applied(self):
        params, kv, query_sdf_grid_inside, _ = self._setup()
        from actionmesh_tpu.models.stage0 import (
            _dev_sdf_regularizer,
            _dev_sdf_regularizer_jax,
        )

        Rc = 5
        lo = np.array([-1.0, -1.0, -1.0])
        step = np.array([0.5, 0.5, 0.5])
        inside = np.asarray(
            query_sdf_grid_inside(
                params, TINY_VAE, kv, jnp.asarray(lo), jnp.asarray(step),
                jnp.float32(0.0), Rc=Rc, chunk=64, attn_impl="naive",
                regularizer=_dev_sdf_regularizer_jax,
            )
        )
        n = Rc**3
        idx = np.arange(n)
        k = idx % Rc
        j = (idx // Rc) % Rc
        i = idx // (Rc * Rc)
        pts = np.stack([lo[0] + i * step[0], lo[1] + j * step[1],
                        lo[2] + k * step[2]], -1).astype(np.float32)
        vals = np.asarray(
            query_sdf(params, TINY_VAE, kv, jnp.asarray(pts)[None],
                      attn_impl="naive")
        )[0]
        expect = (_dev_sdf_regularizer(pts, vals) < 0.0).astype(np.int8)
        np.testing.assert_array_equal(inside[:n], expect)

    def test_at_ids_matches_host_values(self):
        params, kv, _, query_sdf_at_ids = self._setup()
        rng = np.random.default_rng(3)
        m, chunk = 100, 64
        ijk = rng.integers(0, 17, (m, 3)).astype(np.int32)
        m_pad = -(-m // chunk) * chunk
        ijk_pad = np.zeros((m_pad, 3), np.int32)
        ijk_pad[:m] = ijk
        lo = np.array([-1.0, -1.0, -1.0])
        fine_step = np.array([0.125, 0.125, 0.125])
        vals_fast = np.asarray(
            query_sdf_at_ids(
                params, TINY_VAE, kv, jnp.asarray(ijk_pad), jnp.asarray(lo),
                jnp.asarray(fine_step), chunk=chunk, attn_impl="naive",
            )
        )[:m]
        pts = (lo + ijk * fine_step).astype(np.float32)
        vals_ref = np.asarray(
            query_sdf(params, TINY_VAE, kv, jnp.asarray(pts)[None],
                      attn_impl="naive")
        )[0]
        np.testing.assert_allclose(vals_fast, vals_ref, rtol=2e-5, atol=2e-5)

    def test_hierarchical_fast_path_matches_host_path(self):
        """End-to-end: extraction with device fast-path hooks == without."""
        from actionmesh_tpu.ops.isosurface import hierarchical_extract_geometry

        params, kv, query_sdf_grid_inside, query_sdf_at_ids = self._setup()

        def sdf_fn(pts):
            r = np.linalg.norm(pts, axis=-1)
            vals = np.asarray(
                query_sdf(params, TINY_VAE, kv, jnp.asarray(pts)[None],
                          attn_impl="naive")
            )[0]
            return (r - 0.6) + 0.1 * np.tanh(vals)

        def reg_jax(pts, vals):
            r = jnp.linalg.norm(pts, axis=-1)
            return (r - 0.6) + 0.1 * jnp.tanh(vals)

        def grid_inside_fn(lo, step, Rc, level):
            return np.asarray(
                query_sdf_grid_inside(
                    params, TINY_VAE, kv, jnp.asarray(lo), jnp.asarray(step),
                    jnp.float32(level), Rc=Rc, chunk=256, attn_impl="naive",
                    regularizer=reg_jax,
                )
            )

        kwargs = dict(
            bounds=(-1.0,) * 3 + (1.0,) * 3,
            dense_octree_depth=3, hierarchical_octree_depth=4,
            chunk=256,
        )
        v_ref, f_ref = hierarchical_extract_geometry(sdf_fn, **kwargs)

        def ids_val_with_reg(ijk, lo, fine_step):
            return np.asarray(
                query_sdf_at_ids(
                    params, TINY_VAE, kv, jnp.asarray(ijk), jnp.asarray(lo),
                    jnp.asarray(fine_step), chunk=256, attn_impl="naive",
                    regularizer=reg_jax,
                )
            )

        v_fast, f_fast = hierarchical_extract_geometry(
            sdf_fn, grid_inside_fn=grid_inside_fn,
            ids_val_fn=ids_val_with_reg, **kwargs,
        )
        assert f_ref.shape == f_fast.shape
        np.testing.assert_array_equal(f_ref, f_fast)
        np.testing.assert_allclose(v_ref, v_fast, atol=1e-5)


@pytest.mark.slow
class TestGeometryOracle:
    """Known-SDF roundtrip through the FULL VAE + extraction stack.

    The single torch-transcription parity test constrains the VAE only
    against the builder's own transcription; this oracle pins the stack
    against GEOMETRY instead: a tiny VAE is overfit to reproduce analytic
    SDFs (sphere and box) from their sampled surfaces, then the REAL
    ``decode_latents`` extraction path (hierarchical grid decode + native
    marching cubes, ref:external/triposg.py:153-205) must recover each
    shape — correct chamfer distance, volume, and latent-dependence (the
    sphere latent must not decode to the box). Any axis remap, grid
    scaling, iso-level, or kv-layout bug breaks these assertions even
    though SDF training itself would still converge.
    """

    R_SPHERE = 0.4
    BOX_HALF = np.array([0.55, 0.5, 0.45])

    @staticmethod
    def _sphere_sdf(p, r=0.4):
        return np.linalg.norm(p, axis=-1) - r

    @classmethod
    def _box_sdf(cls, p):
        q = np.abs(p) - cls.BOX_HALF
        outside = np.linalg.norm(np.maximum(q, 0.0), axis=-1)
        inside = np.minimum(np.max(q, axis=-1), 0.0)
        return outside + inside

    @classmethod
    def _surfaces(cls, rng, n):
        """(2, n, 6) sampled surfaces: sphere and box, points + normals."""
        d = rng.standard_normal((n, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        sphere = np.concatenate([cls.R_SPHERE * d, d], axis=1)

        # box: pick a face by area, uniform point on it
        h = cls.BOX_HALF
        areas = np.array([h[1] * h[2], h[0] * h[2], h[0] * h[1]])
        areas = areas / areas.sum()
        ax = rng.choice(3, size=n, p=areas)
        sign = rng.choice([-1.0, 1.0], size=n)
        pts = rng.uniform(-1, 1, (n, 3)) * h
        nrm = np.zeros((n, 3))
        for i in range(n):
            pts[i, ax[i]] = sign[i] * h[ax[i]]
            nrm[i, ax[i]] = sign[i]
        box = np.concatenate([pts, nrm], axis=1)
        return np.stack([sphere, box]).astype(np.float32)

    def _train_vae(self, steps=500):
        import optax

        cfg = TINY_VAE
        rng = np.random.default_rng(0)
        surf = jnp.asarray(self._surfaces(rng, 512))  # (2, 512, 6)

        # probes: uniform + near-surface band (what marching cubes reads)
        uni = rng.uniform(-1, 1, (2048, 3)).astype(np.float32)
        d = rng.standard_normal((2048, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        band_s = (self.R_SPHERE + rng.uniform(-0.12, 0.12, (2048, 1))) * d
        band_b = surf[1, rng.integers(0, 512, 2048), :3] + rng.uniform(
            -0.1, 0.1, (2048, 3)
        ).astype(np.float32)
        probes = np.stack([
            np.concatenate([uni, band_s.astype(np.float32)]),
            np.concatenate([uni, band_b]),
        ])  # (2, 4096, 3)
        gt = np.stack([
            self._sphere_sdf(probes[0]),
            self._box_sdf(probes[1]),
        ]).astype(np.float32)
        probes, gt = jnp.asarray(probes), jnp.asarray(gt)

        params = init_triposg_vae(jax.random.PRNGKey(3), cfg)
        opt = optax.adam(3e-3)
        opt_state = opt.init(params)

        def loss_fn(p):
            lat = encode_surface(p, cfg, surf, attn_impl="naive")
            kv = decode_kv(p, cfg, lat, attn_impl="naive")
            pred = query_sdf(p, cfg, kv, probes, attn_impl="naive")
            return jnp.mean((pred - gt) ** 2)

        @jax.jit
        def step(p, s):
            l, g = jax.value_and_grad(loss_fn)(p)
            up, s = opt.update(g, s)
            return optax.apply_updates(p, up), s, l

        l0 = None
        for i in range(steps):
            params, opt_state, l = step(params, opt_state)
            if l0 is None:
                l0 = float(l)
        assert float(l) < 0.1 * l0, f"SDF fit failed: {l0} -> {float(l)}"
        return cfg, params, surf

    def test_known_sdf_roundtrip_recovers_geometry(self):
        cfg, params, surf = self._train_vae()
        dit_cfg = triposg_dit_config(
            num_tokens=16, in_channels=8, num_layers=1, width=32,
            num_attention_heads=2, cross_attention_dim=16,
        )
        pipe = TripoSGPipeline(
            dit_params=None, vae_params=params,
            image_encoder=None, dit_cfg=dit_cfg, vae_cfg=cfg,
            dtype=jnp.float32, attn_impl="naive",
        )
        lat = pipe.encode_to_latent(surf, seed=None)  # (2, 16, 8)
        meshes = pipe.decode_latents(
            lat, dense_octree_depth=5, hierarchical_octree_depth=6
        )
        assert len(meshes) == 2

        def signed_volume(m):
            v, f = m.vertices, m.faces
            tri = v[f]
            return float(
                np.einsum("ij,ij->i", tri[:, 0],
                          np.cross(tri[:, 1], tri[:, 2])).sum() / 6.0
            )

        sphere_mesh, box_mesh = meshes
        assert sphere_mesh.n_faces > 50 and box_mesh.n_faces > 50

        # chamfer-style residual: mean |analytic sdf| at recovered vertices
        res_sphere = float(np.abs(self._sphere_sdf(sphere_mesh.vertices)).mean())
        res_box = float(np.abs(self._box_sdf(box_mesh.vertices)).mean())
        assert res_sphere < 0.05, res_sphere
        assert res_box < 0.07, res_box

        # volumes (orientation included: positive = outward MC winding)
        v_sphere = signed_volume(sphere_mesh)
        v_box = signed_volume(box_mesh)
        gt_sphere = 4.0 / 3.0 * np.pi * self.R_SPHERE**3
        gt_box = float(np.prod(2 * self.BOX_HALF))
        assert abs(v_sphere - gt_sphere) / gt_sphere < 0.25, (v_sphere, gt_sphere)
        assert abs(v_box - gt_box) / gt_box < 0.25, (v_box, gt_box)

        # latent-dependence: each mesh must fit its OWN analytic surface
        # better than the other latent's surface (distinct shapes: sphere
        # r=0.4 vs box corners at |p|~0.87)
        sphere_vs_box = float(np.abs(self._box_sdf(sphere_mesh.vertices)).mean())
        box_vs_sphere = float(np.abs(self._sphere_sdf(box_mesh.vertices)).mean())
        assert res_sphere < 0.7 * sphere_vs_box, (res_sphere, sphere_vs_box)
        assert res_box < 0.7 * box_vs_sphere, (res_box, box_vs_sphere)


class TestBF16CoarseDecode:
    """bf16 coarse sign pass: any sign disagreement vs fp32 is confined to
    the near-zero band of the field (which the fp32 fine pass re-evaluates;
    the reference runs its whole decode in fp16)."""

    def _setup(self):
        from actionmesh_tpu.models.triposg.vae import query_sdf_grid_inside

        params = init_triposg_vae(jax.random.PRNGKey(0), TINY_VAE)
        latent = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 8))
        kv = decode_kv(params, TINY_VAE, latent, attn_impl="naive")
        return params, kv, query_sdf_grid_inside

    def test_bf16_sign_flips_only_near_surface(self):
        params, kv, query_sdf_grid_inside = self._setup()
        Rc = 9
        lo = np.array([-1.0, -1.0, -1.0])
        step = np.array([0.25, 0.25, 0.25])
        masks = {}
        for cd in (None, jnp.bfloat16):
            masks[cd] = np.asarray(
                query_sdf_grid_inside(
                    params, TINY_VAE, kv, jnp.asarray(lo), jnp.asarray(step),
                    jnp.float32(0.0), Rc=Rc, chunk=128, attn_impl="naive",
                    compute_dtype=cd,
                )
            )[: Rc**3]
        mismatch = masks[None] != masks[jnp.bfloat16]
        # fp32 values at every lattice point
        idx = np.arange(Rc**3)
        k = idx % Rc
        j = (idx // Rc) % Rc
        i = idx // (Rc * Rc)
        pts = np.stack(
            [lo[0] + i * step[0], lo[1] + j * step[1], lo[2] + k * step[2]], -1
        ).astype(np.float32)
        vals = np.asarray(
            query_sdf(params, TINY_VAE, kv, jnp.asarray(pts)[None],
                      attn_impl="naive")
        )[0]
        scale = np.abs(vals).std()
        assert mismatch.mean() < 0.05
        if mismatch.any():
            # every flipped sign sits in the near-zero band
            assert np.abs(vals[mismatch]).max() < 0.05 * scale

    def test_decode_latents_with_speed_knobs_extracts(self):
        """decode_latents accepts prefilter + bf16 knobs end-to-end and
        produces a finite mesh close to the default path."""
        from actionmesh_tpu.models.triposg.pipeline import TripoSGPipeline

        pipe = TripoSGPipeline.from_random(
            seed=0, dtype=jnp.float32,
            dit_cfg=triposg_dit_config(
                num_tokens=16, in_channels=8, num_layers=2, width=32,
                num_attention_heads=2, cross_attention_dim=16,
            ),
            vae_cfg=TINY_VAE, attn_impl="naive",
        )
        # smooth dev-style field so the random-weight isosurface is sane
        import jax.numpy as _jnp

        pipe.sdf_regularizer = lambda p, v: (
            np.linalg.norm(p, axis=-1) - 0.6
        ) + 0.1 * np.tanh(v)
        pipe.sdf_regularizer_jax = lambda p, v: (
            _jnp.linalg.norm(p, axis=-1) - 0.6
        ) + 0.1 * jnp.tanh(v)
        latents = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 8))
        ref = pipe.decode_latents(
            latents, dense_octree_depth=4, hierarchical_octree_depth=5
        )[0]
        fast = pipe.decode_latents(
            latents, dense_octree_depth=4, hierarchical_octree_depth=5,
            prefilter_octree_depth=3, coarse_decode_dtype="bfloat16",
        )[0]
        assert len(fast.faces) > 50
        assert np.isfinite(fast.vertices).all()
        # same surface up to the bf16 near-zero band: radii match closely
        r_ref = np.linalg.norm(ref.vertices, axis=1).mean()
        r_fast = np.linalg.norm(fast.vertices, axis=1).mean()
        assert abs(r_ref - r_fast) < 0.01
