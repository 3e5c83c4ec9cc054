"""End-to-end pipeline test: video -> 4D on a tiny model (CPU, stub stage 0)."""

import numpy as np
import pytest
from PIL import Image

from actionmesh_tpu.io.video_input import ActionMeshInput
from actionmesh_tpu.models.dinov2 import DinoV2Config
from actionmesh_tpu.models.image_encoder import ImageEncoder
from actionmesh_tpu.pipeline import ActionMeshPipeline

TINY_UPDATES = {
    "temporal_3D_denoiser.num_tokens_nominal": 16,
    "temporal_3D_denoiser.width": 64,
    "temporal_3D_denoiser.num_layers": 3,
    "temporal_3D_denoiser.num_attention_heads": 2,
    "temporal_3D_denoiser.in_channels": 8,
    "temporal_3D_denoiser.cross_attention_dim": 32,
    "temporal_3D_denoiser.inflated_layers": [0, 1, 2],
    "temporal_3D_denoiser.temporal_context_size": 16,
    "temporal_3D_vae.latent_channels": 8,
    "temporal_3D_vae.width": 64,
    "temporal_3D_vae.num_layers": 2,
    "temporal_3D_vae.num_attention_heads": 2,
    "scheduler.num_inference_steps": 2,
    "attn_impl": "chunked",
    "compute_dtype": "float32",
}

TINY_DINO = DinoV2Config(
    hidden_size=32, num_layers=2, num_heads=2, patch_size=14, image_size=70
)


def make_frames(n=16, size=64, seed=0):
    rng = np.random.default_rng(seed)
    frames = []
    for i in range(n):
        rgba = np.zeros((size, size, 4), dtype=np.uint8)
        # a moving square on transparent background
        x = 8 + i
        rgba[16:48, x : x + 24, :3] = rng.integers(64, 255, size=3, dtype=np.uint8)
        rgba[16:48, x : x + 24, 3] = 255
        frames.append(Image.fromarray(rgba))
    return frames


@pytest.fixture(scope="module")
def tiny_pipeline():
    import jax.numpy as jnp

    pipe = ActionMeshPipeline(
        config_name="actionmesh",
        weights_dir=None,
        config_updates=dict(TINY_UPDATES),
        dtype=jnp.float32,
    )
    # tiny DINOv2 (random weights): 5x5 patch grid + cls = 26 tokens, dim 32
    pipe.image_encoder = ImageEncoder(
        weights_dir=None, dtype=jnp.float32, config=TINY_DINO
    )
    # stub stage 0 latent must match the tiny latent shape
    from actionmesh_tpu.models.stage0 import StubImageTo3D

    pipe.image_to_3d = StubImageTo3D(latent_shape=(16, 8))
    return pipe


@pytest.mark.slow
def test_video_to_4d_16_frames(tiny_pipeline):
    frames = make_frames(16)
    input = ActionMeshInput(
        frames=frames, timesteps=np.arange(16, dtype=np.float32)
    )
    meshes = tiny_pipeline(input, seed=44)
    # subsampling_level=1 => outputs at every input timestep
    assert len(meshes) == 16
    topo = meshes[0].faces
    for m in meshes:
        assert np.array_equal(m.faces, topo), "all meshes share anchor topology"
        assert np.isfinite(m.vertices).all()
        assert m.vertices.min() >= -1.0 and m.vertices.max() <= 1.0


@pytest.mark.slow
def test_video_to_4d_ar_windows(tiny_pipeline):
    """>16 frames exercises the autoregressive sliding-window path."""
    frames = make_frames(18)
    input = ActionMeshInput(
        frames=frames, timesteps=np.arange(18, dtype=np.float32)
    )
    meshes = tiny_pipeline(input, seed=7)
    assert len(meshes) == 18


@pytest.mark.slow
def test_video_to_4d_31_frames_window_boundary_continuity(
    tiny_pipeline, monkeypatch
):
    """31 frames = two full AR windows [0..15] + [15..30] (slide 15).

    The overlap frame (timestep 15) is banked by window 1 and fed to
    window 2 as mask=1 conditioning; the flow must keep it frozen
    (reference scheduler.py:244-248), so the latent re-banked by window 2
    is BITWISE identical to window 1's.
    """
    from actionmesh_tpu.utils import banks as banks_mod

    records = []
    orig_update = banks_mod.LatentBank.update

    def spy(self, timesteps, latents, replace=False):
        records.append(
            (
                np.asarray(timesteps).reshape(-1).copy(),
                np.asarray(latents, dtype=np.float32)
                .reshape((-1,) + self.empty_dims)
                .copy(),
            )
        )
        return orig_update(self, timesteps, latents, replace=replace)

    monkeypatch.setattr(banks_mod.LatentBank, "update", spy)

    frames = make_frames(31)
    input = ActionMeshInput(
        frames=frames, timesteps=np.arange(31, dtype=np.float32)
    )
    meshes = tiny_pipeline(input, seed=3)
    assert len(meshes) == 31

    # records: [anchor(t=0), window1 (16 ts), window2 (16 ts)]
    window_records = [r for r in records if len(r[0]) > 1]
    assert len(window_records) == 2
    ts1, lat1 = window_records[0]
    ts2, lat2 = window_records[1]
    shared = sorted(set(ts1.tolist()) & set(ts2.tolist()))
    assert shared == [15.0]
    a = lat1[np.where(ts1 == 15.0)[0][0]]
    b = lat2[np.where(ts2 == 15.0)[0][0]]
    np.testing.assert_array_equal(a, b)
    # window 1 must also have kept the anchor frame's latent frozen
    anchor_rec = [r for r in records if len(r[0]) == 1][0]
    a0 = anchor_rec[1][0]
    b0 = lat1[np.where(ts1 == 0.0)[0][0]]
    np.testing.assert_array_equal(a0, b0)


@pytest.mark.slow
def test_save_load_native_checkpoint(tiny_pipeline, tmp_path):
    import jax
    import jax.numpy as jnp

    tiny_pipeline.save_pretrained(tmp_path / "ckpt")
    assert (tmp_path / "ckpt" / "denoiser.npz").exists()
    orig = tiny_pipeline.denoiser_params
    tiny_pipeline.load_native(tmp_path / "ckpt")
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        orig,
        tiny_pipeline.denoiser_params,
    )


@pytest.mark.slow
def test_pipeline_call_is_idempotent_on_input(tiny_pipeline):
    """Calling the pipeline twice with the SAME input object works.

    The reference mutates input.frames in place during preprocessing
    (reference: actionmesh/pipeline.py:651-656), so a second call sees
    composited RGB frames without alpha and fails. Our __call__ shallow-
    copies the input; the caller's frames keep their alpha channel.
    """
    frames = make_frames(16, seed=3)
    input = ActionMeshInput(
        frames=frames, timesteps=np.arange(16, dtype=np.float32)
    )
    m1 = tiny_pipeline(input, seed=44)
    assert input.frames[0].mode == "RGBA", "caller's frames must be untouched"
    m2 = tiny_pipeline(input, seed=44)
    assert len(m1) == len(m2)
    for a, b in zip(m1, m2):
        np.testing.assert_array_equal(a.vertices, b.vertices)


@pytest.mark.slow
def test_distilled_preset_runs_guidance_free():
    """The actionmesh_distilled preset (single [[1,1]] guidance branch, 8
    Euler steps — the inference contract of training/distill.py students)
    drives the full pipeline; output shape/topology invariants hold."""
    import jax.numpy as jnp

    pipe = ActionMeshPipeline(
        config_name="actionmesh_distilled",
        weights_dir=None,
        config_updates=dict(TINY_UPDATES, **{
            "scheduler.num_inference_steps": 2,
        }),
        dtype=jnp.float32,
    )
    assert list(pipe.cfg.cf_guidance.guidance_at_inference) == [[1, 1]]
    assert list(pipe.cfg.cf_guidance.guidance_scales) == []
    pipe.image_encoder = ImageEncoder(
        weights_dir=None, dtype=jnp.float32, config=TINY_DINO
    )
    from actionmesh_tpu.models.stage0 import StubImageTo3D

    pipe.image_to_3d = StubImageTo3D(latent_shape=(16, 8))
    frames = make_frames(16)
    meshes = pipe(
        ActionMeshInput(
            frames=frames, timesteps=np.arange(16, dtype=np.float32)
        ),
        seed=44,
    )
    assert len(meshes) == 16
    topo = meshes[0].faces
    for m in meshes:
        assert np.array_equal(m.faces, topo)
        assert np.isfinite(m.vertices).all()


def test_all_presets_load_and_compose():
    """Every YAML preset in configs/ resolves through `defaults`
    composition with schema-valid keys; spot-check the operating points
    each preset exists for (step counts, guidance shape)."""
    from actionmesh_tpu.config import CONFIG_DIR, load_config

    presets = sorted(p.stem for p in CONFIG_DIR.glob("*.yaml"))
    assert len(presets) >= 7, presets
    cfgs = {name: load_config(name) for name in presets}

    assert cfgs["actionmesh"].scheduler.num_inference_steps == 30
    assert cfgs["actionmesh"].stage_0.num_inference_steps == 100
    assert cfgs["actionmesh_fast"].scheduler.num_inference_steps == 15
    assert cfgs["actionmesh_fast"].stage_0.num_inference_steps == 50
    for name, steps in (
        ("actionmesh_distilled", 8),
        ("actionmesh_distilled4", 4),
        ("actionmesh_distilled4_fast", 4),
    ):
        cfg = cfgs[name]
        assert cfg.scheduler.num_inference_steps == steps, name
        # guidance-free: single [[1,1]] branch, no scales
        assert list(cfg.cf_guidance.guidance_at_inference) == [[1, 1]], name
        assert list(cfg.cf_guidance.guidance_scales) == [], name
    assert cfgs["actionmesh_distilled4_fast"].stage_0.num_inference_steps == 50
    # distilled4 inherits the BASE (quality) Stage 0
    assert cfgs["actionmesh_distilled4"].stage_0.num_inference_steps == 100
    # turbo: both stages distilled — guidance-free Stage 0 at 25 steps
    turbo = cfgs["actionmesh_turbo"]
    assert turbo.scheduler.num_inference_steps == 4
    assert turbo.stage_0.num_inference_steps == 25
    assert turbo.stage_0.guidance_scale == 0.0
    assert list(turbo.cf_guidance.guidance_at_inference) == [[1, 1]]
    # --low_ram is honest: the lowram presets actually turn on the
    # sequential-CFG path (sampling/denoise_loop.py split_cfg_batch, the
    # real single-chip memory lever); the non-lowram presets leave it off.
    assert cfgs["actionmesh_lowram"].scheduler.split_cfg_batch is True
    assert cfgs["actionmesh_fast_lowram"].scheduler.split_cfg_batch is True
    assert cfgs["actionmesh_fast_lowram"].scheduler.num_inference_steps == 15
    assert cfgs["actionmesh"].scheduler.split_cfg_batch is False


def test_stage0_decode_knobs_reach_image_to_3d():
    """stage_0.prefilter_octree_depth / coarse_decode_dtype flow from the
    config layer to the image-to-3D backend call (and are omitted when
    explicitly nulled, keeping backends with strict signatures working).
    The base preset ships prefilter_octree_depth: 6 (DECODE_LEVERS.json:
    exact-agreement 1.7x decode speedup), so the no-override case carries
    that default."""
    import jax.numpy as jnp

    from actionmesh_tpu.io.video_input import ActionMeshInput
    from actionmesh_tpu.models.stage0 import make_uv_sphere

    class RecordingStage0:
        def __init__(self):
            self.kwargs = None

        def __call__(self, image, **kwargs):
            self.kwargs = kwargs
            return jnp.zeros((1, 16, 8), jnp.float32), make_uv_sphere(
                n_lat=6, n_lon=8
            )

    for updates, expect in (
        (
            {"stage_0.prefilter_octree_depth": 6,
             "stage_0.coarse_decode_dtype": "bfloat16"},
            {"prefilter_octree_depth": 6, "coarse_decode_dtype": "bfloat16"},
        ),
        ({}, {"prefilter_octree_depth": 6}),
        ({"stage_0.prefilter_octree_depth": None}, {}),
    ):
        pipe = ActionMeshPipeline(
            config_name="actionmesh",
            weights_dir=None,
            config_updates=dict(TINY_UPDATES, **updates),
            dtype=jnp.float32,
        )
        rec = RecordingStage0()
        pipe.image_to_3d = rec
        inp = ActionMeshInput(
            frames=make_frames(16),
            timesteps=np.arange(16, dtype=np.float32),
        )
        pipe.init_banks_from_anchor(inp, seed=0)
        got = {
            k: v for k, v in rec.kwargs.items()
            if k in ("prefilter_octree_depth", "coarse_decode_dtype")
        }
        assert got == expect, rec.kwargs
