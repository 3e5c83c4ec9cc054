"""Closed-loop experiment tests: scene family, data build, train->infer->eval.

Fast tier pins the pure pieces (scene bounds, tracking correspondence,
RGBA renders, mask-family batching); the slow tier drives the whole loop —
build -> short train -> export -> REAL pipeline inference -> ActionBench
scoring — end to end on a micro configuration.
"""

import dataclasses
import json
from pathlib import Path

import numpy as np
import pytest

from actionmesh_tpu.training.closed_loop import (
    CascadeSpec,
    build_dataset,
    make_scene,
    render_frames,
    tracked_points,
)

MICRO = CascadeSpec(
    image_size=96,
    surface_samples=256,
    track_points=128,
    gt_points=2000,
    n_lat=12,
    n_lon=16,
    denoiser_width=64,
    denoiser_layers=2,
    denoiser_heads=2,
    decoder_width=64,
    decoder_layers=2,
    decoder_heads=2,
    num_inference_steps=2,
)


def test_scene_bounded_under_anchor_normalization():
    """Every frame's vertices stay inside the decoder's (-1,1) range under
    the anchor's normalize_mesh transform, for many seeds."""
    from actionmesh_tpu.preprocessing.mesh import normalize_mesh

    spec = dataclasses.replace(MICRO, n_frames=8)
    for seed in range(12):
        meshes = make_scene(seed, spec)
        _, center, factor = normalize_mesh(meshes[0])
        worst = max(
            float(np.abs((m.vertices - center) * factor).max()) for m in meshes
        )
        # make_scene allows a 3% envelope overshoot (clipped in tracks)
        assert worst <= 1.031, f"seed {seed}: {worst}"
        # and the motion is non-trivial (not collapsed to the anchor)
        motion = max(
            float(np.abs(m.vertices - meshes[0].vertices).max())
            for m in meshes[1:]
        )
        assert motion > 0.01, f"seed {seed}: motion collapsed ({motion})"


def test_tracked_points_correspondence():
    """Tracked points replay frame-0 barycentrics: a rigidly translated
    sequence tracks exactly by the same offset."""
    spec = dataclasses.replace(MICRO, n_frames=4)
    meshes = make_scene(3, spec)
    from actionmesh_tpu.io.mesh import Mesh

    shifted = [
        Mesh(meshes[0].vertices + 0.1 * t, meshes[0].faces.copy())
        for t in range(4)
    ]
    pts = tracked_points(shifted, 64, seed=5)
    assert pts.shape == (4, 64, 6)
    for t in range(1, 4):
        np.testing.assert_allclose(
            pts[t, :, :3] - pts[0, :, :3], 0.1 * t, atol=1e-5
        )
        # normals are translation-invariant
        np.testing.assert_allclose(pts[t, :, 3:], pts[0, :, 3:], atol=1e-6)


def test_render_frames_rgba_valid_alpha():
    """Rendered frames carry a valid alpha channel (>=1% fg and bg), the
    gate that makes the pipeline skip RMBG matting on synthetic videos."""
    from actionmesh_tpu.preprocessing.image import is_valid_alpha

    spec = dataclasses.replace(MICRO, n_frames=4)
    meshes = make_scene(1, spec)  # seed 1: large motion amplitude
    from actionmesh_tpu.preprocessing.mesh import normalize_mesh

    _, center, factor = normalize_mesh(meshes[0])
    from actionmesh_tpu.io.mesh import Mesh

    normed = [Mesh((m.vertices - center) * factor, m.faces) for m in meshes]
    frames = render_frames(normed, spec)
    assert len(frames) == 4
    for fr in frames:
        assert fr.mode == "RGBA"
        alpha = np.asarray(fr)[..., 3]
        assert is_valid_alpha(alpha)
        # silhouette changes over time (motion is visible in the video)
    a0 = np.asarray(frames[0])[..., 3] > 127
    a3 = np.asarray(frames[3])[..., 3] > 127
    assert (a0 != a3).mean() > 0.001


def test_flow_batches_cond_mask_range(tmp_path):
    from actionmesh_tpu.training.data import (
        ClipWindowDataset,
        flow_batches,
        synthesize_clip_dir,
    )

    synthesize_clip_dir(tmp_path, n_clips=2, frames=8)
    ds = ClipWindowDataset(tmp_path, window=8)
    batches = flow_batches(ds, 2, seed=0, n_cond_frames=(1, 7))
    seen = set()
    for _ in range(32):
        b = next(batches)
        m = b["mask"]
        # masks are prefixes
        assert (np.diff(m, axis=1) <= 0).all()
        seen.update(int(r.sum()) for r in m)
    assert min(seen) >= 1 and max(seen) <= 7 and len(seen) >= 4
    with pytest.raises(ValueError):
        next(flow_batches(ds, 2, n_cond_frames=(0, 8)))


def test_spec_roundtrip(tmp_path):
    spec = dataclasses.replace(MICRO, guidance_scale=3.5)
    spec.save(tmp_path / "spec.json")
    again = CascadeSpec.load(tmp_path / "spec.json")
    assert again == spec


@pytest.mark.slow
def test_closed_loop_end_to_end(tmp_path):
    """The full loop at micro scale: build -> train (briefly) -> export ->
    REAL {video+3D} pipeline inference -> ActionBench scoring. Asserts the
    chain runs, losses drop, and the harness returns finite metrics."""
    import jax

    from actionmesh_tpu.training.checkpoint import export_for_inference
    from actionmesh_tpu.training.closed_loop import (
        evaluate_predictions,
        make_pipeline,
        run_inference,
    )
    from actionmesh_tpu.training.data import (
        ClipWindowDataset,
        DecoderTrackDataset,
        decoder_batches,
        flow_batches,
    )
    from actionmesh_tpu.training.loop import (
        TrainLoopConfig,
        run_decoder_training,
        run_flow_training,
    )

    root = tmp_path / "loop"
    spec = MICRO
    uids = build_dataset(root, spec, n_train=2, n_eval=1, seed=0)
    assert len(uids["train"]) == 2 and len(uids["eval"]) == 1

    ds = ClipWindowDataset(root / "clips_train", window=spec.window, stride=4)
    cfg = TrainLoopConfig(
        total_steps=8, peak_lr=3e-4, warmup_steps=2, log_every=4,
        ckpt_every=100, out_dir=str(root / "tf"), seed=0,
    )
    state, logs = run_flow_training(
        spec.denoiser_config(),
        flow_batches(ds, 2, seed=0, n_cond_frames=(1, spec.window - 1)),
        cfg,
    )
    assert logs[-1]["loss"] < logs[0]["loss"] * 1.5  # no blow-up
    export_for_inference(state, root / "ckpt", stage="flow", compute_dtype=None)

    dds = DecoderTrackDataset(
        root / "clips_train", root / "tracks", window=spec.window, stride=4
    )
    dstate, dlogs = run_decoder_training(
        spec.autoencoder_config(),
        decoder_batches(dds, 2, vertex_bucket=spec.track_points, seed=0),
        TrainLoopConfig(
            total_steps=8, peak_lr=3e-4, warmup_steps=2, log_every=4,
            ckpt_every=100, out_dir=str(root / "td"), seed=0,
        ),
    )
    export_for_inference(
        dstate, root / "ckpt", stage="decoder", compute_dtype=None
    )

    pipe = make_pipeline(spec, ckpt_dir=root / "ckpt")
    # loaded params actually serve the pipeline
    got = jax.tree.leaves(pipe.denoiser_params)[0]
    want = jax.tree.leaves(
        state.get("ema_params", state["params"])
    )[0]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want, dtype=np.asarray(got).dtype), atol=0
    )

    run_inference(root, pipe, uids["eval"], root / "pred", spec, seed=1)
    uid = uids["eval"][0]
    files = sorted((root / "pred" / uid).glob("mesh_*.glb"))
    assert len(files) == spec.n_frames

    metrics = evaluate_predictions(
        root, root / "pred", root / "results.csv",
        icp_iters=10, n_pts_icp=500, n_pts_chamfer=2000,
    )
    assert metrics["n_success"] == 1, metrics
    for k in ("cd_3d", "cd_4d", "cd_motion"):
        assert np.isfinite(metrics[k]) and metrics[k] > 0

    report = json.loads(Path(root / "spec.json").read_text())
    assert report["n_frames"] == spec.n_frames


class TestSdfGroundTruth:
    """preprocessing/sdf: exact TSDF supervision for the Stage-0 VAE."""

    def test_sphere_analytic(self):
        from actionmesh_tpu.models.stage0 import make_uv_sphere
        from actionmesh_tpu.preprocessing.sdf import mesh_tsdf

        m = make_uv_sphere(radius=0.6, n_lat=32, n_lon=48)
        rng = np.random.default_rng(0)
        pts = rng.uniform(-1.0, 1.0, (400, 3)).astype(np.float32)
        sdf = mesh_tsdf(pts, m, clamp=10.0)
        analytic = np.linalg.norm(pts, axis=1) - 0.6
        # error bounded by the mesh's chordal deviation from the sphere
        np.testing.assert_allclose(sdf, analytic, atol=5e-3)
        # sign convention: NEGATIVE inside (ops/isosurface `< level`)
        inside = np.linalg.norm(pts, axis=1) < 0.55
        assert (sdf[inside] < 0).all()

    def test_clamp_and_query_pool(self):
        from actionmesh_tpu.models.stage0 import make_uv_sphere
        from actionmesh_tpu.preprocessing.sdf import (
            mesh_tsdf,
            sample_sdf_queries,
        )

        m = make_uv_sphere(radius=0.5, n_lat=16, n_lon=24)
        pool = sample_sdf_queries(m, n_near=200, n_uniform=100, seed=3)
        assert pool.shape == (300, 3)
        assert np.abs(pool[200:]).max() <= 1.1  # uniform part bounded
        sdf = mesh_tsdf(pool, m, clamp=0.2)
        assert np.abs(sdf).max() <= 0.2 + 1e-6
        # near-surface points concentrate near the zero crossing
        assert np.abs(sdf[:200]).mean() < 0.06

    def test_scene_mesh_consistency(self):
        """On a deformed scene mesh (non-sphere): winding sign agrees with
        the surface-offset construction — points nudged inward along the
        normal are inside, outward are outside."""
        from actionmesh_tpu.preprocessing.mesh import normalize_mesh
        from actionmesh_tpu.preprocessing.sdf import mesh_tsdf

        spec = dataclasses.replace(MICRO, n_frames=4)
        anchor, _, _ = normalize_mesh(make_scene(7, spec)[0])
        nrm, areas = anchor.face_normals_and_areas()
        centers = anchor.vertices[anchor.faces].mean(axis=1)
        keep = areas > np.quantile(areas, 0.5)  # avoid degenerate slivers
        c, n = centers[keep][:100], nrm[keep][:100]
        eps = 0.02
        sdf_in = mesh_tsdf((c - eps * n).astype(np.float32), anchor)
        sdf_out = mesh_tsdf((c + eps * n).astype(np.float32), anchor)
        assert (sdf_in < 0).mean() > 0.95
        assert (sdf_out > 0).mean() > 0.95
        np.testing.assert_allclose(np.abs(sdf_in), eps, atol=eps * 0.6)


class TestVaeTraining:
    """training/vae_train: TSDF-supervised vecset-VAE training."""

    def _sphere_batch(self, B=2, N=128, Q=96, radius=0.6, seed=0):
        from actionmesh_tpu.models.stage0 import make_uv_sphere
        from actionmesh_tpu.preprocessing.sdf import (
            mesh_tsdf,
            sample_sdf_queries,
        )

        m = make_uv_sphere(radius=radius, n_lat=12, n_lon=16)
        rng = np.random.default_rng(seed)
        surf, pts, tsdf = [], [], []
        for b in range(B):
            _, areas = m.face_normals_and_areas()
            cdf = np.cumsum(areas) / areas.sum()
            fid = np.searchsorted(cdf, rng.random(N))
            u, v = rng.random(N), rng.random(N)
            fl = u + v > 1
            u[fl], v[fl] = 1 - u[fl], 1 - v[fl]
            w = 1 - u - v
            tri = m.vertices[m.faces[fid]]
            p = (
                u[:, None] * tri[:, 0]
                + v[:, None] * tri[:, 1]
                + w[:, None] * tri[:, 2]
            )
            nrm, _ = m.face_normals_and_areas()
            surf.append(np.concatenate([p, nrm[fid]], 1).astype(np.float32))
            pool = sample_sdf_queries(m, Q // 2, Q - Q // 2, seed=seed + b)
            pts.append(pool)
            tsdf.append(mesh_tsdf(pool, m))
        return {
            "surface": np.stack(surf),
            "points": np.stack(pts),
            "tsdf": np.stack(tsdf),
        }

    def test_loss_finite_and_decreases(self):
        import jax
        import optax

        from actionmesh_tpu.models.triposg.vae import (
            TripoSGVAEConfig,
            init_triposg_vae,
        )
        from actionmesh_tpu.training.flow_train import init_train_state
        from actionmesh_tpu.training.vae_train import (
            make_vae_train_step,
            vae_loss,
        )

        cfg = TripoSGVAEConfig(
            latent_channels=4, num_tokens=8,
            encoder_width=32, encoder_layers=1, encoder_heads=2,
            decoder_width=32, decoder_layers=1, decoder_heads=2,
        )
        params = init_triposg_vae(jax.random.key(0), cfg)
        batch = self._sphere_batch()
        loss0, parts = vae_loss(
            params, cfg, batch, jax.random.key(1), attn_impl="chunked"
        )
        assert np.isfinite(float(loss0))
        assert float(parts["kl"]) >= 0
        opt = optax.adam(3e-3)
        state = init_train_state(params, opt)
        step = make_vae_train_step(cfg, opt, attn_impl="chunked")
        for i in range(12):
            state, loss = step(state, batch, jax.random.key(10 + i))
        # overfit trend on a fixed batch
        assert float(loss) < float(loss0)

    def test_sdf_batches_layout(self):
        from actionmesh_tpu.training.vae_train import sdf_batches

        scenes = [
            {
                "surface": np.zeros((16, 6), np.float32),
                "points": np.arange(3 * 60, dtype=np.float32).reshape(60, 3),
                "tsdf": np.arange(60, dtype=np.float32),
            }
            for _ in range(3)
        ]
        b = next(sdf_batches(scenes, 2, 20, seed=0))
        assert b["surface"].shape == (2, 16, 6)
        assert b["points"].shape == (2, 20, 3)
        assert b["tsdf"].shape == (2, 20)
        # query subsample keeps points/tsdf paired
        np.testing.assert_allclose(b["points"][..., 0], b["tsdf"] * 3)
        with pytest.raises(ValueError):
            next(sdf_batches(scenes, 5, 20))


@pytest.mark.slow
def test_stage0_distill_to_turbo_video_entry(tmp_path):
    """Stage-0 distillation feeds the fully distilled (turbo) serving path:
    distill a T=1 Stage-0 DiT (guidance round, then one progressive
    halving) with the SAME recipes Stage I uses, export it as a Stage-0
    checkpoint, and drive the MAIN video->4D entry with guidance-free
    short Stage-0 sampling (stage_0.guidance_scale=0) — the
    actionmesh_turbo composition at micro scale."""
    import jax

    from actionmesh_tpu.models.triposg.dit import init_triposg_dit
    from actionmesh_tpu.models.triposg.vae import init_triposg_vae
    from actionmesh_tpu.training.checkpoint import export_for_inference
    from actionmesh_tpu.training.closed_loop import (
        make_pipeline,
        run_inference_video,
    )
    from actionmesh_tpu.training.loop import TrainLoopConfig, run_distillation
    from actionmesh_tpu.utils.weights import save_params

    spec = dataclasses.replace(
        MICRO,
        stage0_width=48,
        stage0_layers=2,
        stage0_heads=2,
        stage0_steps=4,
        stage0_dense_depth=4,
        stage0_hier_depth=5,
    )
    root = tmp_path / "loop"
    uids = build_dataset(root, spec, n_train=1, n_eval=1, seed=0)

    # a "trained" Stage-0 stack (random at micro scale: the quality of the
    # teacher is not under test, the distill->export->serve chain is)
    dit_cfg = spec.stage0_dit_config()
    kd, kv = jax.random.split(jax.random.PRNGKey(3))
    teacher = init_triposg_dit(kd, dit_cfg)
    s0_dir = root / "ckpt_stage0"
    s0_dir.mkdir(parents=True)
    save_params(teacher, s0_dir / "dit.npz")
    save_params(init_triposg_vae(kv, spec.vae_config()), s0_dir / "vae.npz")

    # synthetic anchor-latent batches in the flow_batches T=1 layout
    def batches(seed):
        rng = np.random.default_rng(seed)
        while True:
            yield {
                "latents": rng.normal(
                    size=(2, 1, spec.latent_tokens, spec.latent_channels)
                ).astype(np.float32),
                "context": rng.normal(
                    size=(2, 1, 6, spec.dino_hidden)
                ).astype(np.float32),
                "framestep": np.zeros((2, 1), np.float32),
                "mask": np.zeros((2, 1), np.float32),
            }

    def loop_cfg(name):
        return TrainLoopConfig(
            total_steps=4, peak_lr=1e-4, warmup_steps=1, log_every=2,
            ckpt_every=100, out_dir=str(root / name), seed=0,
        )

    state, logs = run_distillation(
        dit_cfg, teacher, batches(0), loop_cfg("s0g"),
        mode="guidance", guidance_scale=spec.stage0_guidance,
        attn_impl="chunked",
    )
    assert np.isfinite(logs[-1]["loss"])
    state, logs = run_distillation(
        dit_cfg, state["ema_params"], batches(1), loop_cfg("s0p"),
        mode="progressive", num_teacher_steps=spec.stage0_steps,
        teacher_guidance_scale=None, attn_impl="chunked",
    )
    assert np.isfinite(logs[-1]["loss"])
    distilled_dir = root / "ckpt_stage0_distilled"
    export_for_inference(
        state, distilled_dir, stage="stage0_dit", compute_dtype=None
    )
    import shutil

    shutil.copy(s0_dir / "vae.npz", distilled_dir / "vae.npz")

    # the turbo composition: guidance-free short Stage-0 sampling through
    # the MAIN entry (Stage I/II random — serving plumbing under test)
    pipe = make_pipeline(
        spec,
        ckpt_dir=None,
        extra_updates={
            "stage_0.num_inference_steps": spec.stage0_steps // 2,
            "stage_0.guidance_scale": 0.0,
        },
        stage0_dir=distilled_dir,
        video_mode=True,
    )
    assert pipe.cfg.stage_0.guidance_scale == 0.0
    # the served DiT is the distilled export, not the teacher
    got = jax.tree.leaves(pipe.image_to_3d.pipeline.dit_params)[0]
    want = jax.tree.leaves(state["ema_params"])[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0)
    run_inference_video(root, pipe, uids["eval"], root / "pred", spec, seed=5)
    uid = uids["eval"][0]
    files = sorted((root / "pred" / uid).glob("mesh_*.glb"))
    assert len(files) == spec.n_frames, (
        "video->4D with the distilled Stage 0 produced no meshes "
        "(run_inference_video swallows per-scene failures; see log)"
    )


def test_variants_config_updates_are_schema_valid():
    """Every closed-loop VARIANTS config-update dict must name real config
    keys: a typo'd key should fail HERE, not 30 minutes into a TPU eval.
    load_config raises KeyError on unknown dotted paths (config.py
    _apply_updates), so composing each variant's extras over the MICRO
    spec's pipeline updates exercises the same merge phase_eval runs."""
    from actionmesh_tpu.config import load_config
    from scripts.closed_loop import VARIANTS

    base = MICRO.pipeline_updates()
    assert VARIANTS, "VARIANTS registry is empty"
    for name, (ckpt_sub, extra, *stage0_sub) in VARIANTS.items():
        cfg = load_config("actionmesh", updates={**base, **extra})
        steps = extra.get(
            "scheduler.num_inference_steps", MICRO.num_inference_steps
        )
        assert cfg.scheduler.num_inference_steps == steps, name
        # video-mode variants must reference an exported checkpoint dir
        # (only "video_random" runs weightless)
        if name.startswith("video") and name != "video_random":
            assert ckpt_sub is not None, name
        # Stage-0-distilled variants: guidance-free anchor sampling and a
        # dedicated distilled Stage-0 checkpoint subdir
        if "stage_0.guidance_scale" in extra:
            assert extra["stage_0.guidance_scale"] == 0.0, name
            assert stage0_sub and stage0_sub[0].startswith("ckpt_stage0"), name
