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
