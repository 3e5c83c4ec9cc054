"""Closed-loop quality experiment driver: build -> train -> (distill) -> eval.

Produces the repo's first ActionBench numbers from the ACTUAL generative
pipeline (see actionmesh_tpu/training/closed_loop.py). Phases:

  build    generate scenes, renders, GT, training clips/tracks
  train    train Stage-I denoiser + Stage-II decoder; export native ckpts
  distill  guidance-distill then progressive-halve the trained teacher
  eval     run the full {video+3D} pipeline per variant on held-out scenes
           and score with the ActionBench harness; writes CLOSED_LOOP.json

Usage:
  python scripts/closed_loop.py all --root /tmp/closed_loop
  python scripts/closed_loop.py eval --root /tmp/closed_loop --variants random,trained
"""

from __future__ import annotations

import argparse
import json
import logging
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
logger = logging.getLogger("closed_loop")


def _spec_from_args(args):
    """CascadeSpec with optional --spec key=value overrides."""
    from actionmesh_tpu.training.closed_loop import CascadeSpec

    def parse(v: str):
        for cast in (int, float):
            try:
                return cast(v)
            except ValueError:
                continue
        return v

    overrides = {}
    for kv in getattr(args, "spec", None) or []:
        k, v = kv.split("=", 1)
        overrides[k] = parse(v)
    return CascadeSpec(**overrides)


def phase_build(root: Path, args) -> None:
    from actionmesh_tpu.training.closed_loop import build_dataset

    spec = _spec_from_args(args)
    t0 = time.time()
    uids = build_dataset(
        root, spec, n_train=args.n_train, n_eval=args.n_eval, seed=args.seed
    )
    logger.info(
        "build: %d train / %d eval scenes in %.0fs",
        len(uids["train"]), len(uids["eval"]), time.time() - t0,
    )


def _eval_batches(make_iter, n: int) -> list[dict]:
    """Materialize up to n fixed held-out batches."""
    out = []
    it = make_iter()
    for _ in range(n):
        try:
            out.append(next(it))
        except StopIteration:
            break
    return out


def _best_or_final(state, train_dir: Path):
    """Prefer the best-held-out-eval checkpoint for the inference export."""
    best = Path(train_dir) / "ckpt_best.npz"
    if best.exists():
        from actionmesh_tpu.training.checkpoint import restore_train_state

        logger.info("exporting best-eval checkpoint %s", best)
        return restore_train_state(best, state)
    return state


def _invalidate_stale_train_state(root: Path) -> None:
    """Remove Stage-I/II train state fit to a superseded latent definition.

    Re-encoding the clips (stage0 phase) changes what the latents MEAN:
    any train/distill state or exported checkpoint under the root was fit
    to the old latents, and the resumable train loop would silently resume
    from (and immediately finish at) its final step instead of retraining
    — including distill_*/ dirs and exported ckpt*/ dirs, which a later
    `distill`/`eval` phase would otherwise consume stale (r5 review)."""
    stale_globs = (
        "train_flow*", "train_decoder*", "train_dit*", "distill_*", "ckpt*"
    )
    # artifacts the CALLING stage0 phase just produced with the NEW VAE —
    # never stale at this point in the phase
    fresh = {"train_vae", "ckpt_stage0"}
    for pattern in stale_globs:
        for stale in sorted(root.glob(pattern)):
            if stale.is_dir() and stale.name not in fresh:
                shutil.rmtree(stale)
                logger.info(
                    "removed stale train state %s (latents re-encoded)",
                    stale.name,
                )


def phase_stage0(root: Path, args) -> None:
    """Train Stage 0 from scratch: VAE on exact anchor TSDF, then the
    image->latent DiT on trained-VAE anchor latents; finally re-encode the
    Stage-I clips so the whole cascade shares one latent definition.

    After this phase, `train` retrains Stage I/II on the new latents and
    `eval --variants video` drives the MAIN video->4D entry end-to-end."""
    import jax.numpy as jnp

    from actionmesh_tpu.models.triposg.pipeline import TripoSGPipeline
    from actionmesh_tpu.training.checkpoint import export_for_inference
    from actionmesh_tpu.training.closed_loop import (
        CascadeSpec,
        MeanEncodeVAE,
        build_sdf_dataset,
        load_sdf_dataset,
        make_conditioning_stack,
        reencode_clips,
        write_stage0_clips,
    )
    from actionmesh_tpu.training.data import ClipWindowDataset, flow_batches
    from actionmesh_tpu.training.loop import (
        TrainLoopConfig,
        run_flow_training,
        run_vae_training,
    )
    from actionmesh_tpu.training.vae_train import sdf_batches

    spec = CascadeSpec.load(root / "spec.json")
    split = json.loads((root / "split.json").read_text())
    ckpt_dir = root / "ckpt_stage0"

    # -- 1. exact-TSDF supervision pools -----------------------------------
    t0 = time.time()
    build_sdf_dataset(
        root, spec, split["train"] + split["eval"], build_seed=args.seed
    )
    logger.info("sdf pools: %.0fs", time.time() - t0)

    # -- 2. VAE: TSDF regression + KL ---------------------------------------
    train_scenes = load_sdf_dataset(root, split["train"])
    eval_scenes = load_sdf_dataset(root, split["eval"])
    q = args.vae_query_points
    vcfg = TrainLoopConfig(
        total_steps=args.vae_steps,
        peak_lr=args.lr,
        warmup_steps=min(200, args.vae_steps // 10),
        ema_decay=None,
        eval_every=max(1, args.vae_steps // 20),
        keep_best_eval=True,
        log_every=50,
        ckpt_every=max(100, args.vae_steps // 4),
        out_dir=str(root / "train_vae"),
        seed=args.seed,
    )
    eval_b = list(
        sdf_batches(eval_scenes, len(eval_scenes), q, seed=123, epochs=1)
    )
    t0 = time.time()
    vstate, vlogs = run_vae_training(
        spec.vae_config(),
        sdf_batches(train_scenes, args.batch, q, seed=args.seed),
        vcfg,
        kl_weight=args.kl_weight,
        attn_impl="chunked",
        eval_batches=eval_b,
    )
    vstate = _best_or_final(vstate, root / "train_vae")
    export_for_inference(
        vstate, ckpt_dir, stage="stage0_vae", compute_dtype=None
    )
    evals = [l for l in vlogs if "eval_loss" in l]
    logger.info(
        "vae: %d steps in %.0fs; eval TSDF MSE %s -> %s",
        args.vae_steps, time.time() - t0,
        f"{evals[0]['eval_loss']:.5f}" if evals else "n/a",
        f"{min(l['eval_loss'] for l in evals):.5f}" if evals else "n/a",
    )
    (root / "train_vae_log.json").write_text(json.dumps(vlogs))

    # -- 3. re-encode clips + anchor latents through the trained VAE --------
    image_encoder, _ = make_conditioning_stack(spec)
    trained = TripoSGPipeline(
        dit_params=None,  # not needed for encode
        vae_params=vstate["params"],
        image_encoder=image_encoder,
        dit_cfg=spec.stage0_dit_config(),
        vae_cfg=spec.vae_config(),
        dtype=jnp.float32,
        attn_impl="chunked",
    )
    vae = MeanEncodeVAE(trained)
    t0 = time.time()
    reencode_clips(root, spec, vae, build_seed=args.seed)
    write_stage0_clips(root, spec, vae, split["train"] + split["eval"])
    logger.info("re-encode: %.0fs", time.time() - t0)
    _invalidate_stale_train_state(root)

    # -- 4. Stage-0 DiT: image -> anchor-latent rectified flow --------------
    ds = ClipWindowDataset(root / "clips_stage0", window=1)
    # hold out the eval scenes' anchors for DiT eval loss
    eval_uids = set(split["eval"])
    train_idx = [
        i for i, w in enumerate(ds._windows) if w.clip.stem not in eval_uids
    ]
    eval_idx = [
        i for i, w in enumerate(ds._windows) if w.clip.stem in eval_uids
    ]
    train_view = _DatasetView(ds, train_idx)
    eval_view = _DatasetView(ds, eval_idx)
    dit_cfg_loop = TrainLoopConfig(
        total_steps=args.dit_steps,
        peak_lr=args.lr,
        warmup_steps=min(200, args.dit_steps // 10),
        ema_decay=0.999,
        p_uncond=0.1,
        eval_every=max(1, args.dit_steps // 20),
        keep_best_eval=True,
        log_every=50,
        ckpt_every=max(100, args.dit_steps // 4),
        out_dir=str(root / "train_dit"),
        seed=args.seed,
    )
    deval_b = _eval_batches(
        lambda: flow_batches(
            eval_view, min(args.batch, len(eval_idx)), seed=123,
            n_cond_frames=0, epochs=1,
        ),
        args.eval_batches,
    )
    t0 = time.time()
    dstate, dlogs = run_flow_training(
        spec.stage0_dit_config(),
        flow_batches(train_view, args.batch, seed=args.seed, n_cond_frames=0),
        dit_cfg_loop,
        eval_batches=deval_b,
    )
    dstate = _best_or_final(dstate, root / "train_dit")
    export_for_inference(
        dstate, ckpt_dir, stage="stage0_dit", compute_dtype=None
    )
    devals = [l for l in dlogs if "eval_loss" in l]
    logger.info(
        "stage0 dit: %d steps in %.0fs; eval flow loss %s -> %s",
        args.dit_steps, time.time() - t0,
        f"{devals[0]['eval_loss']:.4f}" if devals else "n/a",
        f"{min(l['eval_loss'] for l in devals):.4f}" if devals else "n/a",
    )
    (root / "train_dit_log.json").write_text(json.dumps(dlogs))


class _DatasetView:
    """Index-subset view over a ClipWindowDataset (split by uid)."""

    def __init__(self, ds, indices):
        self._ds = ds
        self._indices = indices
        self.window = ds.window

    def __len__(self):
        return len(self._indices)

    def __getitem__(self, i):
        return self._ds[self._indices[i]]


def phase_train(root: Path, args) -> None:
    import jax

    from actionmesh_tpu.training.checkpoint import export_for_inference
    from actionmesh_tpu.training.closed_loop import CascadeSpec
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

    spec = CascadeSpec.load(root / "spec.json")
    ckpt_dir = root / args.ckpt_name
    suffix = "" if args.ckpt_name == "ckpt" else f"_{args.ckpt_name}"

    # -- Stage I: rectified flow -----------------------------------------
    ds = ClipWindowDataset(
        root / "clips_train", window=spec.window, stride=spec.window_stride
    )
    eval_ds = ClipWindowDataset(
        root / "clips_eval", window=spec.window, stride=spec.window_stride
    )
    # train over the full AR conditioning-mask family (1..T-1 prefix)
    batches = flow_batches(
        ds, args.batch, seed=args.seed, n_cond_frames=(1, spec.window - 1)
    )
    eval_b = _eval_batches(
        lambda: flow_batches(
            eval_ds, args.batch, seed=123, n_cond_frames=1, epochs=1
        ),
        args.eval_batches,
    )
    cfg = TrainLoopConfig(
        total_steps=args.flow_steps,
        peak_lr=args.lr,
        warmup_steps=min(200, args.flow_steps // 10),
        ema_decay=0.999,
        p_uncond=0.1,
        eval_every=max(1, args.flow_steps // 20),
        keep_best_eval=True,
        log_every=50,
        ckpt_every=max(100, args.flow_steps // 4),
        out_dir=str(root / f"train_flow{suffix}"),
        seed=args.seed,
    )
    t0 = time.time()
    state, logs = run_flow_training(
        spec.denoiser_config(), batches, cfg, eval_batches=eval_b
    )
    state = _best_or_final(state, root / f"train_flow{suffix}")
    export_for_inference(state, ckpt_dir, stage="flow", compute_dtype=None)
    evals = [l for l in logs if "eval_loss" in l]
    logger.info(
        "flow: %d steps in %.0fs; eval loss %s -> %s",
        args.flow_steps, time.time() - t0,
        f"{evals[0]['eval_loss']:.4f}" if evals else "n/a",
        f"{evals[-1]['eval_loss']:.4f}" if evals else "n/a",
    )
    (root / f"train_flow{suffix}_log.json").write_text(json.dumps(logs))

    # -- Stage II: decoder regression -------------------------------------
    dds = DecoderTrackDataset(
        root / "clips_train", root / "tracks",
        window=spec.window, stride=spec.window_stride,
    )
    deval = DecoderTrackDataset(
        root / "clips_eval", root / "tracks",
        window=spec.window, stride=spec.window_stride,
    )
    dbatches = decoder_batches(
        dds, args.batch, vertex_bucket=spec.track_points, seed=args.seed
    )
    deval_b = _eval_batches(
        lambda: decoder_batches(
            deval, args.batch, vertex_bucket=spec.track_points,
            seed=123, epochs=1,
        ),
        args.eval_batches,
    )
    select_chamfer = getattr(args, "decoder_select_chamfer", False)
    dcfg = TrainLoopConfig(
        total_steps=args.decoder_steps,
        peak_lr=args.lr,
        warmup_steps=min(200, args.decoder_steps // 10),
        ema_decay=None,
        eval_every=max(1, args.decoder_steps // 20),
        keep_best_eval=True,
        best_metric="eval_score" if select_chamfer else "eval_loss",
        track_best_metrics=("eval_loss",) if select_chamfer else (),
        log_every=50,
        ckpt_every=max(100, args.decoder_steps // 4),
        out_dir=str(root / f"train_decoder{suffix}"),
        seed=args.seed,
    )
    t0 = time.time()
    dstate, dlogs = run_decoder_training(
        spec.autoencoder_config(), dbatches, dcfg, eval_batches=deval_b,
        eval_chamfer=select_chamfer,
    )
    if select_chamfer:
        # Three decoder exports from ONE training run: final, chamfer-best
        # (eval_score = eval_cd + eval_motion), MSE-best. All share the
        # flow checkpoint already exported into ckpt_dir above.
        import shutil

        from actionmesh_tpu.training.checkpoint import restore_train_state

        export_for_inference(dstate, ckpt_dir, stage="decoder", compute_dtype=None)
        ddir = root / f"train_decoder{suffix}"
        for best_name, out_name in (
            ("ckpt_best.npz", "ckpt_cd"),
            ("ckpt_best_eval_loss.npz", "ckpt_mse"),
        ):
            src = ddir / best_name
            if not src.exists():
                logger.warning("no %s — skipping %s export", src, out_name)
                continue
            best_state = restore_train_state(src, dstate)
            out = root / out_name
            export_for_inference(best_state, out, stage="decoder", compute_dtype=None)
            shutil.copy(ckpt_dir / "denoiser.npz", out / "denoiser.npz")
    else:
        dstate = _best_or_final(dstate, root / f"train_decoder{suffix}")
        export_for_inference(dstate, ckpt_dir, stage="decoder", compute_dtype=None)
    devals = [l for l in dlogs if "eval_loss" in l]
    logger.info(
        "decoder: %d steps in %.0fs; eval loss %s -> %s",
        args.decoder_steps, time.time() - t0,
        f"{devals[0]['eval_loss']:.5f}" if devals else "n/a",
        f"{devals[-1]['eval_loss']:.5f}" if devals else "n/a",
    )
    (root / f"train_decoder{suffix}_log.json").write_text(json.dumps(dlogs))
    del jax  # imported for backend selection side effect only


def phase_distill(root: Path, args) -> None:
    """Teacher (trained flow ckpt) -> guidance student -> progressive 16->8."""
    from actionmesh_tpu.training.checkpoint import export_for_inference
    from actionmesh_tpu.training.closed_loop import CascadeSpec
    from actionmesh_tpu.training.data import ClipWindowDataset, flow_batches
    from actionmesh_tpu.training.loop import TrainLoopConfig, run_distillation
    from actionmesh_tpu.utils.weights import load_params

    spec = CascadeSpec.load(root / "spec.json")
    teacher = load_params(root / "ckpt" / "denoiser.npz")
    ds = ClipWindowDataset(
        root / "clips_train", window=spec.window, stride=spec.window_stride
    )

    def make_batches(seed):
        return flow_batches(
            ds, args.batch, seed=seed, n_cond_frames=(1, spec.window - 1)
        )

    def loop_cfg(out_name, steps):
        return TrainLoopConfig(
            total_steps=steps,
            peak_lr=args.lr / 2,
            warmup_steps=min(100, steps // 10),
            ema_decay=0.999,
            log_every=50,
            ckpt_every=max(100, steps // 2),
            out_dir=str(root / out_name),
            seed=args.seed,
        )

    # Round 1: guidance distillation (CFG pair -> single conditional fwd)
    t0 = time.time()
    state, _ = run_distillation(
        spec.denoiser_config(),
        teacher,
        make_batches(args.seed),
        loop_cfg("distill_guidance", args.distill_steps),
        mode="guidance",
        guidance_scale=spec.guidance_scale,
    )
    student = state.get("ema_params", state["params"])
    logger.info("guidance distill: %.0fs", time.time() - t0)

    # Round 2: progressive halving (16 -> 8 Euler steps)
    t0 = time.time()
    state, _ = run_distillation(
        spec.denoiser_config(),
        student,
        make_batches(args.seed + 1),
        loop_cfg("distill_progressive", args.distill_steps),
        mode="progressive",
        num_teacher_steps=spec.num_inference_steps,
        teacher_guidance_scale=None,  # teacher is already guidance-free
    )
    logger.info("progressive distill: %.0fs", time.time() - t0)
    export_for_inference(
        state, root / "ckpt_distilled", stage="flow", compute_dtype=None
    )
    # distilled preset shares the trained decoder
    import shutil

    shutil.copy(
        root / "ckpt" / "autoencoder.npz",
        root / "ckpt_distilled" / "autoencoder.npz",
    )

    if args.extra_progressive:
        # Round 3: one more halving (8 -> 4 Euler steps)
        student = state.get("ema_params", state["params"])
        t0 = time.time()
        state, _ = run_distillation(
            spec.denoiser_config(),
            student,
            make_batches(args.seed + 2),
            loop_cfg("distill_progressive4", args.distill_steps),
            mode="progressive",
            num_teacher_steps=spec.num_inference_steps // 2,
            teacher_guidance_scale=None,
        )
        logger.info("progressive distill (8->4): %.0fs", time.time() - t0)
        export_for_inference(
            state, root / "ckpt_distilled4", stage="flow", compute_dtype=None
        )
        shutil.copy(
            root / "ckpt" / "autoencoder.npz",
            root / "ckpt_distilled4" / "autoencoder.npz",
        )


def phase_distill_stage0(root: Path, args) -> None:
    """Distill the trained Stage-0 DiT: guidance round (CFG pair -> one
    conditional forward), then progressive halvings of the anchor
    sampler's Euler steps (spec.stage0_steps 16 -> 8 -> 4).

    The TripoSG DiT IS the Stage-I denoiser at T=1 (models/triposg/dit.py),
    so training/distill.py's recipes apply verbatim over the clips_stage0
    windows (single-frame anchor latents, n_cond_frames=0). Exports
    ckpt_stage0_distilled8 (one halving) and ckpt_stage0_distilled (two),
    each with the stage0 VAE alongside, so `eval --variants video_turbo`
    can build the fully distilled serving cascade (actionmesh_turbo)."""
    import shutil

    from actionmesh_tpu.training.checkpoint import export_for_inference
    from actionmesh_tpu.training.closed_loop import CascadeSpec
    from actionmesh_tpu.training.data import ClipWindowDataset, flow_batches
    from actionmesh_tpu.training.loop import TrainLoopConfig, run_distillation
    from actionmesh_tpu.utils.weights import load_params

    spec = CascadeSpec.load(root / "spec.json")
    split = json.loads((root / "split.json").read_text())
    teacher = load_params(root / "ckpt_stage0" / "dit.npz")
    ds = ClipWindowDataset(root / "clips_stage0", window=1)
    eval_uids = set(split["eval"])
    train_idx = [
        i for i, w in enumerate(ds._windows) if w.clip.stem not in eval_uids
    ]
    train_view = _DatasetView(ds, train_idx)

    def make_batches(seed):
        return flow_batches(
            train_view, min(args.batch, len(train_idx)), seed=seed,
            n_cond_frames=0,
        )

    def loop_cfg(out_name, steps):
        return TrainLoopConfig(
            total_steps=steps,
            peak_lr=args.lr / 2,
            warmup_steps=min(100, steps // 10),
            ema_decay=0.999,
            log_every=50,
            ckpt_every=max(100, steps // 2),
            out_dir=str(root / out_name),
            seed=args.seed,
        )

    def export(state, name):
        out = root / name
        export_for_inference(
            state, out, stage="stage0_dit", compute_dtype=None
        )
        shutil.copy(root / "ckpt_stage0" / "vae.npz", out / "vae.npz")

    dit_cfg = spec.stage0_dit_config()
    # Round 1: guidance distillation at the spec's anchor CFG scale
    t0 = time.time()
    state, _ = run_distillation(
        dit_cfg, teacher, make_batches(args.seed),
        loop_cfg("s0distill_guidance", args.distill_steps),
        mode="guidance", guidance_scale=spec.stage0_guidance,
    )
    student = state.get("ema_params", state["params"])
    logger.info("stage0 guidance distill: %.0fs", time.time() - t0)

    # Round 2: progressive halving (stage0_steps -> /2)
    t0 = time.time()
    state, _ = run_distillation(
        dit_cfg, student, make_batches(args.seed + 1),
        loop_cfg("s0distill_progressive8", args.distill_steps),
        mode="progressive", num_teacher_steps=spec.stage0_steps,
        teacher_guidance_scale=None,
    )
    export(state, "ckpt_stage0_distilled8")
    student = state.get("ema_params", state["params"])
    logger.info("stage0 progressive /2: %.0fs", time.time() - t0)

    # Round 3: one more halving (/2 -> /4)
    t0 = time.time()
    state, _ = run_distillation(
        dit_cfg, student, make_batches(args.seed + 2),
        loop_cfg("s0distill_progressive4", args.distill_steps),
        mode="progressive", num_teacher_steps=spec.stage0_steps // 2,
        teacher_guidance_scale=None,
    )
    export(state, "ckpt_stage0_distilled")
    logger.info("stage0 progressive /4: %.0fs", time.time() - t0)


# Stage-I distilled sampling: 4 or 8 guidance-free Euler steps.
_S1_DISTILLED = {
    "cf_guidance.guidance_at_inference": [[1, 1]],
    "cf_guidance.guidance_scales": [],
}
# Stage-0 distilled sampling (actionmesh_turbo semantics at closed-loop
# scale): guidance-free anchor generation at spec.stage0_steps//4 Euler
# steps. The step count is a None sentinel here and resolved from the
# run's spec inside phase_eval, so --spec stage0_steps=N overrides eval
# the distilled student at the matching step count.
_S0_DISTILLED = {
    "stage_0.num_inference_steps": None,  # -> max(1, spec.stage0_steps // 4)
    "stage_0.guidance_scale": 0.0,
}

VARIANTS = {
    # name -> (ckpt subdir or None, extra config updates[, stage0 subdir])
    # "oracle" feeds ground-truth latents to the trained decoder
    # (closed_loop.run_inference_oracle) — the Stage-II-only ablation.
    "oracle": ("ckpt", {}),
    # chamfer-aware vs MSE-best decoder checkpoint selection (r4g):
    # same flow checkpoint, decoder selected by eval_score / eval_loss.
    "oracle_cd": ("ckpt_cd", {}),
    "oracle_mse": ("ckpt_mse", {}),
    "trained_cd": ("ckpt_cd", {}),
    "trained_mse": ("ckpt_mse", {}),
    "random": (None, {}),
    "trained": ("ckpt", {}),
    # the MAIN video->4D entry: Stage 0 generates the anchor (trained DiT +
    # VAE from the stage0 phase); requires ckpt_stage0 to exist.
    "video": ("ckpt", {}),
    "video_random": (None, {}),
    "trained_short": ("ckpt_short", {}),
    "trained_best": ("ckpt_best", {}),  # best-held-out-eval export
    # final-step flow + best-eval decoder (the decoder is what overfits)
    "trained_mixed": ("ckpt_mixed", {}),
    "distilled": (
        "ckpt_distilled",
        {"scheduler.num_inference_steps": 8, **_S1_DISTILLED},
    ),
    "distilled4": (
        "ckpt_distilled4",
        {"scheduler.num_inference_steps": 4, **_S1_DISTILLED},
    ),
    # distilled students through the MAIN video->4D entry (Stage-0
    # generated anchor + guidance-free short sampling — the fastest
    # serving configuration, quality-scored end-to-end).
    "video_distilled": (
        "ckpt_distilled",
        {"scheduler.num_inference_steps": 8, **_S1_DISTILLED},
    ),
    "video_distilled4": (
        "ckpt_distilled4",
        {"scheduler.num_inference_steps": 4, **_S1_DISTILLED},
    ),
    # Stage-0 distillation ablation: TEACHER Stage I, distilled anchor
    # generator (isolates the distilled Stage 0's quality effect).
    "video_s0distilled": (
        "ckpt",
        dict(_S0_DISTILLED),
        "ckpt_stage0_distilled",
    ),
    # the actionmesh_turbo serving configuration at closed-loop scale:
    # BOTH stages distilled — 4-step guidance-free Stage I + 4-step
    # guidance-free Stage 0 — through the MAIN video->4D entry.
    "video_turbo": (
        "ckpt_distilled4",
        {
            "scheduler.num_inference_steps": 4,
            **_S1_DISTILLED,
            **_S0_DISTILLED,
        },
        "ckpt_stage0_distilled",
    ),
}


def phase_eval(root: Path, args) -> dict:
    from actionmesh_tpu.training.closed_loop import (
        CascadeSpec,
        evaluate_predictions,
        make_pipeline,
        run_inference,
        run_inference_oracle,
        run_inference_video,
    )

    spec = CascadeSpec.load(root / "spec.json")
    uids = json.loads((root / "split.json").read_text())["eval"]
    # once the stage0 phase has run, every variant conditions through the
    # TRAINED VAE (the clips were re-encoded with it)
    default_stage0 = root / "ckpt_stage0"
    default_stage0 = default_stage0 if default_stage0.exists() else None
    report = {}
    for name in args.variants.split(","):
        ckpt_sub, extra, *rest = VARIANTS[name]
        extra = dict(extra)
        # ckpt_stage0_distilled is produced by two progressive halvings
        # (stage0_steps -> //4); resolve its eval step count from the spec.
        if extra.get("stage_0.num_inference_steps", "unset") is None:
            extra["stage_0.num_inference_steps"] = max(1, spec.stage0_steps // 4)
        # optional third element: a variant-specific Stage-0 checkpoint
        # (e.g. the distilled anchor generator) instead of ckpt_stage0
        stage0_dir = root / rest[0] if rest else default_stage0
        ckpt = root / ckpt_sub if ckpt_sub else None
        if ckpt is not None and not ckpt.exists():
            logger.warning("variant %s: no checkpoint at %s — skipped", name, ckpt)
            continue
        if rest and not Path(stage0_dir).exists():
            logger.warning(
                "variant %s: no stage0 checkpoint at %s — skipped",
                name, stage0_dir,
            )
            continue
        t0 = time.time()
        video_mode = name.startswith("video")
        # Fault-isolate each variant: a single scene that produces a
        # degenerate mesh (e.g. an empty isosurface from a weakly trained
        # Stage-0 anchor) must not abort the remaining variants of a
        # multi-hour eval.
        try:
            pipe = make_pipeline(
                spec, ckpt_dir=ckpt, extra_updates=extra,
                stage0_dir=stage0_dir, video_mode=video_mode,
            )
            pred_dir = root / f"pred_{name}"
            if video_mode:
                run_inference_video(
                    root, pipe, uids, pred_dir, spec, seed=args.seed + 44
                )
            elif name.startswith("oracle"):
                run_inference_oracle(
                    root, pipe, uids, pred_dir, spec,
                    build_seed=args.seed, seed=args.seed + 44,
                )
            else:
                run_inference(
                    root, pipe, uids, pred_dir, spec, seed=args.seed + 44
                )
            t_infer = time.time() - t0
            t0 = time.time()
            metrics = evaluate_predictions(
                root, pred_dir, root / f"results_{name}.csv",
                icp_iters=args.icp_iters,
            )
        except Exception:
            logger.exception("variant %s FAILED — continuing", name)
            continue
        metrics["infer_seconds"] = round(t_infer, 1)
        metrics["eval_seconds"] = round(time.time() - t0, 1)
        report[name] = metrics
        logger.info("variant %s: %s", name, metrics)

    out = Path(__file__).resolve().parent.parent / args.report_name
    payload = {
        "spec": json.loads((root / "spec.json").read_text()),
        "n_eval_scenes": len(uids),
        "variants": report,
    }
    if out.exists():  # merge: keep variants from earlier eval invocations
        try:
            prev = json.loads(out.read_text()).get("variants", {})
            payload["variants"] = {**prev, **report}
        except Exception:
            pass
    out.write_text(json.dumps(payload, indent=2))
    logger.info("wrote %s", out)
    return report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "phase",
        choices=[
            "build", "stage0", "train", "distill", "distill-stage0",
            "eval", "all",
        ],
    )
    ap.add_argument("--root", type=str, default="/tmp/closed_loop")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--n-train", type=int, default=48)
    ap.add_argument("--n-eval", type=int, default=8)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--flow-steps", type=int, default=4000)
    ap.add_argument("--decoder-steps", type=int, default=4000)
    ap.add_argument("--distill-steps", type=int, default=1500)
    ap.add_argument("--vae-steps", type=int, default=3000)
    ap.add_argument("--dit-steps", type=int, default=2000)
    ap.add_argument("--vae-query-points", type=int, default=1024)
    ap.add_argument("--kl-weight", type=float, default=1e-4)
    ap.add_argument("--spec", action="append", default=[],
                    help="CascadeSpec field override key=value (build phase)")
    ap.add_argument("--eval-batches", type=int, default=4)
    ap.add_argument("--icp-iters", type=int, default=200)
    ap.add_argument("--variants", type=str, default="random,trained")
    ap.add_argument("--ckpt-name", type=str, default="ckpt",
                    help="checkpoint subdir written by the train phase")
    ap.add_argument("--extra-progressive", action="store_true",
                    help="distill one more halving (8 -> 4 steps)")
    ap.add_argument("--decoder-select-chamfer", action="store_true",
                    help="chamfer-aware decoder checkpoint selection: eval "
                    "with chamfer-proxy metrics, export final / chamfer-best "
                    "/ MSE-best decoders (ckpt, ckpt_cd, ckpt_mse)")
    ap.add_argument("--report-name", type=str, default="CLOSED_LOOP.json")
    args = ap.parse_args()

    root = Path(args.root)
    if args.phase in ("build", "all"):
        phase_build(root, args)
    if args.phase == "stage0":
        phase_stage0(root, args)
    if args.phase in ("train", "all"):
        phase_train(root, args)
    if args.phase == "distill":
        phase_distill(root, args)
    if args.phase == "distill-stage0":
        phase_distill_stage0(root, args)
    if args.phase in ("eval", "all"):
        phase_eval(root, args)


if __name__ == "__main__":
    main()
