#!/usr/bin/env python
"""Train an ActionMesh-TPU stage from the command line.

The reference is inference-only; this driver exposes the framework's SPMD
training subsystem (actionmesh_tpu/training/) end to end: clip-directory
datasets with async device prefetch, rectified-flow (Stage I) or masked
position MSE (Stage II) steps, warmup+cosine AdamW, EMA, JSONL loss logs,
and atomic resumable checkpoints.

Examples
--------
Smoke-train a tiny Stage-I denoiser on synthetic clips (CPU-friendly):
  python scripts/train.py --stage flow --synthetic --size tiny \
      --steps 50 --batch 2 --out /tmp/flow_run

Train at production size on a dp2 x tp4 mesh from a prepared clip dir
(each .npz: latents (T,N,C), context (T,S,D), framestep (T,) — the
layout ActionMeshPipeline Stage I consumes; see training/data.py):
  python scripts/train.py --stage flow --data-dir /data/clips \
      --window 16 --batch 2 --mesh dp=2,tp=4 --compute-dtype bfloat16

Stage II (decoder) trains from clip latents paired with tracked vertex
surfaces in the ActionBench ground-truth layout
(tracks_dir/{uid}/surfaces.npy, (T,V,6), positions in (-1,1)):
  python scripts/train.py --stage decoder --data-dir /data/clips \
      --tracks-dir /data/gt --window 8 --batch 2
"""

from __future__ import annotations

import argparse
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def parse_mesh(spec: str):
    """'dp=2,tp=4[,sp=2]' -> make_mesh kwargs."""
    kwargs = {}
    for part in spec.split(","):
        axis, _, size = part.partition("=")
        if axis not in ("dp", "tp", "sp") or not size.isdigit():
            raise argparse.ArgumentTypeError(
                f"bad mesh spec {spec!r}; expected e.g. dp=2,tp=4"
            )
        kwargs[axis] = int(size)
    return kwargs


def build_args() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument(
        "--stage", choices=("flow", "decoder", "distill"), default="flow"
    )
    p.add_argument(
        "--model", choices=("denoiser", "stage0"), default="denoiser",
        help="flow/distill stages: the Stage-I temporal denoiser (default) "
        "or the Stage-0 TripoSG DiT (T=1 anchor-latent windows, teacher "
        "dit.npz, exports dit.npz) — e.g. --stage distill --model stage0 "
        "produces the guidance-free short-schedule Stage-0 checkpoint the "
        "actionmesh_turbo preset serves",
    )
    p.add_argument(
        "--distill-mode",
        choices=("guidance", "progressive"),
        default="guidance",
        help="distill stage: collapse the CFG pair (guidance) or halve the "
        "Euler step count (progressive); chain progressive rounds over even "
        "counts, e.g. 16 -> 8 -> 4 (odd teacher counts are rejected)",
    )
    p.add_argument(
        "--teacher",
        help="distill stage: directory containing denoiser.npz "
        "(export_for_inference layout); omit with --synthetic to distill "
        "a random teacher (smoke tests)",
    )
    p.add_argument(
        "--guidance-scale",
        type=float,
        default=7.5,
        help="distill stage (guidance mode): teacher CFG scale to bake in",
    )
    p.add_argument(
        "--teacher-steps",
        type=int,
        default=30,
        help="distill stage (progressive mode): teacher schedule length "
        "(student learns the half-length schedule)",
    )
    p.add_argument("--data-dir", help="directory of clip .npz files")
    p.add_argument(
        "--tracks-dir",
        help="decoder stage: directory of {uid}/surfaces.npy vertex tracks "
        "(ActionBench GT layout) paired with --data-dir clips by uid",
    )
    p.add_argument(
        "--vertex-bucket",
        type=int,
        default=4096,
        help="decoder stage: pad per-mesh vertex counts to this bucket",
    )
    p.add_argument(
        "--synthetic",
        action="store_true",
        help="train on generated synthetic data (smoke tests, benchmarks)",
    )
    p.add_argument(
        "--size",
        choices=("tiny", "production"),
        default="tiny",
        help="model architecture preset",
    )
    p.add_argument("--window", type=int, default=8, help="frames per example")
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warmup", type=int, default=None, help="default: steps//10")
    p.add_argument("--clip-norm", type=float, default=1.0)
    p.add_argument(
        "--grad-accum",
        type=int,
        default=1,
        help="average gradients over N micro-batches per optimizer update",
    )
    p.add_argument(
        "--eval-fraction",
        type=float,
        default=0.0,
        help="hold out this fraction of windows for eval (0 = off)",
    )
    p.add_argument(
        "--eval-every", type=int, default=100, help="eval cadence in steps"
    )
    p.add_argument(
        "--eval-batches", type=int, default=4, help="held-out batches to average"
    )
    p.add_argument(
        "--profile-steps",
        metavar="A:B",
        default=None,
        help="capture a jax.profiler trace over micro-steps [A, B)",
    )
    p.add_argument("--weight-decay", type=float, default=0.01)
    p.add_argument("--ema-decay", type=float, default=0.999)
    p.add_argument("--p-uncond", type=float, default=0.1)
    p.add_argument("--compute-dtype", choices=("bfloat16",), default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--ckpt-every", type=int, default=500)
    p.add_argument("--out", default="train_out")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument(
        "--export-inference",
        metavar="DIR",
        help="after training, export the (EMA) params as a native inference "
        "checkpoint loadable by ActionMeshPipeline.load_native",
    )
    p.add_argument(
        "--mesh",
        type=parse_mesh,
        default=None,
        help="shard over a device mesh, e.g. dp=2,tp=4 (omit: single device)",
    )
    return p


def flow_model_config(size: str, model: str = "denoiser"):
    from actionmesh_tpu.models.denoiser import DenoiserConfig

    if model == "stage0":
        # The Stage-0 TripoSG DiT is the denoiser at T=1 (models/triposg/
        # dit.py) — the same flow/distill machinery trains it over
        # single-frame anchor-latent windows.
        from actionmesh_tpu.models.triposg.dit import triposg_dit_config

        if size == "production":
            return triposg_dit_config()
        return triposg_dit_config(
            num_tokens=8,
            in_channels=4,
            num_layers=3,
            num_attention_heads=4,
            width=32,
            cross_attention_dim=16,
        )
    if size == "production":
        return DenoiserConfig()
    return DenoiserConfig(
        num_tokens_nominal=8,
        temporal_context_size=8,
        in_channels=4,
        num_layers=3,
        num_attention_heads=4,
        width=32,
        mlp_ratio=2.0,
        cross_attention_dim=16,
        inflated_layers=(0, 1, 2),
    )


def decoder_model_config(size: str):
    from actionmesh_tpu.models.autoencoder import AutoencoderConfig

    if size == "production":
        return AutoencoderConfig()
    return AutoencoderConfig(
        temporal_context_size=8,
        latent_channels=4,
        width=32,
        num_layers=2,
        num_attention_heads=4,
    )


def synthetic_decoder_batches(batch: int, seed: int, T=4, N=8, C=4, T_out=3, V=16):
    """Endless synthetic decoder batches: smooth per-vertex tracks with
    two padded bucket rows per sample (exercises the vertex mask)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    while True:
        alphas = np.linspace(0.25, 1.0, T_out, dtype=np.float32)
        query = rng.uniform(-1, 1, (batch, V, 6)).astype(np.float32)
        drift = rng.normal(size=(batch, 1, V, 3)).astype(np.float32) * 0.2
        positions = np.tanh(
            query[:, None, :, :3] + drift * alphas[None, :, None, None]
        ).astype(np.float32)
        mask = np.ones((batch, V), np.float32)
        mask[:, -2:] = 0.0
        yield {
            "latents": rng.normal(size=(batch, T, N, C)).astype(np.float32),
            "framestep": np.tile(
                np.arange(T, dtype=np.float32)[None], (batch, 1)
            ),
            "source_alpha": np.zeros((batch,), np.float32),
            "target_alphas": np.tile(alphas[None], (batch, 1)),
            "query": query,
            "positions": positions,
            "vertex_mask": mask,
        }


def main(argv=None) -> int:
    args = build_args().parse_args(argv)
    if not args.synthetic and not args.data_dir:
        print("error: pass --data-dir or --synthetic", file=sys.stderr)
        return 2
    if args.stage == "decoder" and not args.synthetic and not args.tracks_dir:
        print(
            "error: decoder stage needs --tracks-dir (ActionBench-layout "
            "vertex tracks) alongside --data-dir, or --synthetic",
            file=sys.stderr,
        )
        return 2

    from actionmesh_tpu.parallel.mesh import make_mesh
    from actionmesh_tpu.training.loop import (
        TrainLoopConfig,
        run_decoder_training,
        run_flow_training,
    )

    profile_steps = None
    if args.profile_steps:
        a, _, b = args.profile_steps.partition(":")
        profile_steps = (int(a), int(b))
    loop_cfg = TrainLoopConfig(
        total_steps=args.steps,
        peak_lr=args.lr,
        warmup_steps=args.warmup if args.warmup is not None else args.steps // 10,
        clip_norm=args.clip_norm,
        weight_decay=args.weight_decay,
        grad_accum=args.grad_accum,
        ema_decay=args.ema_decay,
        p_uncond=args.p_uncond,
        compute_dtype=args.compute_dtype,
        seed=args.seed,
        log_every=args.log_every,
        ckpt_every=args.ckpt_every,
        eval_every=args.eval_every,
        out_dir=args.out,
        resume=not args.no_resume,
        profile_steps=profile_steps,
    )
    mesh = make_mesh(**args.mesh) if args.mesh else None

    def echo(rec):
        if "eval_loss" in rec:
            print(f"step {rec['step']:6d}  EVAL loss {rec['eval_loss']:.6f}", flush=True)
            return
        print(
            f"step {rec['step']:6d}  loss {rec['loss']:.6f}"
            + (
                f"  ({rec['stage_steps_per_s']:.2f} steps/s)"
                if rec.get("stage_steps_per_s")
                else ""
            ),
            flush=True,
        )

    if args.stage in ("flow", "distill"):
        from actionmesh_tpu.training.data import (
            ClipWindowDataset,
            flow_batches,
            synthesize_clip_dir,
        )

        model_cfg = flow_model_config(args.size, args.model)
        # Stage-0 DiT: single-frame windows, no conditioning prefix (an
        # anchor latent has no banked frames to condition on)
        if args.model == "stage0":
            args.window = 1
        # Inference AR windows condition on 1..window-1 banked frames (the
        # tail window clamps, pipeline chunk_right), so TRAINING must cover
        # that whole mask family, matching the closed-loop driver; eval
        # batches pin n_cond=1 for a stable comparable metric (r5 review).
        n_cond = 0 if args.model == "stage0" else (
            (1, args.window - 1) if args.window > 2 else 1
        )
        n_cond_eval = 0 if args.model == "stage0" else 1
        if args.synthetic:
            data_dir = synthesize_clip_dir(
                Path(tempfile.mkdtemp(prefix="am_synth_clips_")),
                n_clips=max(4, args.batch * 2),
                frames=max(args.window, 8),
                tokens=model_cfg.num_tokens_nominal,
                channels=model_cfg.in_channels,
                context_dim=model_cfg.cross_attention_dim,
                seed=args.seed,
            )
        else:
            data_dir = Path(args.data_dir)
        dataset = ClipWindowDataset(data_dir, window=args.window)
        eval_set = None
        if args.eval_fraction > 0:
            from actionmesh_tpu.training.data import split_windows
            import itertools

            dataset, eval_ds = split_windows(
                dataset, args.eval_fraction, seed=args.seed
            )
            eval_set = list(
                itertools.islice(
                    flow_batches(
                        eval_ds, min(args.batch, len(eval_ds)), seed=0,
                        epochs=1, n_cond_frames=n_cond_eval,
                    ),
                    args.eval_batches,
                )
            )
        print(
            f"flow training: {len(dataset)} windows "
            f"({dataset.skipped_clips} clips too short), batch {args.batch}, "
            f"{args.steps} steps -> {args.out}"
            + (f", eval on {len(eval_set)} held-out batches" if eval_set else "")
        )
        batches = flow_batches(
            dataset, args.batch, seed=args.seed, n_cond_frames=n_cond
        )
        if args.stage == "distill":
            import jax

            from actionmesh_tpu.training.loop import run_distillation

            if args.teacher:
                from actionmesh_tpu.utils.weights import load_params

                teacher_file = (
                    "dit.npz" if args.model == "stage0" else "denoiser.npz"
                )
                teacher = load_params(Path(args.teacher) / teacher_file)
            elif args.synthetic:
                from actionmesh_tpu.models.denoiser import init_denoiser

                teacher = init_denoiser(
                    jax.random.key(args.seed + 7), model_cfg
                )
            else:
                print(
                    "error: distill stage needs --teacher (or --synthetic)",
                    file=sys.stderr,
                )
                return 2
            print(
                f"distillation ({args.distill_mode}): "
                + (
                    f"CFG scale {args.guidance_scale} -> single forward"
                    if args.distill_mode == "guidance"
                    else f"{args.teacher_steps} -> {args.teacher_steps // 2} steps"
                )
            )
            state, history = run_distillation(
                model_cfg,
                teacher,
                batches,
                loop_cfg,
                mode=args.distill_mode,
                guidance_scale=args.guidance_scale,
                num_teacher_steps=args.teacher_steps,
                mesh=mesh,
                on_log=echo,
                eval_batches=eval_set,
            )
        else:
            state, history = run_flow_training(
                model_cfg,
                batches,
                loop_cfg,
                mesh=mesh,
                on_log=echo,
                eval_batches=eval_set,
            )
    else:
        model_cfg = decoder_model_config(args.size)
        eval_set = None
        if args.synthetic:
            print(
                f"decoder training (synthetic): batch {args.batch}, "
                f"{args.steps} steps -> {args.out}"
            )
            batches = synthetic_decoder_batches(args.batch, args.seed)
        else:
            from actionmesh_tpu.training.data import (
                DecoderTrackDataset,
                decoder_batches,
            )

            dataset = DecoderTrackDataset(
                args.data_dir, args.tracks_dir, window=args.window
            )
            if args.eval_fraction > 0:
                from actionmesh_tpu.training.data import split_windows
                import itertools

                dataset, eval_ds = split_windows(
                    dataset, args.eval_fraction, seed=args.seed
                )
                eval_set = list(
                    itertools.islice(
                        decoder_batches(
                            eval_ds,
                            min(args.batch, len(eval_ds)),
                            vertex_bucket=args.vertex_bucket,
                            seed=0,
                            epochs=1,
                        ),
                        args.eval_batches,
                    )
                )
            print(
                f"decoder training: {len(dataset)} windows "
                f"({dataset.skipped_clips} clips too short), batch "
                f"{args.batch}, bucket {args.vertex_bucket}, "
                f"{args.steps} steps -> {args.out}"
            )
            batches = decoder_batches(
                dataset,
                args.batch,
                vertex_bucket=args.vertex_bucket,
                seed=args.seed,
            )
        state, history = run_decoder_training(
            model_cfg,
            batches,
            loop_cfg,
            mesh=mesh,
            on_log=echo,
            eval_batches=eval_set,
        )

    if args.export_inference:
        from actionmesh_tpu.training.checkpoint import export_for_inference

        stage_name = "flow" if args.stage == "distill" else args.stage
        if args.model == "stage0" and stage_name == "flow":
            stage_name = "stage0_dit"
        out = export_for_inference(
            state,
            args.export_inference,
            stage=stage_name,
        )
        print(f"exported inference checkpoint: {out}")

    train_losses = [h["loss"] for h in history if "loss" in h]
    final = train_losses[-1] if train_losses else float("nan")
    print(f"done: step {int(state['step'])}, final loss {final:.6f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
