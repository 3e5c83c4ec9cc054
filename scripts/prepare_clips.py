#!/usr/bin/env python
"""Prepare Stage-I training clips from videos (self-distillation pass).

Runs the inference pipeline's front half — preprocessing, Stage 0 anchor,
DINOv2 conditioning, Stage-I denoising — over a directory of videos and
writes each result as one training clip npz (training/data.py layout:
``latents`` (T,N,C), ``context`` (T,S,D), ``framestep`` (T,)). The output
directory feeds ``scripts/train.py --stage flow --data-dir`` directly, so
the inference stack doubles as the dataset-preparation pass the
inference-only reference never needed.

Inputs follow the same conventions as the main CLI
(inference/video_to_animated_mesh.py): each clip is a video file or a
directory of frames resolvable by actionmesh_tpu.io.video_input.load_frames.

Example:
  python scripts/prepare_clips.py --input /data/videos --out /data/clips \
      --weights-dir /weights --max-frames 31
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def prepare_clip(pipe, inp, out_path, *, seed: int = 44) -> dict:
    """Run preprocessing + Stage 0 + conditioning + Stage I on one input and
    write the clip npz. Returns a small stats dict."""
    from actionmesh_tpu.io.video_input import ActionMeshInput
    from actionmesh_tpu.training.data import write_clip

    inp = ActionMeshInput(frames=list(inp.frames), timesteps=inp.timesteps.copy())
    inp.frames = pipe.background_removal.process_images(inp.frames)
    inp.frames = pipe.image_process.process_images(inp.frames)

    latent_bank, _ = pipe.init_banks_from_anchor(inp, seed)
    context = pipe.encode_all_frames(inp)  # (T, S, D), input-frame order
    latent_bank = pipe.generate_3d_latents(
        inp, context=context, latent_bank=latent_bank, seed=seed
    )
    latents, ts = latent_bank.get_ordered()  # timestep-sorted
    context = np.asarray(context, dtype=np.float32)
    latents = np.asarray(latents, dtype=np.float32)
    # context rows follow input-frame order; reorder to the bank's sorted
    # timesteps so row t of every array describes the same frame
    order = np.argsort(inp.timesteps.astype(np.float32), kind="stable")
    if not np.allclose(inp.timesteps.astype(np.float32)[order], ts):
        raise RuntimeError(
            f"latent-bank timesteps {ts} do not match input timesteps "
            f"{inp.timesteps} — windowing dropped or duplicated frames"
        )
    write_clip(out_path, latents, context[order], ts)
    return {
        "frames": int(latents.shape[0]),
        "tokens": int(latents.shape[1]),
        "channels": int(latents.shape[2]),
        "context_tokens": int(context.shape[1]),
    }


def iter_inputs(root: Path):
    """Yield clip sources under root: frame-directories (any dir containing
    images) and video files; a root that is itself a clip yields just it."""
    exts = {".mp4", ".mov", ".avi", ".webm", ".mkv", ".gif"}
    img_exts = {".png", ".jpg", ".jpeg", ".webp"}

    def is_frame_dir(d: Path) -> bool:
        return any(f.suffix.lower() in img_exts for f in d.iterdir() if f.is_file())

    if root.is_file():
        yield root
        return
    if is_frame_dir(root):
        yield root
        return
    for child in sorted(root.iterdir()):
        if child.is_file() and child.suffix.lower() in exts:
            yield child
        elif child.is_dir() and is_frame_dir(child):
            yield child


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--input", required=True, help="video file/frame dir, or a directory of them")
    p.add_argument("--out", required=True, help="output clip directory")
    p.add_argument("--config-name", default="actionmesh")
    p.add_argument("--weights-dir", default=None)
    p.add_argument("--max-frames", type=int, default=31)
    p.add_argument("--stage-1-steps", type=int, default=None)
    p.add_argument("--seed", type=int, default=44)
    p.add_argument("--overwrite", action="store_true")
    args = p.parse_args(argv)

    from actionmesh_tpu.io.video_input import load_frames
    from actionmesh_tpu.pipeline import ActionMeshPipeline

    sources = list(iter_inputs(Path(args.input)))
    if not sources:
        print(f"error: no videos or frame dirs under {args.input}", file=sys.stderr)
        return 2
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    pipe = ActionMeshPipeline(
        config_name=args.config_name, weights_dir=args.weights_dir
    )
    if args.stage_1_steps is not None:
        pipe.cfg.scheduler.num_inference_steps = args.stage_1_steps

    done = skipped = failed = 0
    for src in sources:
        out_path = out_dir / f"{src.stem}.npz"
        if out_path.exists() and not args.overwrite:
            skipped += 1
            continue
        t0 = time.perf_counter()
        try:
            inp = load_frames(str(src), max_frames=args.max_frames)
            stats = prepare_clip(pipe, inp, out_path, seed=args.seed)
        except Exception as exc:  # keep sweeping; report at the end
            print(f"FAILED {src.name}: {exc}", file=sys.stderr)
            failed += 1
            continue
        done += 1
        print(
            f"{src.name}: {stats['frames']} frames x {stats['tokens']} tokens "
            f"-> {out_path.name} ({time.perf_counter() - t0:.1f} s)",
            flush=True,
        )
    print(f"prepared {done}, skipped {skipped} existing, failed {failed}")
    return 0 if failed == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
