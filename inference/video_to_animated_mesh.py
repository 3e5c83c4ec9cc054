"""CLI: video -> animated 3D mesh (4D).

Counterpart of reference inference/video_to_animated_mesh.py:59-248 with the
same flag surface (--fast/--low_ram/--dtype/--seed/--blender_path + the six
parameter overrides). Differences: runs on TPU via JAX; when Blender is not
provided, the animated GLB is written by the built-in pure-Python
morph-target exporter instead of being skipped.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

from actionmesh_tpu.io.animated_glb import create_animated_glb_native
from actionmesh_tpu.io.glb_export import create_animated_glb
from actionmesh_tpu.io.mesh_io import save_deformation, save_meshes
from actionmesh_tpu.io.video_input import load_frames
from actionmesh_tpu.pipeline import ActionMeshPipeline

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s - %(name)s - %(levelname)s - %(message)s",
)
logger = logging.getLogger(__name__)


def check_blender_available(blender_path: str | None = None) -> bool:
    if blender_path is None:
        logger.info(
            "No Blender path provided — using the built-in morph-target GLB "
            "exporter (pass --blender_path for Draco-compressed export)."
        )
        return False
    if os.path.isfile(blender_path) and os.access(blender_path, os.X_OK):
        return True
    logger.warning(
        "Provided Blender path '%s' is not a valid executable; falling back "
        "to the built-in exporter.",
        blender_path,
    )
    return False


def run_actionmesh(
    pipeline: ActionMeshPipeline,
    input: str,
    output_dir: str,
    seed: int,
    blender_path: str | None = None,
    render: bool = True,
    fps: int = 8,
    stage_0_steps: int | None = None,
    face_decimation: int | None = None,
    floaters_threshold: float | None = None,
    stage_1_steps: int | None = None,
    guidance_scales: list[float] | None = None,
    anchor_idx: int | None = None,
):
    frames_input = load_frames(path=input, max_frames=31)

    meshes = pipeline(
        input=frames_input,
        seed=seed,
        stage_0_steps=stage_0_steps,
        face_decimation=face_decimation,
        floaters_threshold=floaters_threshold,
        stage_1_steps=stage_1_steps,
        guidance_scales=guidance_scales,
        anchor_idx=anchor_idx,
    )

    save_meshes(meshes, output_dir=output_dir)
    vertices_path, faces_path = save_deformation(
        meshes, path=f"{output_dir}/deformations"
    )

    animated_glb_path = f"{output_dir}/animated_mesh.glb"
    if check_blender_available(blender_path):
        create_animated_glb(
            blender_path=blender_path,
            vertices_npy=vertices_path,
            faces_npy=faces_path,
            output_glb=animated_glb_path,
            fps=fps,
        )
    else:
        create_animated_glb_native(
            vertices=np.load(vertices_path),
            faces=np.load(faces_path),
            output_glb=animated_glb_path,
            fps=fps,
        )
        logger.info("Animated GLB saved to %s", animated_glb_path)

    if render:
        try:
            from actionmesh_tpu.render.visualizer import ActionMeshVisualizer

            visualizer = ActionMeshVisualizer(image_size=256)
            visualizer.render(
                meshes,
                input_frames=frames_input.frames,
                output_dir=output_dir,
            )
        except Exception as e:  # rendering is best-effort, never fatal
            logger.warning("Preview rendering skipped: %s", e)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--input", type=str, required=True,
        help="Path to input video (.mp4) or folder containing PNG images.",
    )
    parser.add_argument(
        "--output_dir", type=str, default=None,
        help="Output directory. Default: outputs/<input_name>",
    )
    parser.add_argument("--seed", type=int, default=44)
    parser.add_argument("--blender_path", type=str, default=None)
    parser.add_argument("--fast", action="store_true",
                        help="Fast preset (stage_0=50, stage_1=15).")
    parser.add_argument(
        "--low_ram", action="store_true",
        help="Low-RAM preset: runs the CFG guidance branches sequentially "
        "(split_cfg_batch), halving peak activation memory. The "
        "reference's weight lazy-loading half is a no-op on TPU (weights "
        "stay HBM-resident in bf16; there is no CPU<->GPU residency "
        "dance to elide).")
    parser.add_argument(
        "--distilled", action="store_true",
        help="Distilled preset (8 guidance-free Stage-I steps); requires a "
        "checkpoint from scripts/train.py --stage distill.")
    parser.add_argument(
        "--distilled4", action="store_true",
        help="Distilled-4 preset (4 guidance-free Stage-I steps); requires "
        "a three-round distilled checkpoint (guidance -> halve -> halve).")
    parser.add_argument(
        "--turbo", action="store_true",
        help="Turbo preset: BOTH stages distilled — 4-step guidance-free "
        "Stage I + 25-step guidance-free Stage 0; requires distilled "
        "checkpoints for both stages (scripts/closed_loop.py distill-stage0).")
    parser.add_argument(
        "--dtype", type=str, choices=["bfloat16", "float16", "float32"],
        default="bfloat16",
    )
    parser.add_argument("--no_render", action="store_true")
    parser.add_argument("--stage_0_steps", type=int, default=None)
    parser.add_argument("--face_decimation", type=int, default=None)
    parser.add_argument("--floaters_threshold", type=float, default=None)
    parser.add_argument("--stage_1_steps", type=int, default=None)
    parser.add_argument("--guidance_scales", type=float, nargs="+", default=None)
    parser.add_argument("--anchor_idx", type=int, default=None)
    parser.add_argument(
        "--weights_dir", type=str, default="pretrained_weights",
        help="Directory with converted checkpoints (dev stub if missing).",
    )
    args = parser.parse_args()

    if args.turbo:
        config_name = "actionmesh_turbo"
        logger.info(
            "Turbo preset: 4-step guidance-free Stage I + 25-step "
            "guidance-free Stage 0 (expects distilled checkpoints for "
            "both stages)."
        )
        if args.fast or args.low_ram or args.distilled or args.distilled4:
            logger.warning("--turbo overrides the other preset flags.")
    elif args.distilled4 and args.fast:
        config_name = "actionmesh_distilled4_fast"
        logger.info(
            "Distilled-4 + fast Stage 0 (50 steps): the fastest validated "
            "serving configuration (expects a three-round distilled "
            "checkpoint)."
        )
        if args.low_ram or args.distilled:
            logger.warning("--distilled4 --fast overrides --low_ram/--distilled.")
    elif args.distilled4:
        config_name = "actionmesh_distilled4"
        logger.info(
            "Distilled-4 preset: 4 guidance-free Stage-I steps (expects a "
            "three-round distilled checkpoint)."
        )
        if args.low_ram or args.distilled:
            logger.warning("--distilled4 overrides --low_ram/--distilled.")
    elif args.distilled:
        config_name = "actionmesh_distilled"
        logger.info(
            "Distilled preset: 8 guidance-free Stage-I steps (expects a "
            "distilled checkpoint)."
        )
        if args.fast or args.low_ram:
            logger.warning("--distilled overrides --fast/--low_ram.")
    elif args.fast and args.low_ram:
        config_name = "actionmesh_fast_lowram"
        logger.info("Fast + Low RAM mode enabled.")
    elif args.fast:
        config_name = "actionmesh_fast"
        logger.info("Fast mode enabled: quality might be slightly reduced.")
    elif args.low_ram:
        config_name = "actionmesh_lowram"
        logger.info("Low RAM mode enabled.")
    else:
        config_name = "actionmesh"

    if args.output_dir is None:
        args.output_dir = f"outputs/{Path(args.input).stem}"
        logger.info("Output directory not specified, using: %s", args.output_dir)
    Path(args.output_dir).mkdir(parents=True, exist_ok=True)

    import jax.numpy as jnp

    dtype = {
        "bfloat16": jnp.bfloat16,
        "float16": jnp.float16,
        "float32": jnp.float32,
    }[args.dtype]

    pipeline = ActionMeshPipeline(
        config_name=config_name,
        dtype=dtype,
        lazy_loading=args.low_ram,
        weights_dir=args.weights_dir,
    )

    run_actionmesh(
        pipeline,
        input=args.input,
        output_dir=args.output_dir,
        seed=args.seed,
        blender_path=args.blender_path,
        render=not args.no_render,
        stage_0_steps=args.stage_0_steps,
        face_decimation=args.face_decimation,
        floaters_threshold=args.floaters_threshold,
        stage_1_steps=args.stage_1_steps,
        guidance_scales=args.guidance_scales,
        anchor_idx=args.anchor_idx,
    )


if __name__ == "__main__":
    main()
