"""CLI: {video + 3D mesh} -> animated 3D mesh (4D), topology-preserving.

Counterpart of reference inference/video_and_3d_to_animated_mesh.py:59-281.
Animates a user-supplied .glb over the video; output keeps the input
topology (and, via the Blender path, its textures/materials).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

from actionmesh_tpu.io.animated_glb import create_animated_glb_native
from actionmesh_tpu.io.glb_export import create_animated_glb
from actionmesh_tpu.io.mesh import save_glb
from actionmesh_tpu.io.mesh_io import load_glb, save_deformation, save_meshes
from actionmesh_tpu.io.video_input import load_frames
from actionmesh_tpu.pipeline_with_3d import ActionMeshPipelineWithMeshInput

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s - %(name)s - %(levelname)s - %(message)s",
)
logger = logging.getLogger(__name__)


def check_blender_available(blender_path: str | None = None) -> bool:
    if blender_path is None:
        return False
    return os.path.isfile(blender_path) and os.access(blender_path, os.X_OK)


def run_actionmesh(
    pipeline: ActionMeshPipelineWithMeshInput,
    input: str,
    mesh_input: str,
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

    # Keep the original visual/face data before the pipeline's in-place
    # merge mutates the mesh (reference CLI lines 81-85).
    anchor_mesh = load_glb(mesh_input)
    original_faces = anchor_mesh.faces.copy()
    anchor_visual = anchor_mesh.visual

    meshes = pipeline(
        input=frames_input,
        anchor_mesh=anchor_mesh,
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
        # Re-export the textured anchor so Blender preserves materials.
        from actionmesh_tpu.io.mesh import Mesh

        anchor_for_export = Mesh(
            vertices=meshes[0].vertices,
            faces=original_faces,
            uv=anchor_mesh.uv,
            visual=anchor_visual,
        )
        with tempfile.NamedTemporaryFile(suffix=".glb", delete=False) as tmp:
            save_glb(anchor_for_export, tmp.name)
            tmp_glb_path = tmp.name
        create_animated_glb(
            vertices_npy=str(vertices_path),
            faces_npy=str(faces_path),
            output_glb=animated_glb_path,
            blender_path=blender_path,
            fps=fps,
            input_glb=tmp_glb_path,
        )
        os.remove(tmp_glb_path)
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
        except Exception as e:
            logger.warning("Preview rendering skipped: %s", e)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", type=str, required=True,
                        help="Path to input video or image folder.")
    parser.add_argument("--mesh_input", type=str, required=True,
                        help="Path to the anchor .glb mesh to animate.")
    parser.add_argument("--output_dir", type=str, default=None)
    parser.add_argument("--seed", type=int, default=44)
    parser.add_argument("--blender_path", type=str, default=None)
    parser.add_argument("--fast", action="store_true")
    parser.add_argument("--low_ram", action="store_true")
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
    parser.add_argument("--weights_dir", type=str, default="pretrained_weights")
    args = parser.parse_args()

    if args.fast and args.low_ram:
        config_name = "actionmesh_fast_lowram"
    elif args.fast:
        config_name = "actionmesh_fast"
    elif args.low_ram:
        config_name = "actionmesh_lowram"
    else:
        config_name = "actionmesh"

    if args.output_dir is None:
        args.output_dir = f"outputs/{Path(args.input).stem}"
    Path(args.output_dir).mkdir(parents=True, exist_ok=True)

    import jax.numpy as jnp

    dtype = {
        "bfloat16": jnp.bfloat16,
        "float16": jnp.float16,
        "float32": jnp.float32,
    }[args.dtype]

    pipeline = ActionMeshPipelineWithMeshInput(
        config_name=config_name,
        dtype=dtype,
        lazy_loading=args.low_ram,
        weights_dir=args.weights_dir,
    )

    run_actionmesh(
        pipeline,
        input=args.input,
        mesh_input=args.mesh_input,
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
