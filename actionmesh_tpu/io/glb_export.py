"""Animated GLB export via Blender subprocess (dual-role file).

Counterpart of reference actionmesh/io/glb_export.py:18-289. Host side,
``create_animated_glb`` launches ``blender -b -P <this file> -- ...``;
run inside Blender, ``main()`` builds (or imports) the mesh, adds per-frame
shape keys with triangular keyframe weights, and exports Draco-compressed
GLB. When no Blender is available, callers can use the pure-Python
morph-target writer in io/animated_glb.py instead (no external deps, no
Draco).
"""

from __future__ import annotations

import argparse
import logging
import os
import subprocess
import sys

import numpy as np

logger = logging.getLogger(__name__)


def create_animated_glb(
    vertices_npy: str,
    faces_npy: str,
    output_glb: str,
    blender_path: str,
    fps: int = 24,
    export_normals: bool = False,
    input_glb: str | None = None,
) -> int:
    """Launch Blender to build the animated, Draco-compressed GLB.

    With ``input_glb`` set, the GLB is imported first (textures/materials
    preserved) and deformations apply as shape keys on top.
    Returns the Blender process exit code.
    """
    script_path = os.path.abspath(__file__)
    cmd = [
        blender_path, "-b", "-P", script_path, "--",
        "--vertices_npy", os.path.abspath(vertices_npy),
        "--faces_npy", os.path.abspath(faces_npy),
        "--output_glb", os.path.abspath(output_glb),
        "--fps", str(fps),
    ]
    if export_normals:
        cmd.append("--export_normals")
    if input_glb is not None:
        cmd.extend(["--input_glb", os.path.abspath(input_glb)])

    result = subprocess.run(
        cmd, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL
    )
    if result.returncode == 0:
        logger.info("Animated GLB saved to %s", output_glb)
    else:
        logger.warning(
            "Failed to save animated GLB (Blender exit code: %d)",
            result.returncode,
        )
    return result.returncode


# ---------------------------------------------------------------------------
# Blender-side entry (runs inside `blender -b -P thisfile -- ...`)
# ---------------------------------------------------------------------------

def _parse_blender_args():
    parser = argparse.ArgumentParser(
        description="Blender shape-key animation builder"
    )
    parser.add_argument("--vertices_npy", type=str, required=True)
    parser.add_argument("--faces_npy", type=str, required=True)
    parser.add_argument("--output_glb", type=str, required=True)
    parser.add_argument("--fps", type=int, default=24)
    parser.add_argument("--export_normals", action="store_true")
    parser.add_argument("--input_glb", type=str, default=None)
    if "--" in sys.argv:
        return parser.parse_args(sys.argv[sys.argv.index("--") + 1 :])
    parser.print_help()
    sys.exit(1)


def main():
    import bmesh  # noqa: F401  (available only inside Blender)
    import bpy
    from mathutils import Vector

    args = _parse_blender_args()
    vertices = np.load(args.vertices_npy)  # (T, V, 3)
    num_frames, num_vertices, _ = vertices.shape

    bpy.ops.object.select_all(action="SELECT")
    bpy.ops.object.delete()

    if args.input_glb is not None:
        bpy.ops.import_scene.gltf(filepath=args.input_glb)
        obj = next(
            (o for o in bpy.context.scene.objects if o.type == "MESH"), None
        )
        if obj is None:
            print("Error: No mesh found in input GLB", file=sys.stderr)
            sys.exit(1)
        if len(obj.data.vertices) != num_vertices:
            print(
                f"Error: Vertex count mismatch: mesh {len(obj.data.vertices)} "
                f"vs deformations {num_vertices}",
                file=sys.stderr,
            )
            sys.exit(1)
    else:
        import bmesh

        faces = np.load(args.faces_npy)
        mesh = bpy.data.meshes.new("AnimatedMesh")
        obj = bpy.data.objects.new("AnimatedMesh", mesh)
        bpy.context.collection.objects.link(obj)

        bm = bmesh.new()
        for v in vertices[0]:
            bm.verts.new((v[0], v[1], v[2]))
        bm.verts.ensure_lookup_table()
        for face in faces:
            try:
                bm.faces.new([bm.verts[int(i)] for i in face])
            except ValueError:
                pass  # degenerate/duplicate face
        bm.to_mesh(mesh)
        bm.free()
        mesh.update()

        mat = bpy.data.materials.new(name="DefaultMaterial")
        mat.use_nodes = True
        nodes = mat.node_tree.nodes
        links = mat.node_tree.links
        nodes.clear()
        bsdf = nodes.new(type="ShaderNodeBsdfPrincipled")
        bsdf.inputs["Base Color"].default_value = (0.2, 0.4, 0.8, 1.0)
        bsdf.inputs["Metallic"].default_value = 0.1
        bsdf.inputs["Roughness"].default_value = 0.4
        out_node = nodes.new(type="ShaderNodeOutputMaterial")
        links.new(bsdf.outputs["BSDF"], out_node.inputs["Surface"])
        obj.data.materials.append(mat)

    bpy.context.view_layer.objects.active = obj
    obj.select_set(True)
    obj.shape_key_add(name="Basis")

    # Per-frame shape keys with triangular weight ramps
    for frame_idx in range(num_frames):
        shape_key = obj.shape_key_add(name=f"Frame_{frame_idx}")
        frame_verts = vertices[frame_idx]
        for vert_idx in range(num_vertices):
            shape_key.data[vert_idx].co = Vector(frame_verts[vert_idx])
        shape_key.value = 1.0
        shape_key.keyframe_insert(data_path="value", frame=frame_idx)
        if frame_idx > 0:
            shape_key.value = 0.0
            shape_key.keyframe_insert(data_path="value", frame=frame_idx - 1)
        if frame_idx < num_frames - 1:
            shape_key.value = 0.0
            shape_key.keyframe_insert(data_path="value", frame=frame_idx + 1)

    bpy.context.scene.frame_start = 0
    bpy.context.scene.frame_end = num_frames - 1
    bpy.context.scene.render.fps = args.fps

    bpy.ops.export_scene.gltf(
        filepath=args.output_glb,
        export_format="GLB",
        export_texcoords=args.input_glb is not None,
        export_materials="EXPORT",
        export_optimize_animation_size=True,
        export_normals=args.export_normals,
        export_tangents=False,
        export_morph_normal=False,
        export_morph_tangent=False,
        export_draco_mesh_compression_enable=True,
        export_draco_mesh_compression_level=6,
        export_draco_position_quantization=14,
        export_draco_normal_quantization=10,
    )


if __name__ == "__main__":
    main()
