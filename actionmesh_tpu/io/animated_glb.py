"""Native animated-GLB writer: morph targets + triangular keyframe weights.

Improvement over the reference, which requires a Blender 3.5.1 subprocess
to produce the animated GLB (reference: actionmesh/io/glb_export.py:18-86).
glTF 2.0 supports per-frame morph targets natively, so this pure-Python
writer produces the same shape-key animation (triangular weight ramps, one
morph target per frame) with no external dependency. The Blender path
(io/glb_export.py) remains available for texture-preserving import of an
input GLB.
"""

from __future__ import annotations

import json
import struct
from pathlib import Path

import numpy as np

_GLB_MAGIC = 0x46546C67
_CHUNK_JSON = 0x4E4F534A
_CHUNK_BIN = 0x004E4942


def _pad4(b: bytes, fill: bytes = b"\x00") -> bytes:
    return b + fill * ((-len(b)) % 4)


def create_animated_glb_native(
    vertices: np.ndarray,
    faces: np.ndarray,
    output_glb: str | Path,
    fps: int = 24,
) -> None:
    """Write an animated GLB with one morph target per frame.

    Args:
        vertices (T, V, 3): per-frame vertex positions (frame 0 = base).
        faces (F, 3): shared triangle indices.
        output_glb: destination path.
        fps: playback rate; frame i shows at time i/fps.
    """
    vertices = np.asarray(vertices, np.float32)
    faces = np.asarray(faces, np.uint32)
    T, V, _ = vertices.shape

    base = vertices[0]
    deltas = vertices - base[None]  # morph targets are deltas from base

    blobs: list[bytes] = []
    views: list[dict] = []
    accessors: list[dict] = []
    offset = 0

    def add_blob(data: np.ndarray, target=None) -> int:
        nonlocal offset
        raw = _pad4(np.ascontiguousarray(data).tobytes())
        view = {"buffer": 0, "byteOffset": offset, "byteLength": len(raw)}
        if target is not None:
            view["target"] = target
        views.append(view)
        blobs.append(raw)
        offset += len(raw)
        return len(views) - 1

    def add_accessor(view_idx, component, count, type_, mn=None, mx=None) -> int:
        acc = {
            "bufferView": view_idx,
            "componentType": component,
            "count": count,
            "type": type_,
        }
        if mn is not None:
            acc["min"] = mn
        if mx is not None:
            acc["max"] = mx
        accessors.append(acc)
        return len(accessors) - 1

    # base positions + indices
    pos_acc = add_accessor(
        add_blob(base, 34962), 5126, V, "VEC3",
        base.min(0).tolist(), base.max(0).tolist(),
    )
    idx_acc = add_accessor(add_blob(faces.reshape(-1), 34963), 5125, faces.size,
                           "SCALAR")

    # morph targets (positions deltas), one per frame
    target_accs = []
    for t in range(T):
        d = deltas[t]
        target_accs.append(
            add_accessor(
                add_blob(d, 34962), 5126, V, "VEC3",
                d.min(0).tolist(), d.max(0).tolist(),
            )
        )

    # animation: times + weight matrix (T keyframes x T targets),
    # triangular ramps = frame t has weight 1 at time t, 0 at t±1
    times = (np.arange(T, dtype=np.float32) / fps)
    weights = np.eye(T, dtype=np.float32).reshape(-1)
    time_acc = add_accessor(
        add_blob(times), 5126, T, "SCALAR",
        [float(times.min())], [float(times.max())],
    )
    weight_acc = add_accessor(add_blob(weights), 5126, T * T, "SCALAR")

    binary = _pad4(b"".join(blobs))
    gltf = {
        "asset": {"version": "2.0", "generator": "actionmesh_tpu"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [
            {
                "primitives": [
                    {
                        "attributes": {"POSITION": pos_acc},
                        "indices": idx_acc,
                        "mode": 4,
                        "targets": [{"POSITION": a} for a in target_accs],
                    }
                ],
                "weights": [1.0] + [0.0] * (T - 1),
            }
        ],
        "animations": [
            {
                "samplers": [
                    {
                        "input": time_acc,
                        "interpolation": "LINEAR",
                        "output": weight_acc,
                    }
                ],
                "channels": [
                    {
                        "sampler": 0,
                        "target": {"node": 0, "path": "weights"},
                    }
                ],
            }
        ],
        "buffers": [{"byteLength": len(binary)}],
        "bufferViews": views,
        "accessors": accessors,
    }

    json_chunk = _pad4(json.dumps(gltf, separators=(",", ":")).encode(), b" ")
    total = 12 + 8 + len(json_chunk) + 8 + len(binary)
    with open(output_glb, "wb") as f:
        f.write(struct.pack("<III", _GLB_MAGIC, 2, total))
        f.write(struct.pack("<II", len(json_chunk), _CHUNK_JSON))
        f.write(json_chunk)
        f.write(struct.pack("<II", len(binary), _CHUNK_BIN))
        f.write(binary)
