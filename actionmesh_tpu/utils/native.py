"""ctypes bindings for the native C++ geometry library (native/).

Auto-builds the shared library on first use if a toolchain is available
(g++ only; no pybind11 in this environment — plain C ABI via ctypes).
Provides: quadric_decimate (QEM mesh simplification, replacing the
reference's fast_simplification C++ dep) and fps_cpu (host-path farthest
point sampling, replacing the fpsample Rust/C dep).
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libactionmesh_native.so"

_lib = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        build = _NATIVE_DIR / "build.sh"
        logger.info("Building native library: %s", build)
        subprocess.run(["bash", str(build)], check=True, capture_output=True)
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.quadric_decimate.restype = ctypes.c_int64
    lib.quadric_decimate.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.farthest_point_sampling_cpu.restype = None
    lib.farthest_point_sampling_cpu.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
    ]
    _lib = lib
    return lib


def quadric_decimate(
    vertices: np.ndarray, faces: np.ndarray, target_faces: int
) -> tuple[np.ndarray, np.ndarray]:
    """QEM edge-collapse decimation to ~target_faces."""
    lib = _load()
    v = np.ascontiguousarray(vertices, np.float64)
    f = np.ascontiguousarray(faces, np.int64)
    out_v = np.empty_like(v)
    out_f = np.empty_like(f)
    out_nv = ctypes.c_int64(0)
    nf = lib.quadric_decimate(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(v),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(f),
        int(target_faces),
        out_v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out_f.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.byref(out_nv),
    )
    return out_v[: out_nv.value].copy(), out_f[:nf].copy()


def fps_cpu(points: np.ndarray, k: int, start: int = 0) -> np.ndarray:
    """Host-path farthest point sampling -> (k,) indices."""
    lib = _load()
    p = np.ascontiguousarray(points, np.float32)
    out = np.empty(k, np.int64)
    lib.farthest_point_sampling_cpu(
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(p), k,
        int(start), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out
