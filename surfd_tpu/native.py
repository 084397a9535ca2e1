"""ctypes bindings for the native (C++) runtime components.

The shared library is built by native/build.sh into surfd_tpu/_native/.
Loading is lazy and auto-builds on first use if the toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None

_PKG_DIR = Path(__file__).parent
_LIB_PATH = _PKG_DIR / "_native" / "libsurfd_native.so"
_BUILD_SCRIPT = _PKG_DIR.parent / "native" / "build.sh"


def _load() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    if not _LIB_PATH.exists():
        if not _BUILD_SCRIPT.exists():
            raise RuntimeError(f"native library missing and no build script at {_BUILD_SCRIPT}")
        subprocess.run(["sh", str(_BUILD_SCRIPT)], check=True, capture_output=True)
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.surfd_closest_points.restype = ctypes.c_int
    lib.surfd_closest_points.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
    ]
    _LIB = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def closest_points(vertices: np.ndarray, triangles: np.ndarray, queries: np.ndarray):
    """Distance + closest point + triangle id for each query (BVH, C++).

    Replaces open3d RaycastingScene.compute_closest_points
    (/root/reference/AutoEncoder/utils.py:223-240).
    """
    lib = _load()
    v = np.ascontiguousarray(vertices, dtype=np.float32)
    t = np.ascontiguousarray(triangles, dtype=np.int32)
    q = np.ascontiguousarray(queries, dtype=np.float32)
    Q = len(q)
    out_d = np.empty(Q, np.float32)
    out_c = np.empty((Q, 3), np.float32)
    out_t = np.empty(Q, np.int32)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    rc = lib.surfd_closest_points(
        v.ctypes.data_as(fp), len(v),
        t.ctypes.data_as(ip), len(t),
        q.ctypes.data_as(fp), Q,
        out_d.ctypes.data_as(fp), out_c.ctypes.data_as(fp), out_t.ctypes.data_as(ip),
    )
    if rc != 0:
        raise RuntimeError(f"surfd_closest_points failed with code {rc}")
    return out_d, out_c, out_t
