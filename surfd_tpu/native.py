"""ctypes bindings for the native (C++) runtime components.

The shared library is built by native/build.sh into surfd_tpu/_native/.
Loading is lazy and auto-builds on first use if the toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import weakref
from pathlib import Path
from typing import Optional

import numpy as np


def _own(ptr, shape, n_rows):
    """Zero-copy adoption of a C++ malloc'd buffer as a numpy array.

    The returned view keeps the full allocation alive through its base chain;
    surfd_free fires when the last referencing array dies. Copy-free matters:
    mesh buffers are ~60 MB per call and this single-core VM moves memory
    slowly under co-tenant load.
    """
    arr = np.ctypeslib.as_array(ptr, shape=shape)
    weakref.finalize(arr, _load().surfd_free, ctypes.cast(ptr, ctypes.c_void_p))
    return arr[:n_rows]

_LIB: Optional[ctypes.CDLL] = None

_PKG_DIR = Path(__file__).parent
_LIB_PATH = _PKG_DIR / "_native" / "libsurfd_native.so"
_BUILD_SCRIPT = _PKG_DIR.parent / "native" / "build.sh"

# Must match surfd_abi_version() in native/marching.cpp. Bumped on every
# extern "C" signature change: ctypes silently truncates/drops mismatched
# arguments, so calling an old .so through new prototypes would corrupt
# results instead of erroring (ADVICE r4: a stale libsurfd_native.so dropped
# the scatter bias argument — grids were never bias-corrected, no error).
_ABI_VERSION = 5


def _needs_rebuild() -> bool:
    if not _LIB_PATH.exists():
        return True
    src_dir = _BUILD_SCRIPT.parent
    if not src_dir.exists():
        return False
    so_mtime = _LIB_PATH.stat().st_mtime
    return any(
        p.stat().st_mtime > so_mtime
        for pat in ("*.cpp", "*.h")
        for p in src_dir.glob(pat)
    )


def _load() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    if _needs_rebuild():
        if not _BUILD_SCRIPT.exists():
            raise RuntimeError(f"native library missing and no build script at {_BUILD_SCRIPT}")
        subprocess.run(["sh", str(_BUILD_SCRIPT)], check=True, capture_output=True)
    lib = ctypes.CDLL(str(_LIB_PATH))
    try:
        lib.surfd_abi_version.restype = ctypes.c_int64
        abi = int(lib.surfd_abi_version())
    except AttributeError:
        abi = 0  # pre-versioning build
    if abi != _ABI_VERSION:
        # A freshly built library always matches; a mismatch means a stale
        # prebuilt .so with no sources to rebuild from. Refuse loudly rather
        # than call mismatched signatures.
        raise RuntimeError(
            f"libsurfd_native.so ABI {abi} != expected {_ABI_VERSION}; "
            f"rebuild with `sh {_BUILD_SCRIPT}` (sources missing or stale)"
        )
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i8p = ctypes.POINTER(ctypes.c_int8)
    lib.surfd_closest_points.restype = ctypes.c_int
    lib.surfd_closest_points.argtypes = [
        fp, ctypes.c_int64, ip, ctypes.c_int64, fp, ctypes.c_int64, fp, fp, ip,
    ]
    lib.surfd_free.restype = None
    lib.surfd_free.argtypes = [ctypes.c_void_p]
    lib.surfd_mt_active_cubes.restype = ctypes.c_int64
    lib.surfd_mt_active_cubes.argtypes = [
        fp, ctypes.c_int32, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(i64p), ctypes.POINTER(i64p), i64p,
    ]
    lib.surfd_unique_inverse_i64.restype = ctypes.c_int64
    lib.surfd_unique_inverse_i64.argtypes = [i64p, ctypes.c_int64, ctypes.POINTER(i64p), i64p]
    lib.surfd_face_filter_prep.restype = ctypes.c_int64
    lib.surfd_face_filter_prep.argtypes = [
        fp, ctypes.c_int64, i64p, ctypes.c_int64,
        ctypes.POINTER(fp), ctypes.POINTER(i64p),
    ]
    u16p = ctypes.POINTER(ctypes.c_uint16)
    lib.surfd_face_filter_prep_q16.restype = ctypes.c_int64
    lib.surfd_face_filter_prep_q16.argtypes = [
        fp, ctypes.c_int64, i64p, ctypes.c_int64,
        ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(u16p), ctypes.POINTER(i64p),
        ctypes.POINTER(i64p), ctypes.POINTER(i64p),
    ]
    lib.surfd_finalize_mesh.restype = None
    lib.surfd_finalize_mesh.argtypes = [
        fp, ctypes.c_int64, i64p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), i64p,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_float, ctypes.c_int32,
        ctypes.POINTER(fp), i64p, ctypes.POINTER(i64p), i64p,
    ]
    lib.surfd_mt_emit.restype = ctypes.c_int64
    lib.surfd_mt_emit.argtypes = [
        fp, ctypes.c_int32, ctypes.c_float, ctypes.c_float,
        i64p, ctypes.c_int64, i8p,
        ctypes.POINTER(fp), i64p, ctypes.POINTER(i64p), i64p,
    ]
    lib.surfd_finalize_mesh_pre.restype = None
    lib.surfd_finalize_mesh_pre.argtypes = [
        fp, ctypes.c_int64, i64p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), i64p,
        i64p, i64p, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_float, ctypes.c_int32,
        ctypes.POINTER(fp), i64p, ctypes.POINTER(i64p), i64p,
    ]
    lib.surfd_mt_active_cubes_blocks.restype = ctypes.c_int64
    lib.surfd_mt_active_cubes_blocks.argtypes = [
        fp, ctypes.c_int32, ctypes.c_float, ctypes.c_float,
        ip, ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(i64p), ctypes.POINTER(i64p), i64p,
    ]
    lib.surfd_mt_corner_ranks.restype = None
    lib.surfd_mt_corner_ranks.argtypes = [
        i64p, ctypes.c_int64, i64p, ctypes.c_int64, ctypes.c_int32, ip,
    ]
    lib.surfd_scatter_u16_blocks.restype = None
    lib.surfd_scatter_u16_blocks.argtypes = [
        fp, ctypes.c_int32, ip, ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint16), ctypes.c_float, fp, ctypes.c_float,
    ]
    lib.surfd_reset_blocks.restype = None
    lib.surfd_reset_blocks.argtypes = [
        fp, ctypes.c_int32, ip, ctypes.c_int64, ctypes.c_int32, ctypes.c_float,
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


def mt_active_cubes(udf: np.ndarray, near_thr: float, avg_thr: float):
    """(active-cube ids, sorted distinct active-cube corner gids), ONE sweep."""
    lib = _load()
    u = np.ascontiguousarray(udf, dtype=np.float32)
    R = u.shape[0]
    i64p = ctypes.POINTER(ctypes.c_int64)
    out = i64p()
    near = i64p()
    n_near = ctypes.c_int64()
    n = lib.surfd_mt_active_cubes(
        u.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        R, ctypes.c_float(near_thr), ctypes.c_float(avg_thr),
        ctypes.byref(out), ctypes.byref(near), ctypes.byref(n_near),
    )
    nn = int(n_near.value)
    return (
        _own(out, (max(int(n), 1),), int(n)),
        _own(near, (max(nn, 1),), nn),
    )


def mt_active_cubes_blocks(
    udf: np.ndarray, near_thr: float, avg_thr: float,
    scan_blocks: np.ndarray, block: int,
):
    """Block-gated pass 1: identical result to mt_active_cubes, visiting only
    cube anchors inside `scan_blocks` ((S,3) int32 coords at size `block`)."""
    lib = _load()
    u = np.ascontiguousarray(udf, dtype=np.float32)
    sb = np.ascontiguousarray(scan_blocks, dtype=np.int32)
    R = u.shape[0]
    out = ctypes.POINTER(ctypes.c_int64)()
    near = ctypes.POINTER(ctypes.c_int64)()
    n_near = ctypes.c_int64(0)
    n = lib.surfd_mt_active_cubes_blocks(
        u.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        R, ctypes.c_float(near_thr), ctypes.c_float(avg_thr),
        sb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(sb), block,
        ctypes.byref(out), ctypes.byref(near), ctypes.byref(n_near),
    )
    nn = int(n_near.value)
    return (
        _own(out, (max(int(n), 1),), int(n)),
        _own(near, (max(nn, 1),), nn),
    )


def mt_corner_ranks(near_gids: np.ndarray, cube_ids: np.ndarray, R: int) -> np.ndarray:
    """np.searchsorted(near_gids, corner_gids_of(cube_ids)) as 8 linear C++
    merges (each corner column is ascending when cube_ids are sorted).
    Returns (M, 8) int32 ranks."""
    lib = _load()
    near = np.ascontiguousarray(near_gids, dtype=np.int64)
    ids = np.ascontiguousarray(cube_ids, dtype=np.int64)
    out = np.empty((len(ids), 8), np.int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.surfd_mt_corner_ranks(
        near.ctypes.data_as(i64p), len(near),
        ids.ctypes.data_as(i64p), len(ids), R,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def scatter_u16_blocks(
    grid: np.ndarray, ab: np.ndarray, vals: np.ndarray, block: int, scale: float,
    bias: np.ndarray | None = None, clamp_min: float = 0.0,
) -> None:
    """Write (M, B³) u16 blocks into the (R,R,R) f32 grid, dequantizing by
    `scale`, subtracting the per-block surface-bias calibration `bias`
    ((M,) f32, or None for none), and clamping at `clamp_min` ≥ 0 — all in
    the same pass. grid is modified in place."""
    lib = _load()
    assert grid.dtype == np.float32 and grid.flags.c_contiguous
    a = np.ascontiguousarray(ab, dtype=np.int32)
    v = np.ascontiguousarray(vals, dtype=np.uint16)
    fp = ctypes.POINTER(ctypes.c_float)
    if bias is not None:
        b = np.ascontiguousarray(bias, dtype=np.float32)
        assert len(b) == len(a)
        bptr = b.ctypes.data_as(fp)
    else:
        bptr = ctypes.cast(None, fp)
    lib.surfd_scatter_u16_blocks(
        grid.ctypes.data_as(fp), grid.shape[0],
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(a), block,
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), ctypes.c_float(scale),
        bptr, ctypes.c_float(clamp_min),
    )


def reset_blocks(grid: np.ndarray, ab: np.ndarray, block: int, value: float) -> None:
    """Reset (M,) blocks of the (R,R,R) f32 grid to `value` in place."""
    lib = _load()
    assert grid.dtype == np.float32 and grid.flags.c_contiguous
    a = np.ascontiguousarray(ab, dtype=np.int32)
    lib.surfd_reset_blocks(
        grid.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), grid.shape[0],
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(a), block,
        ctypes.c_float(value),
    )


def mt_emit(udf: np.ndarray, lo: float, spacing: float, cube_ids: np.ndarray, g8: np.ndarray):
    """Emit the deduped MT mesh for active cubes (C++, threaded).

    g8: (M, 8, 3) int8 unit gradients at cube corners.
    Returns (verts (V,3) f32, faces (F,3) i64).
    """
    lib = _load()
    u = np.ascontiguousarray(udf, dtype=np.float32)
    R = u.shape[0]
    ids = np.ascontiguousarray(cube_ids, dtype=np.int64)
    g = np.ascontiguousarray(g8, dtype=np.int8)
    fp = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    overts = fp()
    ofaces = i64p()
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    lib.surfd_mt_emit(
        u.ctypes.data_as(fp), R, ctypes.c_float(lo), ctypes.c_float(spacing),
        ids.ctypes.data_as(i64p), len(ids),
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        ctypes.byref(overts), ctypes.byref(nv), ctypes.byref(ofaces), ctypes.byref(nf),
    )
    V, F = int(nv.value), int(nf.value)
    return (
        _own(overts, (max(V, 1), 3), V),
        _own(ofaces, (max(F, 1), 3), F),
    )


def finalize_mesh_pre(
    vertices: np.ndarray,
    faces: np.ndarray,
    ok: np.ndarray,
    einv: np.ndarray,
    ea: np.ndarray,
    eb: np.ndarray,
    fill_holes: bool = True,
    smooth_iters: int = 20,
    lam: float = 0.3,
    merge_decimals: int = 6,
):
    """finalize_mesh reusing the edge structure from face_filter_prep_q16 — the
    filtered mesh's edges come from a linear bincount instead of a second
    radix sort over the face soup."""
    lib = _load()
    v = np.ascontiguousarray(vertices, dtype=np.float32)
    f = np.ascontiguousarray(faces, dtype=np.int64)
    okc = np.ascontiguousarray(ok, dtype=np.uint8)
    ei = np.ascontiguousarray(einv, dtype=np.int64)
    eac = np.ascontiguousarray(ea, dtype=np.int64)
    ebc = np.ascontiguousarray(eb, dtype=np.int64)
    fp = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    overts, ofaces = fp(), i64p()
    nv, nf = ctypes.c_int64(), ctypes.c_int64()
    lib.surfd_finalize_mesh_pre(
        v.ctypes.data_as(fp), len(v), f.ctypes.data_as(i64p), len(f),
        okc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ei.ctypes.data_as(i64p),
        eac.ctypes.data_as(i64p), ebc.ctypes.data_as(i64p), len(eac),
        1 if fill_holes else 0, smooth_iters, ctypes.c_float(lam), merge_decimals,
        ctypes.byref(overts), ctypes.byref(nv), ctypes.byref(ofaces), ctypes.byref(nf),
    )
    V, F = int(nv.value), int(nf.value)
    return (
        _own(overts, (max(V, 1), 3), V),
        _own(ofaces, (max(F, 1), 3), F),
    )


def face_filter_prep(vertices: np.ndarray, faces: np.ndarray):
    """Query points + per-face edge ids for the false-face filter.

    One radix-sorted pass over the face soup (C++): returns
    (pts (V+E, 3) f32 — vertices then unique-edge midpoints, einv (F, 3) i64).
    Fuses the key build / unique / midpoint steps of
    pipelines.generate.filter_faces_by_udf (reference meshudf.py:356-379).
    """
    lib = _load()
    v = np.ascontiguousarray(vertices, dtype=np.float32)
    f = np.ascontiguousarray(faces, dtype=np.int64)
    fp = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    opts = fp()
    oeinv = i64p()
    E = lib.surfd_face_filter_prep(
        v.ctypes.data_as(fp), len(v), f.ctypes.data_as(i64p), len(f),
        ctypes.byref(opts), ctypes.byref(oeinv),
    )
    E = int(E)
    n = len(v) + E
    return (
        _own(opts, (max(n, 1), 3), n),
        _own(oeinv, (max(len(f), 1), 3), len(f)),
    )


def face_filter_prep_q16(vertices: np.ndarray, faces: np.ndarray, qlo: float, qinv: float):
    """Unique-edge midpoints (u16-quantized), per-face edge ids, and the edge
    endpoint lists (ascending (a,b) — consumed by finalize_mesh_pre).

    Companion of face_filter_prep that emits ONLY the midpoints, pre-quantized
    to the 2^16 coords grid — the caller dispatches the vertex queries to the
    device first, so this C++ pass overlaps the tunnel upload + decoder eval.
    Returns (qmids (E,3) u16, einv (F,3) i64, ea (E,) i64, eb (E,) i64).
    """
    lib = _load()
    v = np.ascontiguousarray(vertices, dtype=np.float32)
    f = np.ascontiguousarray(faces, dtype=np.int64)
    fp = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    oq = ctypes.POINTER(ctypes.c_uint16)()
    oeinv, oea, oeb = i64p(), i64p(), i64p()
    E = lib.surfd_face_filter_prep_q16(
        v.ctypes.data_as(fp), len(v), f.ctypes.data_as(i64p), len(f),
        ctypes.c_float(qlo), ctypes.c_float(qinv),
        ctypes.byref(oq), ctypes.byref(oeinv), ctypes.byref(oea), ctypes.byref(oeb),
    )
    E = int(E)
    return (
        _own(oq, (max(E, 1), 3), E),
        _own(oeinv, (max(len(f), 1), 3), len(f)),
        _own(oea, (max(E, 1),), E),
        _own(oeb, (max(E, 1),), E),
    )


def finalize_mesh(
    vertices: np.ndarray,
    faces: np.ndarray,
    ok: np.ndarray,
    einv: np.ndarray,
    fill_holes: bool = True,
    smooth_iters: int = 20,
    lam: float = 0.3,
    merge_decimals: int = 6,
):
    """Fused keep-filter + cleanup (C++): drop faces failing the below-mask,
    remap vertices, fill 3-edge holes, smooth open borders, merge 1e-6
    duplicate vertices. Equivalent to the numpy chain
    filter_faces_by_udf → remove_unreferenced_vertices → stabilize →
    smooth_borders → merge_duplicate_vertices (mesh_ops.py oracle)."""
    lib = _load()
    v = np.ascontiguousarray(vertices, dtype=np.float32)
    f = np.ascontiguousarray(faces, dtype=np.int64)
    okb = np.ascontiguousarray(ok, dtype=np.uint8)
    ei = np.ascontiguousarray(einv, dtype=np.int64)
    assert len(okb) == len(v) + int(ei.max(initial=-1)) + 1 or len(f) == 0
    fp = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    overts = fp()
    ofaces = i64p()
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    lib.surfd_finalize_mesh(
        v.ctypes.data_as(fp), len(v), f.ctypes.data_as(i64p), len(f),
        okb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ei.ctypes.data_as(i64p),
        1 if fill_holes else 0, smooth_iters, ctypes.c_float(lam), merge_decimals,
        ctypes.byref(overts), ctypes.byref(nv), ctypes.byref(ofaces), ctypes.byref(nf),
    )
    V, F = int(nv.value), int(nf.value)
    return (
        _own(overts, (max(V, 1), 3), V),
        _own(ofaces, (max(F, 1), 3), F),
    )


def unique_inverse_i64(keys: np.ndarray):
    """Parallel sorted-unique with inverse (np.unique(..., return_inverse=True)
    equivalent for int64 keys, multithreaded C++)."""
    lib = _load()
    k = np.ascontiguousarray(keys, dtype=np.int64)
    inv = np.empty(len(k), np.int64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    out = i64p()
    n = lib.surfd_unique_inverse_i64(
        k.ctypes.data_as(i64p), len(k), ctypes.byref(out), inv.ctypes.data_as(i64p)
    )
    try:
        uniq = np.ctypeslib.as_array(out, shape=(max(int(n), 1),))[: int(n)].copy()
    finally:
        lib.surfd_free(out)
    return uniq, inv
