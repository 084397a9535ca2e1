"""Mesh cleanup operations, dependency-free numpy.

Replaces the specific trimesh / pymeshlab / scipy functionality the reference
uses (SURVEY.md §2.11 items 5-7):
  * trimesh process/dedup/degenerate/fill-holes loop
    (/root/reference/meshudf/meshudf.py:381-402)
  * border detection + border Laplacian smoothing via scipy sparse
    (/root/reference/meshudf/meshudf.py:404-434, λ=0.3, 20 iters)
  * pymeshlab Laplacian smoothing + small-component removal
    (/root/reference/sample/generate_uncond.py:117-122)

All ops take/return the `Mesh` NamedTuple from marching.py and use
np.add.at segment-sums instead of sparse matrices.
"""

from __future__ import annotations

import numpy as np

from .marching import Mesh


def merge_duplicate_vertices(mesh: Mesh, decimals: int = 6) -> Mesh:
    """Merge vertices equal after rounding; drop collapsed faces.

    Coordinates are packed into one collision-free int64 key (21 bits per
    axis at 10^-decimals quantization): unique on a 1-D integer array sorts
    ~10× faster than a row lexsort. Requires |coord| < 2^20 · 10^-decimals
    (≈ ±1.05 at the default — meshes here live in [-1, 1]³).
    """
    if len(mesh.vertices) == 0:
        return mesh
    scale = 10.0**decimals
    q = np.round(mesh.vertices.astype(np.float64) * scale).astype(np.int64) + (1 << 20)
    assert q.min() >= 0 and q.max() < (1 << 21), "vertices out of packable range"
    key = (q[:, 0] << 42) | (q[:, 1] << 21) | q[:, 2]
    uniq, inv = _unique_i64(key)
    # first occurrence of each unique key (order within sorted-unique ids)
    first = np.zeros(len(uniq), np.int64)
    first[inv[::-1]] = np.arange(len(key) - 1, -1, -1)
    verts = mesh.vertices[first]
    faces = inv[mesh.faces]
    return remove_degenerate_faces(Mesh(verts, faces))


def remove_degenerate_faces(mesh: Mesh, area_eps: float = 0.0) -> Mesh:
    """Drop faces with repeated indices or (optionally) ~zero area."""
    f = mesh.faces
    if len(f) == 0:
        return mesh
    keep = (f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2]) & (f[:, 0] != f[:, 2])
    if area_eps > 0:
        v = mesh.vertices
        n = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
        keep &= 0.5 * np.linalg.norm(n, axis=1) > area_eps
    return Mesh(mesh.vertices, f[keep])


def remove_duplicate_faces(mesh: Mesh) -> Mesh:
    """Drop repeated faces regardless of winding/rotation."""
    if len(mesh.faces) == 0:
        return mesh
    s = np.sort(mesh.faces, axis=1)
    NV = len(mesh.vertices) + 1
    key = (s[:, 0] * NV + s[:, 1]) * NV + s[:, 2]
    uniq, inv = _unique_i64(key)
    idx = np.zeros(len(uniq), np.int64)
    idx[inv[::-1]] = np.arange(len(key) - 1, -1, -1)
    return Mesh(mesh.vertices, mesh.faces[np.sort(idx)])


def remove_unreferenced_vertices(mesh: Mesh) -> Mesh:
    if len(mesh.faces) == 0:
        return Mesh(np.zeros((0, 3), np.float32), mesh.faces)
    used = np.unique(mesh.faces)
    remap = -np.ones(len(mesh.vertices), dtype=np.int64)
    remap[used] = np.arange(len(used))
    return Mesh(mesh.vertices[used], remap[mesh.faces])


def face_components(faces: np.ndarray, num_vertices: int) -> np.ndarray:
    """Connected-component label per face (sparse graph over shared vertices)."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components

    if len(faces) == 0:
        return np.zeros(0, np.int64)
    rows = np.concatenate([faces[:, 0], faces[:, 1]])
    cols = np.concatenate([faces[:, 1], faces[:, 2]])
    data = np.ones(len(rows), np.int8)
    g = coo_matrix((data, (rows, cols)), shape=(num_vertices, num_vertices))
    _, vlabels = connected_components(g, directed=False)
    _, labels = np.unique(vlabels[faces[:, 0]], return_inverse=True)
    return labels


def filter_small_components(mesh: Mesh, min_faces: int) -> Mesh:
    """pymeshlab `meshing_remove_connected_component_by_face_number` equivalent
    (reference sample/generate_uncond.py:118-121, mincomponentsize=2500)."""
    if len(mesh.faces) == 0:
        return mesh
    labels = face_components(mesh.faces, len(mesh.vertices))
    counts = np.bincount(labels)
    keep = counts[labels] >= min_faces
    return remove_unreferenced_vertices(Mesh(mesh.vertices, mesh.faces[keep]))


def keep_largest_component(mesh: Mesh, by_bbox: bool = False) -> Mesh:
    """Keep one component: most faces, or largest bounding-box diagonal
    (the reference watertight path keeps max-bbox,
    sample/generate_image.py:160-166)."""
    if len(mesh.faces) == 0:
        return mesh
    labels = face_components(mesh.faces, len(mesh.vertices))
    n = labels.max() + 1
    if by_bbox:
        best, best_diag = 0, -1.0
        for c in range(n):
            vs = mesh.vertices[np.unique(mesh.faces[labels == c])]
            diag = float(np.linalg.norm(vs.max(0) - vs.min(0)))
            if diag > best_diag:
                best, best_diag = c, diag
    else:
        best = int(np.bincount(labels).argmax())
    return remove_unreferenced_vertices(Mesh(mesh.vertices, mesh.faces[labels == best]))


def _edges_of(faces: np.ndarray) -> np.ndarray:
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], axis=0)
    return np.sort(e, axis=1)


def _unique_i64(keys: np.ndarray):
    """Sorted unique + inverse, via the native radix sort when available."""
    from .. import native

    if len(keys) > 100_000 and native.available():
        return native.unique_inverse_i64(keys)
    uniq, inv = np.unique(keys, return_inverse=True)
    return uniq, inv.ravel()


def _unique_edges_with_counts(faces: np.ndarray, num_vertices: int):
    """(unique undirected edges, counts) via 1-D integer keys (fast path)."""
    a = np.concatenate([faces[:, 0], faces[:, 1], faces[:, 2]])
    b = np.concatenate([faces[:, 1], faces[:, 2], faces[:, 0]])
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    NV = num_vertices + 1
    key = lo * NV + hi
    uniq, inv = _unique_i64(key)
    counts = np.bincount(inv, minlength=len(uniq))
    edges = np.stack([uniq // NV, uniq % NV], axis=1)
    return edges, counts


def boundary_vertices(mesh: Mesh) -> np.ndarray:
    """Vertex ids on open borders (edges referenced by exactly one face).

    Equivalent to trimesh-based border detection in meshudf.py:406-414.
    """
    if len(mesh.faces) == 0:
        return np.zeros(0, np.int64)
    edges, counts = _unique_edges_with_counts(mesh.faces, len(mesh.vertices))
    return np.unique(edges[counts == 1])


def _neighbor_mean(verts: np.ndarray, e: np.ndarray):
    """Mean neighbor position per vertex over directed edges e (E, 2).

    np.bincount with weights runs at memcpy speed, unlike np.add.at.
    """
    n = len(verts)
    cnt = np.bincount(e[:, 0], minlength=n).astype(np.float64)
    acc = np.stack(
        [np.bincount(e[:, 0], weights=verts[e[:, 1], k], minlength=n) for k in range(3)],
        axis=1,
    )
    has = cnt > 0
    mean = np.where(has[:, None], acc / np.maximum(cnt, 1)[:, None], verts)
    return mean, has


def _uniform_laplacian_step(verts, faces, lam):
    """One step v ← v + λ·(mean(neighbors) − v)."""
    e = np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]],
         faces[:, [1, 0]], faces[:, [2, 1]], faces[:, [0, 2]]],
        axis=0,
    )
    mean, _ = _neighbor_mean(verts, e)
    return verts + lam * (mean - verts)


def laplacian_smooth(mesh: Mesh, iterations: int = 3, lam: float = 0.5) -> Mesh:
    """Uniform Laplacian smoothing (pymeshlab
    `apply_coord_laplacian_smoothing` equivalent, generate_uncond.py:117)."""
    v = mesh.vertices.astype(np.float64)
    for _ in range(iterations):
        v = _uniform_laplacian_step(v, mesh.faces, lam)
    return Mesh(v.astype(np.float32), mesh.faces)


def smooth_borders(mesh: Mesh, iterations: int = 20, lam: float = 0.3) -> Mesh:
    """Laplacian smoothing restricted to open-border vertices.

    Mirrors the reference's border smoothing (meshudf.py:404-434: λ=0.3,
    20 iterations, neighbors restricted to other border vertices).
    """
    if len(mesh.faces) == 0:
        return mesh
    edges, counts = _unique_edges_with_counts(mesh.faces, len(mesh.vertices))
    be = edges[counts == 1]
    border = np.unique(be)
    if len(border) == 0:
        return mesh
    # Iterate over COMPACT border-only arrays: the border is typically <5% of
    # vertices, and the full-size per-iteration bincounts dominate otherwise.
    remap = np.full(len(mesh.vertices), -1, np.int64)
    remap[border] = np.arange(len(border))
    ce = remap[be]  # compact edge ids
    both = np.concatenate([ce, ce[:, ::-1]], axis=0)
    bv = mesh.vertices[border].astype(np.float64)
    nb = len(border)
    cnt = np.bincount(both[:, 0], minlength=nb).astype(np.float64)
    has = cnt > 0
    denom = np.maximum(cnt, 1)[:, None]
    for _ in range(iterations):
        acc = np.stack(
            [np.bincount(both[:, 0], weights=bv[both[:, 1], k], minlength=nb) for k in range(3)],
            axis=1,
        )
        mean = np.where(has[:, None], acc / denom, bv)
        bv = bv + lam * (mean - bv)
    v = mesh.vertices.copy()
    v[border] = bv.astype(np.float32)
    return Mesh(v, mesh.faces)


def fill_triangle_holes(mesh: Mesh) -> Mesh:
    """Fill 3-edge boundary loops with one triangle (trimesh fill_holes lite,
    sufficient for the stabilize loop at meshudf.py:381-402).

    A detached single triangle has all three of its edges on the border and
    would be "filled" with a duplicate of itself (and oscillate against
    remove_duplicate_faces in the stabilize loop) — candidates whose three
    border edges belong to one face are skipped instead.
    """
    if len(mesh.faces) == 0:
        return mesh
    NV = len(mesh.vertices)
    a_ = np.concatenate([mesh.faces[:, 0], mesh.faces[:, 1], mesh.faces[:, 2]])
    b_ = np.concatenate([mesh.faces[:, 1], mesh.faces[:, 2], mesh.faces[:, 0]])
    key = np.minimum(a_, b_) * (NV + 1) + np.maximum(a_, b_)
    uniq, inv = _unique_i64(key)
    counts = np.bincount(inv, minlength=len(uniq))
    edges = np.stack([uniq // (NV + 1), uniq % (NV + 1)], axis=1)
    # owner face per edge (exact for count-1 edges: single writer)
    owner = np.zeros(len(uniq), np.int64)
    owner[inv] = np.tile(np.arange(len(mesh.faces)), 3)
    border1 = counts == 1
    be = edges[border1]
    be_owner = owner[border1]
    if len(be) == 0:
        return mesh
    # Vectorized 3-cycle search over border edges: candidate triangles are
    # length-2 border paths a<b<c whose closing edge (a, c) is also border.
    # be is already sorted by (lo, hi) — the unique keys ascend — so grouping
    # by the smaller endpoint and the closing-edge lookup index be directly.
    starts = np.searchsorted(be[:, 0], np.arange(NV))
    ends = np.searchsorted(be[:, 0], np.arange(NV) + 1)
    # For every edge (a, b): continuation edges are (b, c) with c > b.
    n_cont = ends[be[:, 1]] - starts[be[:, 1]]
    if n_cont.max(initial=0) == 0:
        return mesh
    rep = np.repeat(np.arange(len(be)), n_cont)
    # per-continuation offset within its group, fully vectorized
    cum = np.cumsum(n_cont) - n_cont
    offs = np.arange(int(n_cont.sum())) - np.repeat(cum, n_cont)
    cont_idx = starts[be[rep, 1]] + offs
    a = be[rep, 0]
    b = be[rep, 1]
    c = be[cont_idx, 1]
    # closing edge (a, c) must be a border edge: look up via packed keys
    key_be = be[:, 0] * (NV + 1) + be[:, 1]
    close = a * (NV + 1) + c
    pos = np.searchsorted(key_be, close)
    pos = np.clip(pos, 0, len(key_be) - 1)
    ok = key_be[pos] == close
    # detached single triangle (all three edges owned by one face): not a hole
    lone = (be_owner[rep] == be_owner[cont_idx]) & (be_owner[rep] == be_owner[pos])
    ok &= ~lone
    if not ok.any():
        return mesh
    new_faces = np.stack([a[ok], b[ok], c[ok]], axis=1)
    # dedup (each triangle found once per (a,b) edge — a<b<c makes it unique)
    return Mesh(mesh.vertices, np.concatenate([mesh.faces, new_faces], axis=0))


def stabilize(mesh: Mesh, max_rounds: int = 3, assume_clean: bool = False) -> Mesh:
    """Repeat dedup/degenerate-removal/hole-fill until stable
    (the reference's repeat-until-stable loop, meshudf.py:381-402).

    assume_clean: the input has no duplicate vertices/faces (true for
    marching-tetrahedra output, whose vertices are keyed by unique grid
    edges) — start with hole filling and dedup only if faces were added.
    """
    prev = (-1, -1)
    if assume_clean:
        n0 = len(mesh.faces)
        mesh = fill_triangle_holes(mesh)
        if len(mesh.faces) == n0:
            return mesh
        max_rounds -= 1
    for _ in range(max_rounds):
        n0 = (len(mesh.vertices), len(mesh.faces))
        mesh = merge_duplicate_vertices(mesh)
        mesh = remove_duplicate_faces(mesh)
        mesh = fill_triangle_holes(mesh)
        now = (len(mesh.vertices), len(mesh.faces))
        if now == n0 or now == prev:
            break
        prev = n0
    return mesh


def vertex_normals(mesh: Mesh) -> np.ndarray:
    """Area-weighted vertex normals (trimesh equivalent)."""
    v, f = mesh.vertices.astype(np.float64), mesh.faces
    fn = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
    vn = np.zeros_like(v)
    for i in range(3):
        np.add.at(vn, f[:, i], fn)
    norm = np.linalg.norm(vn, axis=1, keepdims=True)
    return (vn / np.maximum(norm, 1e-12)).astype(np.float32)
