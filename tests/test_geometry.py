"""Geometry tests on analytic UDFs (SURVEY.md §4d-e).

sphere (closed) and open sheet fixtures check vertex-on-surface error,
watertightness/openness, grid-filler equivalence with the dense oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surfd_tpu.geometry import (
    GridFiller,
    Mesh,
    boundary_vertices,
    eval_in_chunks,
    fill_grid_dense,
    filter_small_components,
    keep_largest_component,
    laplacian_smooth,
    make_grad_fn,
    marching_tetrahedra,
    marching_tetrahedra_udf,
    merge_duplicate_vertices,
    read_obj,
    smooth_borders,
    stabilize,
    vertex_normals,
    write_obj,
)

R = 64
RADIUS = 0.6


def sphere_sdf_grid(r=R):
    xs = np.linspace(-1, 1, r, dtype=np.float64)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), axis=-1)
    return np.linalg.norm(g, axis=-1) - RADIUS


def sphere_udf_grids(r=R, max_dist=0.1):
    xs = np.linspace(-1, 1, r, dtype=np.float64)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), axis=-1)
    d = np.linalg.norm(g, axis=-1)
    udf = np.minimum(np.abs(d - RADIUS), max_dist)
    grad = g / np.maximum(d[..., None], 1e-9) * np.sign(d - RADIUS)[..., None]
    return udf, grad


def open_sheet_udf_grids(r=R, max_dist=0.1):
    """Open square sheet: z=0 plane restricted to |x|,|y| ≤ 0.5."""
    xs = np.linspace(-1, 1, r, dtype=np.float64)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), axis=-1)
    cx = np.clip(g[..., 0], -0.5, 0.5)
    cy = np.clip(g[..., 1], -0.5, 0.5)
    closest = np.stack([cx, cy, np.zeros_like(cx)], axis=-1)
    diff = g - closest
    d = np.linalg.norm(diff, axis=-1)
    udf = np.minimum(d, max_dist)
    grad = diff / np.maximum(d[..., None], 1e-9)
    return udf, grad


def _is_watertight(mesh: Mesh) -> bool:
    return len(boundary_vertices(mesh)) == 0


def test_mt_sphere_accuracy_and_watertight():
    mesh = marching_tetrahedra(sphere_sdf_grid(), iso=0.0)
    assert len(mesh.faces) > 1000
    r = np.linalg.norm(mesh.vertices, axis=1)
    # vertex-on-surface error well below a voxel (2/63 ≈ 0.032)
    assert np.abs(r - RADIUS).max() < 0.01
    assert _is_watertight(mesh)
    # Euler characteristic of a sphere: V - E + F = 2
    E = len(np.unique(np.sort(np.concatenate(
        [mesh.faces[:, [0, 1]], mesh.faces[:, [1, 2]], mesh.faces[:, [2, 0]]]), axis=1), axis=0))
    assert len(mesh.vertices) - E + len(mesh.faces) == 2


def test_mt_sphere_orientation_outward():
    mesh = marching_tetrahedra(sphere_sdf_grid(), iso=0.0)
    v, f = mesh.vertices, mesh.faces
    n = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
    centers = v[f].mean(axis=1)
    # all normals point away from origin
    assert ((n * centers).sum(1) > 0).mean() > 0.999


def test_mt_udf_sphere_matches_signed():
    udf, grad = sphere_udf_grids()
    mesh = marching_tetrahedra_udf(udf, grad)
    assert len(mesh.faces) > 1000
    r = np.linalg.norm(mesh.vertices, axis=1)
    assert np.abs(r - RADIUS).max() < 0.01
    # closed surface stays closed through the pseudo-sign route
    assert _is_watertight(mesh)


def test_mt_udf_open_sheet():
    udf, grad = open_sheet_udf_grids()
    mesh = marching_tetrahedra_udf(udf, grad)
    assert len(mesh.faces) > 200
    # all vertices on the sheet plane, within its extent (+1 voxel tolerance)
    vox = 2 / (R - 1)
    assert np.abs(mesh.vertices[:, 2]).max() < vox
    assert np.abs(mesh.vertices[:, :2]).max() < 0.5 + 2 * vox
    # an open sheet must have a boundary
    assert len(boundary_vertices(mesh)) > 0
    # area ≈ 1.0 (unit square)
    v, f = mesh.vertices.astype(np.float64), mesh.faces
    area = 0.5 * np.linalg.norm(
        np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]]), axis=1
    ).sum()
    assert area == pytest.approx(1.0, rel=0.1)


def _sphere_udf_fn(pts):
    d = jnp.linalg.norm(pts, axis=-1)
    return jnp.minimum(jnp.abs(d - RADIUS), 0.1)


def test_grid_filler_matches_dense():
    gf = GridFiller(resolution=128, max_batch=2**14)
    assert gf.block > 1  # sparsification must engage at this resolution
    grid, stats = gf.fill(jax.jit(_sphere_udf_fn), return_stats=True)
    dense = fill_grid_dense(jax.jit(_sphere_udf_fn), 128, max_batch=2**14)
    # Coarse-to-fine must be exact in the near band that MT reads.
    band = dense < 2.5 * gf.spacing
    assert band.sum() > 0
    np.testing.assert_allclose(grid[band], dense[band], atol=1e-6)
    # and must actually skip most of the volume
    assert stats["fine_points"] < 0.7 * stats["dense_points"]
    # meshes extracted from sparse vs dense grids agree
    g = make_grad_fn(jax.jit(_sphere_udf_fn))
    grads = gf.fill_gradients(g, grid)
    mesh = marching_tetrahedra_udf(grid.astype(np.float64), grads.astype(np.float64))
    r = np.linalg.norm(mesh.vertices, axis=1)
    assert np.abs(r - RADIUS).max() < 0.01


def test_eval_in_chunks_padding():
    f = jax.jit(lambda p: p[:, 0] * 2)
    pts = np.random.default_rng(0).normal(size=(1000, 3)).astype(np.float32)
    out = eval_in_chunks(f, pts, 256)
    np.testing.assert_allclose(out, pts[:, 0] * 2, rtol=1e-6)
    assert eval_in_chunks(f, pts[:0], 256).shape == (0,)


def test_make_grad_fn_analytic():
    g = make_grad_fn(jax.jit(lambda p: jnp.linalg.norm(p, axis=-1)))
    pts = np.array([[0.3, 0.4, 0.0], [0.0, 0.0, 1.0]], np.float32)
    out = np.asarray(g(jnp.asarray(pts)))
    np.testing.assert_allclose(out[0], [0.6, 0.8, 0.0], atol=1e-5)
    np.testing.assert_allclose(out[1], [0.0, 0.0, 1.0], atol=1e-5)


# ---- mesh ops ----

def _two_spheres_mesh():
    sdf1 = sphere_sdf_grid(48)
    xs = np.linspace(-1, 1, 48)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), axis=-1)
    sdf2 = np.linalg.norm(g - np.array([0.0, 0.0, 0.82]), axis=-1) - 0.1
    return marching_tetrahedra(np.minimum(sdf1, sdf2), iso=0.0)


def test_component_filters():
    mesh = _two_spheres_mesh()
    big = keep_largest_component(mesh)
    assert len(big.faces) < len(mesh.faces)
    r = np.linalg.norm(big.vertices, axis=1)
    assert np.abs(r - RADIUS).max() < 0.02  # only the big sphere remains
    small_removed = filter_small_components(mesh, min_faces=len(big.faces))
    assert len(small_removed.faces) == len(big.faces)


def test_laplacian_smooth_shrinks_but_preserves_topology():
    mesh = marching_tetrahedra(sphere_sdf_grid(32), iso=0.0)
    sm = laplacian_smooth(mesh, iterations=5, lam=0.5)
    assert len(sm.faces) == len(mesh.faces)
    assert np.linalg.norm(sm.vertices, axis=1).mean() < np.linalg.norm(
        mesh.vertices, axis=1
    ).mean()


def test_smooth_borders_only_moves_border():
    udf, grad = open_sheet_udf_grids()
    mesh = marching_tetrahedra_udf(udf, grad)
    border = boundary_vertices(mesh)
    sm = smooth_borders(mesh, iterations=5)
    interior = np.setdiff1d(np.arange(len(mesh.vertices)), border)
    np.testing.assert_allclose(sm.vertices[interior], mesh.vertices[interior])
    assert not np.allclose(sm.vertices[border], mesh.vertices[border])


def test_stabilize_and_merge():
    mesh = marching_tetrahedra(sphere_sdf_grid(32), iso=0.0)
    # introduce duplicates
    dup = Mesh(
        np.concatenate([mesh.vertices, mesh.vertices[:5]]),
        np.concatenate([mesh.faces, mesh.faces[:3]]),
    )
    out = stabilize(dup)
    assert len(out.faces) == len(mesh.faces)
    m = merge_duplicate_vertices(dup)
    assert len(m.vertices) == len(mesh.vertices)


def test_vertex_normals_sphere():
    mesh = marching_tetrahedra(sphere_sdf_grid(), iso=0.0)
    vn = vertex_normals(mesh)
    radial = mesh.vertices / np.linalg.norm(mesh.vertices, axis=1, keepdims=True)
    cos = (vn * radial).sum(1)
    assert cos.mean() > 0.99


def test_obj_roundtrip(tmp_path):
    mesh = marching_tetrahedra(sphere_sdf_grid(32), iso=0.0)
    p = str(tmp_path / "m.obj")
    write_obj(p, mesh)
    back = read_obj(p)
    np.testing.assert_allclose(back.vertices, mesh.vertices, rtol=1e-5)
    np.testing.assert_array_equal(back.faces, mesh.faces)


def test_native_mt_matches_numpy():
    """C++ and numpy marching must agree (same algorithm, same dedup)."""
    from surfd_tpu import native

    if not native.available():
        pytest.skip("native lib unavailable")
    udf, grad = sphere_udf_grids()
    m_np = marching_tetrahedra_udf(udf, grad, use_native=False)
    m_cc = marching_tetrahedra_udf(udf, grad, use_native=True)
    assert len(m_cc.faces) == len(m_np.faces)
    assert len(m_cc.vertices) == len(m_np.vertices)
    # same vertex set (ordering may differ)
    a = np.sort(m_np.vertices.view([("x", "f4"), ("y", "f4"), ("z", "f4")]).ravel())
    b = np.sort(m_cc.vertices.view([("x", "f4"), ("y", "f4"), ("z", "f4")]).ravel())
    np.testing.assert_allclose(
        np.stack([a["x"], a["y"], a["z"]]), np.stack([b["x"], b["y"], b["z"]]), atol=2e-2
    )


def test_metrics_on_known_sets():
    from surfd_tpu.geometry import chamfer_distance, f_score, hausdorff_distance

    a = np.zeros((100, 3), np.float32)
    b = np.zeros((100, 3), np.float32)
    assert chamfer_distance(a, b) == 0.0
    assert f_score(a, b, 0.01) == 1.0
    c = b + np.array([0.5, 0, 0], np.float32)
    assert chamfer_distance(a, c) == pytest.approx(0.5, rel=1e-5)  # 2 * 0.25
    assert hausdorff_distance(a, c) == pytest.approx(0.5, rel=1e-5)
    assert f_score(a, c, 0.01) == 0.0


def test_grid_filler_hierarchical_matches_dense():
    """Two-level (block → sub-block) refinement must stay exact in the band."""
    gf = GridFiller(resolution=128, block=8, max_batch=2**14)
    assert gf.sub_block == 2  # the intermediate level engages
    grid, stats = gf.fill(jax.jit(_sphere_udf_fn), return_stats=True)
    dense = fill_grid_dense(jax.jit(_sphere_udf_fn), 128, max_batch=2**14)
    band = dense < 2.5 * gf.spacing
    assert band.sum() > 0
    np.testing.assert_allclose(grid[band], dense[band], atol=1e-6)
    # the sub-level must beat the single-level volume substantially
    single = GridFiller(resolution=128, block=8, max_batch=2**14)
    single.sub_block = 0
    _, s1 = single.fill(jax.jit(_sphere_udf_fn), return_stats=True)
    assert stats["fine_points"] < 0.6 * s1["fine_points"]


def _two_sphere_udf_np(p, max_dist=0.1):
    d1 = np.abs(np.linalg.norm(p, axis=-1) - 0.55)
    d2 = np.abs(np.linalg.norm(p - np.array([0.3, 0.0, 0.0]), axis=-1) - 0.35)
    return np.minimum(np.minimum(d1, d2), max_dist)


def test_fill_triangle_holes_lone_and_hole():
    """A genuine 3-edge hole is filled; a detached triangle is NOT re-added
    as a duplicate of itself (the stabilize-loop oscillation artifact)."""
    from surfd_tpu.geometry.mesh_ops import fill_triangle_holes

    # tetrahedron missing one face: 3 border edges closing a 3-cycle
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    tet_open = Mesh(v, np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3]], np.int64))
    filled = fill_triangle_holes(tet_open)
    assert len(filled.faces) == 4
    assert sorted(filled.faces[-1].tolist()) == [1, 2, 3]

    lone = Mesh(v[:3], np.array([[0, 1, 2]], np.int64))
    assert len(fill_triangle_holes(lone).faces) == 1
    # and stabilize terminates without leaving duplicates
    st = stabilize(lone, assume_clean=True)
    assert len(st.faces) == 1


def test_native_face_filter_prep_matches_numpy():
    from surfd_tpu import native

    if not native.available():
        pytest.skip("native lib unavailable")
    udf, grad = sphere_udf_grids(32)
    mesh = marching_tetrahedra_udf(udf, grad, use_native=False)
    pts, einv = native.face_filter_prep(mesh.vertices, mesh.faces)
    # numpy oracle: unique undirected edges + midpoints
    f = mesh.faces
    a = np.concatenate([f[:, 0], f[:, 1], f[:, 2]])
    b = np.concatenate([f[:, 1], f[:, 2], f[:, 0]])
    NV = len(mesh.vertices) + 1
    keys = np.minimum(a, b) * NV + np.maximum(a, b)
    uniq, inv = np.unique(keys, return_inverse=True)
    assert len(pts) == len(mesh.vertices) + len(uniq)
    np.testing.assert_allclose(pts[: len(mesh.vertices)], mesh.vertices)
    ea, eb = uniq // NV, uniq % NV
    mids = 0.5 * (mesh.vertices[ea] + mesh.vertices[eb])
    np.testing.assert_allclose(pts[len(mesh.vertices):], mids, atol=1e-6)
    # einv maps face edge k (between corner k and k+1) to the unique edge id
    np.testing.assert_array_equal(einv, inv.ravel().reshape(3, -1).T)


def test_native_block_gated_pass1_matches_full_scan():
    """mt_active_cubes_blocks over a sound scan set == the full-grid pass 1."""
    from surfd_tpu import native

    if not native.available():
        pytest.skip("native lib unavailable")
    udf, _ = sphere_udf_grids(64)
    R = udf.shape[0]
    voxel = 2.0 / (R - 1)
    near_thr, avg_thr = 1.74 * voxel, 1.05 * voxel
    ids_full, near_full = native.mt_active_cubes(udf, near_thr, avg_thr)

    # active blocks: any node below the near threshold (the filler's activity
    # test is a superset of this), dilated one block negative for anchors
    B = 8
    nb = R // B
    coarse = (udf <= near_thr).reshape(nb, B, nb, B, nb, B).any(axis=(1, 3, 5))
    ab = np.argwhere(coarse)
    offs = np.stack(np.meshgrid([0, 1], [0, 1], [0, 1], indexing="ij"), -1).reshape(-1, 3)
    dil = np.clip((ab[:, None, :] - offs[None]).reshape(-1, 3), 0, nb - 1)
    sb = np.unique(dil, axis=0).astype(np.int32)
    ids_blk, near_blk = native.mt_active_cubes_blocks(udf, near_thr, avg_thr, sb, B)
    np.testing.assert_array_equal(ids_blk, ids_full)
    np.testing.assert_array_equal(near_blk, near_full)


def test_native_scatter_and_reset_blocks():
    from surfd_tpu import native

    if not native.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(0)
    R, B, M = 32, 4, 17
    grid = np.full((R, R, R), 0.1, np.float32)
    ab = np.unique(rng.integers(0, R // B, size=(M, 3)), axis=0).astype(np.int32)
    vals = rng.integers(0, 65536, size=(len(ab), B, B, B)).astype(np.uint16)
    scale = 0.1 / 65535.0
    native.scatter_u16_blocks(grid, ab, vals, B, scale)
    oracle = np.full((R, R, R), 0.1, np.float32)
    for m in range(len(ab)):
        x0, y0, z0 = ab[m] * B
        oracle[x0:x0+B, y0:y0+B, z0:z0+B] = vals[m].astype(np.float32) * np.float32(scale)
    np.testing.assert_array_equal(grid, oracle)
    native.reset_blocks(grid, ab, B, 0.1)
    np.testing.assert_array_equal(grid, np.full((R, R, R), 0.1, np.float32))


def test_grid_filler_reuse_buffer_matches_fresh():
    """A reused buffer (reset-active-blocks) fill == a fresh-buffer fill."""
    # explicit block=8 so the blocked path (and thus the buffer machinery)
    # engages at this small resolution (auto-size degenerates to dense)
    mk = lambda reuse: GridFiller(
        resolution=128, block=8, max_batch=2**14, reuse_buffer=reuse
    )
    gf = mk(True)
    fn_a = jax.jit(_sphere_udf_fn)
    fn_b = jax.jit(lambda p: jnp.minimum(
        jnp.abs(jnp.linalg.norm(p - 0.2, axis=-1) - 0.4), 0.1))
    first = gf.fill(fn_a).copy()
    assert gf._held_buffer is not None
    gf.release_buffer()  # done reading → buffer may re-enter the pool
    second = gf.fill(fn_b)  # reuses + resets the buffer from the first fill
    fresh = mk(False).fill(fn_b)
    np.testing.assert_array_equal(second, fresh)
    gf.release_buffer()
    # and filling fn_a again reproduces the original
    np.testing.assert_array_equal(gf.fill(fn_a), first)
    # unreleased: the next fill must NOT reclaim the held buffer
    held = gf._held_buffer[0]
    g2 = mk(True).fill(fn_b)
    assert g2 is not held


def test_native_mt_corner_ranks_matches_searchsorted():
    from surfd_tpu import native
    from surfd_tpu.geometry.marching import _cube_corner_gids

    if not native.available():
        pytest.skip("native lib unavailable")
    udf, _ = sphere_udf_grids(48)
    R = udf.shape[0]
    voxel = 2.0 / (R - 1)
    cube_ids, near = native.mt_active_cubes(udf, 1.74 * voxel, 1.05 * voxel)
    assert len(cube_ids) > 100
    Rm1 = R - 1
    xyz = np.stack(
        [cube_ids // (Rm1 * Rm1), (cube_ids // Rm1) % Rm1, cube_ids % Rm1], axis=1
    )
    oracle = np.searchsorted(near, _cube_corner_gids(xyz, R))
    ranks = native.mt_corner_ranks(near, cube_ids, R)
    np.testing.assert_array_equal(ranks, oracle)


def test_native_face_filter_prep_q16_matches_f32_prep():
    """q16 prep == f32 prep's midpoints put through the numpy quantizer,
    and its ea/eb match the numpy unique-edge oracle."""
    from surfd_tpu import native

    if not native.available():
        pytest.skip("native lib unavailable")
    udf, grad = sphere_udf_grids(32)
    mesh = marching_tetrahedra_udf(udf, grad, use_native=False)
    lo, hi = -1.0, 1.0
    qstep = (hi - lo) / 65535.0
    pts, einv = native.face_filter_prep(mesh.vertices, mesh.faces)
    qmids, qeinv, ea, eb = native.face_filter_prep_q16(
        mesh.vertices, mesh.faces, lo, 1.0 / qstep
    )
    np.testing.assert_array_equal(einv, qeinv)
    mids = pts[len(mesh.vertices):]
    oracle = np.clip(np.rint((mids - lo) * (1.0 / qstep)), 0, 65535).astype(np.uint16)
    np.testing.assert_array_equal(qmids, oracle)
    f = mesh.faces
    a = np.concatenate([f[:, 0], f[:, 1], f[:, 2]])
    b = np.concatenate([f[:, 1], f[:, 2], f[:, 0]])
    NV = len(mesh.vertices) + 1
    uniq = np.unique(np.minimum(a, b) * NV + np.maximum(a, b))
    np.testing.assert_array_equal(ea, uniq // NV)
    np.testing.assert_array_equal(eb, uniq % NV)


def test_eval_in_chunks_async_matches_sync():
    from surfd_tpu.geometry import eval_in_chunks, eval_in_chunks_async

    fn = jax.jit(lambda p: jnp.linalg.norm(p, axis=-1))
    pts = np.random.default_rng(0).normal(size=(1000, 3)).astype(np.float32)
    pending = eval_in_chunks_async(fn, pts, 256)
    sync = eval_in_chunks(fn, pts, 256)
    np.testing.assert_array_equal(pending(), sync)


def test_native_finalize_pre_matches_finalize():
    """finalize_mesh_pre (bincount over prep's edge structure) must produce
    the exact mesh finalize_mesh (second radix sort) produces, given the
    same below-threshold mask."""
    from surfd_tpu import native

    if not native.available():
        pytest.skip("native lib unavailable")
    udf, grad = sphere_udf_grids(48)
    mesh = marching_tetrahedra_udf(udf, grad, use_native=True)
    V = len(mesh.vertices)
    assert len(mesh.faces) > 100

    qmids, einv, ea, eb = native.face_filter_prep_q16(
        mesh.vertices, mesh.faces, -1.0, 65535.0 / 2.0
    )
    rng = np.random.default_rng(1)
    ok = (rng.random(V + len(ea)) > 0.05).astype(np.uint8)
    v1, f1 = native.finalize_mesh(mesh.vertices, mesh.faces, ok, einv)
    v2, f2 = native.finalize_mesh_pre(mesh.vertices, mesh.faces, ok, einv, ea, eb)
    np.testing.assert_array_equal(f1, f2)
    np.testing.assert_array_equal(v1, v2)


def test_native_finalize_parity_full_chain():
    """Fused C++ filter+cleanup == the numpy oracle chain, face for face."""
    from surfd_tpu import native
    from surfd_tpu.geometry import remove_unreferenced_vertices
    from surfd_tpu.pipelines.generate import filter_faces_by_udf

    if not native.available():
        pytest.skip("native lib unavailable")
    r = 64
    xs = np.linspace(-1, 1, r, dtype=np.float64)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), axis=-1)
    udf = _two_sphere_udf_np(g)
    eps = 1e-5
    grad = np.stack(
        [
            (_two_sphere_udf_np(g + off) - _two_sphere_udf_np(g - off)) / (2 * eps)
            for off in (np.eye(3) * eps)
        ],
        axis=-1,
    )
    mesh = marching_tetrahedra_udf(udf, grad, use_native=True)
    assert len(mesh.faces) > 1000

    def udf_fn(p):
        p = jnp.asarray(p)
        d1 = jnp.abs(jnp.linalg.norm(p, axis=-1) - 0.55)
        d2 = jnp.abs(jnp.linalg.norm(p - jnp.array([0.3, 0.0, 0.0]), axis=-1) - 0.35)
        return jnp.minimum(jnp.minimum(d1, d2), 0.1)

    thr = 1.0 / r
    m_np = filter_faces_by_udf(mesh, udf_fn, thr, chunk=2**16)
    m_np = remove_unreferenced_vertices(m_np)
    m_np = stabilize(m_np, assume_clean=True)
    m_np = smooth_borders(m_np, iterations=20, lam=0.3)
    m_np = merge_duplicate_vertices(m_np)

    pts, einv = native.face_filter_prep(mesh.vertices, mesh.faces)
    ok = (_two_sphere_udf_np(pts) <= thr).astype(np.uint8)
    v, f = native.finalize_mesh(mesh.vertices, mesh.faces, ok, einv)

    assert (len(v), len(f)) == (len(m_np.vertices), len(m_np.faces))

    def face_set(verts, faces, dec=5):
        tri = np.round(verts[faces] * 10**dec).astype(np.int64)
        order = np.lexsort((tri[:, :, 2], tri[:, :, 1], tri[:, :, 0]), axis=1)
        canon = np.take_along_axis(tri, order[:, :, None], axis=1)
        return set(map(tuple, canon.reshape(len(faces), 9)))

    assert face_set(m_np.vertices, m_np.faces) == face_set(v, f)


def test_mesh_surface_metrics_exact():
    """Point-to-mesh metrics are sampling-free on the target side: identical
    meshes score ~0 chamfer / f=1, and a known translation shows up as its
    squared distance (both directions), unlike point-set chamfer whose floor
    is the inter-sample spacing."""
    import numpy as np
    from surfd_tpu.geometry.marching import Mesh
    from surfd_tpu.geometry.metrics import mesh_surface_metrics, point_mesh_distances

    # unit right triangle pair forming a square in z=0
    v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    m = Mesh(v, f)
    r = mesh_surface_metrics(m, m, n=512)
    assert r["chamfer"] < 1e-10
    assert r["f_score@0.01"] == 1.0

    m2 = Mesh(v + np.array([0, 0, 0.05], np.float32), f)
    r2 = mesh_surface_metrics(m, m2, n=512)
    np.testing.assert_allclose(r2["chamfer"], 2 * 0.05**2, rtol=1e-5)
    assert r2["f_score@0.01"] == 0.0
    d = point_mesh_distances(np.array([[0.5, 0.5, 0.3]], np.float32), m)
    np.testing.assert_allclose(d, [0.3], rtol=1e-6)


def test_one_nn_accuracy_separable_and_identical():
    """1-NNA = 1.0 for cleanly separable sets, ~0.5 for same-distribution."""
    import numpy as np

    from surfd_tpu.geometry.metrics import one_nn_accuracy

    rng = np.random.default_rng(0)
    near = [rng.normal(0, 0.01, (64, 3)).astype(np.float32) for _ in range(4)]
    far = [(rng.normal(0, 0.01, (64, 3)) + 5).astype(np.float32) for _ in range(4)]
    assert one_nn_accuracy(near, far) == 1.0

    # same distribution: each shape's nearest neighbour is ~random across
    # sets -> accuracy near chance (bounded loosely; tiny n is noisy)
    same_a = [rng.normal(0, 1, (64, 3)).astype(np.float32) for _ in range(8)]
    same_b = [rng.normal(0, 1, (64, 3)).astype(np.float32) for _ in range(8)]
    acc = one_nn_accuracy(same_a, same_b)
    assert 0.2 <= acc <= 0.8

    import pytest

    with pytest.raises(ValueError):
        one_nn_accuracy([], [])


def test_surface_bias_calibration_recovers_biased_field():
    """A BCE-trained decoder's UDF bottoms out at a floor b > 0 at the true
    surface (sigmoid saturation). surface_bias="auto" must estimate b from
    the fill's per-block minima, subtract it from the grid, and widen the
    face-filter threshold — recovering geometry a raw extraction filters
    away or displaces. Reference has no such mechanism (its published
    decoders trained long enough to push b below 1/N)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from surfd_tpu.pipelines.generate import MeshExtractionConfig, get_mesh_from_udf

    BIAS = 0.012  # above the 1/96 face threshold: raw extraction must filter

    def biased(p):
        return jnp.abs(jnp.linalg.norm(p, axis=-1) - 0.6) + BIAS

    f = jax.jit(biased)
    cfg_auto = MeshExtractionConfig(resolution=96, max_batch=2**14, surface_bias="auto")
    mesh_a, stats_a = get_mesh_from_udf(f, cfg=cfg_auto, return_stats=True)
    assert abs(stats_a["surface_bias"] - BIAS) < 2.5e-3
    r_a = np.abs(np.linalg.norm(mesh_a.vertices, axis=1) - 0.6)

    cfg_raw = MeshExtractionConfig(resolution=96, max_batch=2**14, surface_bias=0.0)
    mesh_r, stats_r = get_mesh_from_udf(f, cfg=cfg_raw, return_stats=True)
    assert stats_r["surface_bias"] == 0.0
    r_r = np.abs(np.linalg.norm(mesh_r.vertices, axis=1) - 0.6)

    # calibration recovers faces the raw threshold filters away (raw loses
    # most or all of the surface), and places vertices on the true surface
    assert len(mesh_a.faces) > 1.5 * len(mesh_r.faces)
    assert r_a.mean() < 3e-4
    if len(mesh_r.faces):
        assert r_a.mean() < 0.5 * r_r.mean()

    # a clean field must be left untouched (estimator self-regulates)
    def clean(p):
        return jnp.abs(jnp.linalg.norm(p, axis=-1) - 0.6)

    _, stats_c = get_mesh_from_udf(
        jax.jit(clean),
        cfg=MeshExtractionConfig(resolution=96, max_batch=2**14, surface_bias="auto"),
        return_stats=True,
    )
    assert stats_c["surface_bias"] == 0.0


def test_native_abi_version_matches():
    """native.py's ctypes prototypes must match the built library's ABI —
    a stale .so called through newer prototypes silently corrupts arguments
    (ADVICE r4: the scatter bias argument was dropped without error)."""
    import ctypes

    from surfd_tpu import native

    lib = native._load()
    lib.surfd_abi_version.restype = ctypes.c_int64
    assert int(lib.surfd_abi_version()) == native._ABI_VERSION


def test_marching_t_clamp_no_spike_vertices():
    """A grid that dips slightly below 0 (surface-bias subtraction overshoot)
    must not extrapolate vertices outside their edges: t = ua/(ua+ub) with a
    negative endpoint and a near-zero sum would place vertices thousands of
    units outside the domain (r4 sheet_122: Hausdorff 3432 on [-1,1])."""
    import numpy as np

    from surfd_tpu.geometry.marching import marching_tetrahedra_udf

    R = 16
    xs = np.linspace(-1, 1, R, dtype=np.float32)
    # plane UDF |x| (surface between nodes 7 and 8) ...
    u = np.broadcast_to(np.abs(xs)[:, None, None], (R, R, R)).copy()
    # ... with a poisoned y-edge at the x=8 plane: endpoints -0.06 and
    # +0.0600001 -> edge sum su = 1e-7, unclamped t = -6e5 -> a vertex ~1e4
    # units outside [-1,1]
    u[8, 5, 5] = -0.06
    u[8, 6, 5] = 0.0600001

    def grad_at(pts):
        g = np.zeros((len(pts), 3), np.float32)
        g[:, 0] = np.where(pts[:, 0] > 0, 1.0, -1.0)
        return g

    for use_native in (False, True):
        mesh = marching_tetrahedra_udf(u, grad_at, use_native=use_native)
        assert len(mesh.faces) > 0
        assert np.abs(mesh.vertices).max() <= 1.0 + 2 * (2.0 / (R - 1)), (
            f"spike vertices escaped the domain (use_native={use_native})"
        )


def test_estimate_surface_bias_field_local_floors():
    """The per-block floor field must recover spatially-varying floors (the
    global p5 scalar under-corrects high-floor regions and over-corrects the
    lowest), erode shell blocks down to their straddling neighbours, respect
    the global deadzone, and cap spurious pocket floors at 3x the global low
    tail."""
    import numpy as np

    from surfd_tpu.geometry import estimate_surface_bias_field

    nb, spacing = 16, 0.01
    rng = np.random.default_rng(0)

    # two floor regions: b1 on the left half, b2 = 2.5*b1 on the right
    b1, b2 = 0.004, 0.010
    ab = []
    bm = []
    for x in range(nb):
        for y in range(nb):
            ab.append((x, y, 8))  # straddling slab
            floor = b1 if x < nb // 2 else b2
            bm.append(floor + rng.uniform(0, 0.1 * spacing))
            ab.append((x, y, 9))  # shell slab: offset from the surface
            bm.append(floor + 3.0 * spacing)
    ab = np.array(ab, np.int32)
    bm = np.array(bm, np.float32)
    est = estimate_surface_bias_field(ab, bm, nb, spacing)
    assert est is not None
    bias_pb, field = est
    assert field.shape == (nb, nb, nb)
    straddle = ab[:, 2] == 8
    left = straddle & (ab[:, 0] < nb // 2 - 2)
    right = straddle & (ab[:, 0] >= nb // 2 + 2)
    assert np.allclose(bias_pb[left], b1, atol=1.5e-3)
    assert np.allclose(bias_pb[right], b2, atol=1.5e-3)
    # shell blocks are eroded down to their straddling neighbours
    shell_left = (~straddle) & (ab[:, 0] < nb // 2 - 2)
    assert np.allclose(bias_pb[shell_left], b1, atol=1.5e-3)
    # cap: a lone spurious pocket 5x the typical floor is not legitimized
    ab2 = np.vstack([ab, [[0, 0, 0]]]).astype(np.int32)
    bm2 = np.append(bm, 5 * b1).astype(np.float32)
    bias2, _ = estimate_surface_bias_field(ab2, bm2, nb, spacing)
    p5 = np.percentile(bm2, 5.0)
    assert bias2[-1] <= 3.0 * p5 + 1e-9

    # global deadzone: well-fitted decoder (all minima ~0) -> no correction
    assert estimate_surface_bias_field(
        ab, np.full(len(ab), 0.05 * spacing, np.float32), nb, spacing
    ) is None


def test_surface_bias_field_spatially_varying_floor():
    """End-to-end: a decoder whose floor differs by 2.5x between two halves
    of the domain. The local calibration must recover the surface in BOTH
    halves (a global scalar either leaves the high-floor half unmeshed or
    digs a negative shell into the low-floor one) and never emit
    out-of-domain vertices."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from surfd_tpu.pipelines.generate import MeshExtractionConfig, get_mesh_from_udf

    B1, B2 = 0.006, 0.015

    def two_floor(p):
        d = jnp.abs(jnp.linalg.norm(p, axis=-1) - 0.6)
        return d + jnp.where(p[..., 0] < 0, B1, B2)

    f = jax.jit(two_floor)
    cfg = MeshExtractionConfig(resolution=96, max_batch=2**14, surface_bias="auto")
    mesh, stats = get_mesh_from_udf(f, cfg=cfg, return_stats=True)
    assert stats["oob_vertices"] == 0
    assert np.abs(mesh.vertices).max() <= 1.0 + 4.0 / 95
    r = np.abs(np.linalg.norm(mesh.vertices, axis=1) - 0.6)
    assert r.mean() < 1e-3
    # both halves must be present with surface-accurate vertices
    left = mesh.vertices[:, 0] < -0.1
    right = mesh.vertices[:, 0] > 0.1
    assert left.sum() > 500 and right.sum() > 500
    assert r[left].mean() < 1e-3 and r[right].mean() < 1e-3


def test_dense_fill_auto_bias():
    """On the dense path (block == 1) "auto" must estimate the floor from
    the dense grid itself instead of silently resolving to 0 (ADVICE r4)."""
    import jax
    import jax.numpy as jnp

    from surfd_tpu.geometry import GridFiller

    BIAS = 0.02

    def biased(p):
        return jnp.abs(jnp.linalg.norm(p, axis=-1) - 0.5) + BIAS

    gf = GridFiller(32, max_dist=0.06, surface_bias="auto", max_batch=2**14)
    assert gf.block == 1  # max_dist too tight to sparsify at 32^3
    grid, stats = gf.fill(jax.jit(biased), return_stats=True)
    assert abs(stats["surface_bias"] - BIAS) < 5e-3
    assert grid.min() >= 0.0
    assert grid.min() < 0.005  # floor removed
