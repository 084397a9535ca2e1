"""Mesh → UDF training-sample preprocessing.

Re-design of /root/reference/AutoEncoder/encdec/preprocess_udfs.py:35-162 and
/root/reference/AutoEncoder/utils.py:167-314. The open3d raycasting BVH is
replaced by the in-repo C++ BVH (native/closest_point.cpp); mesh I/O and
area-weighted surface sampling are numpy.

Per mesh (defaults match preprocess_udfs.py:128-136 + utils.py:272-273):
  * 100k-point surface point cloud
  * 500k query points: gaussian shells around pcd points at σ=[.003,.01,.1]
    with counts [250k,200k,25k] + 25k uniform in [-1,1]³, clipped to the cube
  * UDF clipped at max_dist=0.1 + unit gradient (query − closest)/dist
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import numpy as np

from ..geometry.marching import Mesh
from .. import native


def normalize_mesh(mesh: Mesh, mode: str = "box_center") -> Mesh:
    """Center (and optionally scale) a mesh.

    Mirrors AutoEncoder/encdec/normalized_obj.py:4-49: 'center' subtracts the
    vertex mean, 'box_center' centers the bounding box; 'unit' additionally
    scales the bbox into [-1,1]³.
    """
    v = mesh.vertices.astype(np.float64)
    if mode == "center":
        v = v - v.mean(axis=0)
    elif mode in ("box_center", "unit"):
        center = (v.max(axis=0) + v.min(axis=0)) / 2
        v = v - center
        if mode == "unit":
            v = v / np.abs(v).max()
    else:
        raise ValueError(f"unknown normalization mode {mode}")
    return Mesh(v.astype(np.float32), mesh.faces)


def sample_points_on_mesh(mesh: Mesh, n: int, rng: np.random.Generator) -> np.ndarray:
    """Area-weighted uniform surface sampling (open3d
    sample_points_uniformly equivalent, preprocess_udfs.py:128)."""
    v, f = mesh.vertices.astype(np.float64), mesh.faces
    e1 = v[f[:, 1]] - v[f[:, 0]]
    e2 = v[f[:, 2]] - v[f[:, 0]]
    areas = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1)
    total = areas.sum()
    if total <= 0:
        raise ValueError("mesh has zero surface area")
    probs = areas / total
    tri = rng.choice(len(f), size=n, p=probs)
    r1 = np.sqrt(rng.uniform(size=(n, 1)))
    r2 = rng.uniform(size=(n, 1))
    a, b, c = v[f[tri, 0]], v[f[tri, 1]], v[f[tri, 2]]
    pts = (1 - r1) * a + r1 * (1 - r2) * b + r1 * r2 * c
    return pts.astype(np.float32)


def sample_points_around_pcd(
    pcd: np.ndarray,
    stds: Sequence[float] = (0.003, 0.01, 0.1),
    counts: Sequence[int] = (250_000, 200_000, 25_000),
    num_uniform: int = 25_000,
    coords_range: tuple[float, float] = (-1.0, 1.0),
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Gaussian shells around surface points + uniform box samples
    (AutoEncoder/utils.py:167-220)."""
    rng = rng or np.random.default_rng(1024)  # preprocess seed parity (:17)
    lo, hi = coords_range
    parts = []
    for std, count in zip(stds, counts):
        base = pcd[rng.integers(0, len(pcd), size=count)]
        parts.append(base + rng.normal(scale=std, size=(count, 3)))
    parts.append(rng.uniform(lo, hi, size=(num_uniform, 3)))
    return np.clip(np.concatenate(parts).astype(np.float32), lo, hi)


def compute_udf_from_mesh(
    mesh: Mesh,
    queries: np.ndarray,
    max_dist: float = 0.1,
):
    """(udf clipped at max_dist, unit gradients) per query
    (AutoEncoder/utils.py:223-240,268-314 via the native BVH)."""
    d, closest, _ = native.closest_points(mesh.vertices, mesh.faces, queries)
    grad = queries - closest
    norm = np.maximum(np.linalg.norm(grad, axis=1, keepdims=True), 1e-9)
    grad = (grad / norm).astype(np.float32)
    return np.minimum(d, max_dist).astype(np.float32), grad


@dataclass
class PreprocessConfig:
    num_points_pcd: int = 100_000
    stds: tuple = (0.003, 0.01, 0.1)
    counts: tuple = (250_000, 200_000, 25_000)
    num_uniform: int = 25_000
    max_dist: float = 0.1
    coords_range: tuple = (-1.0, 1.0)
    seed: int = 1024


def prepare_udf_sample(mesh: Mesh, cfg: PreprocessConfig = PreprocessConfig()) -> dict:
    """One mesh → the npz payload the datasets consume
    (preprocess_udfs.py:110-155: vertices/triangles/pcd/coords/labels/gradients)."""
    rng = np.random.default_rng(cfg.seed)
    pcd = sample_points_on_mesh(mesh, cfg.num_points_pcd, rng)
    coords = sample_points_around_pcd(
        pcd, cfg.stds, cfg.counts, cfg.num_uniform, cfg.coords_range, rng
    )
    labels, gradients = compute_udf_from_mesh(mesh, coords, cfg.max_dist)
    return {
        "vertices": mesh.vertices.astype(np.float32),
        "triangles": mesh.faces.astype(np.int32),
        "pcd": pcd,
        "coords": coords,
        "labels": labels,
        "gradients": gradients,
    }


def preprocess_mesh_file(obj_path: str, out_path: str, cfg: PreprocessConfig = PreprocessConfig()):
    """CLI unit: read obj → normalize → sample → save npz."""
    from ..geometry.mesh_io import read_obj

    mesh = normalize_mesh(read_obj(obj_path), mode="unit")
    payload = prepare_udf_sample(mesh, cfg)
    np.savez(out_path, **payload)
    return payload
