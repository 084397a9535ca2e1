"""Reconstruction/generation quality metrics.

The reference reports Chamfer/FPD in the paper but ships no metric code
(SURVEY.md §6); these are the standard definitions used by the AE export
harness (cli/export_meshes.py) and available for evaluation pipelines.
"""

from __future__ import annotations

import numpy as np

try:  # scipy's KD-tree makes the metrics usable at full 512³-mesh scale
    from scipy.spatial import cKDTree as _KDTree
except ImportError:  # pragma: no cover - scipy is present in this env
    _KDTree = None


def _nn_dists(x: np.ndarray, y: np.ndarray, chunk: int) -> np.ndarray:
    """Euclidean distance from each point of x to its nearest neighbor in y."""
    if _KDTree is not None and (len(x) * len(y)) > 1_000_000:
        d, _ = _KDTree(y).query(x, k=1)
        return np.asarray(d, np.float64)
    mins = []
    for i in range(0, len(x), chunk):
        d = ((x[i : i + chunk, None, :] - y[None, :, :]) ** 2).sum(-1)
        mins.append(np.sqrt(d.min(axis=1)))
    return np.concatenate(mins) if mins else np.zeros((0,))


def chamfer_distance(a: np.ndarray, b: np.ndarray, chunk: int = 4096) -> float:
    """Symmetric Chamfer-L2: mean squared nearest-neighbor distance, both ways."""
    da = _nn_dists(a, b, chunk)
    db = _nn_dists(b, a, chunk)
    return float((da**2).mean() + (db**2).mean())


def hausdorff_distance(a: np.ndarray, b: np.ndarray, chunk: int = 4096) -> float:
    """Symmetric Hausdorff (max of directed nearest-neighbor distances)."""
    return float(max(_nn_dists(a, b, chunk).max(), _nn_dists(b, a, chunk).max()))


def f_score(a: np.ndarray, b: np.ndarray, threshold: float = 0.01, chunk: int = 4096) -> float:
    """F-score at a distance threshold (precision/recall of surface samples)."""
    precision = float((_nn_dists(a, b, chunk) < threshold).mean()) if len(a) else 0.0
    recall = float((_nn_dists(b, a, chunk) < threshold).mean()) if len(b) else 0.0
    if precision + recall == 0:
        return 0.0
    return 2 * precision * recall / (precision + recall)


def point_mesh_distances(points: np.ndarray, mesh) -> np.ndarray:
    """Exact Euclidean distance from each point to a triangle mesh's surface,
    via the C++ closest-point BVH (native/closest_point.cpp — the same
    machinery that replaces open3d RaycastingScene in preprocessing).

    Sampling-free on the target side: comparing two 4096-point samplings of a
    unit-scale surface has ~0.025 inter-sample spacing, which swamps e.g. an
    f-score@0.01 — point→surface distances do not.
    """
    from .. import native

    d, _, _ = native.closest_points(
        np.ascontiguousarray(mesh.vertices, np.float32),
        np.ascontiguousarray(mesh.faces, np.int32),
        np.ascontiguousarray(points, np.float32),
    )
    return np.asarray(d, np.float64)


def mesh_surface_metrics(
    recon_mesh,
    gt_mesh,
    n: int = 16384,
    threshold: float = 0.01,
    rng: "np.random.Generator | None" = None,
) -> dict:
    """Symmetric surface-to-surface metrics between two meshes.

    Samples n area-weighted points on each mesh and measures EXACT distance to
    the other mesh (BVH): Chamfer-L2 (mean-squared, summed both ways, the
    convention of the Surf-D paper's tables), Hausdorff, and f-score@threshold.
    """
    from ..data.preprocess import sample_points_on_mesh

    rng = rng or np.random.default_rng(0)
    pa = sample_points_on_mesh(recon_mesh, n, rng)
    pb = sample_points_on_mesh(gt_mesh, n, rng)
    da = point_mesh_distances(pa, gt_mesh)  # recon → gt surface
    db = point_mesh_distances(pb, recon_mesh)  # gt → recon surface
    precision = float((da < threshold).mean())
    recall = float((db < threshold).mean())
    f = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "chamfer": float((da**2).mean() + (db**2).mean()),
        "hausdorff": float(max(da.max(), db.max())),
        f"f_score@{threshold:g}": f,
        "precision": precision,
        "recall": recall,
    }


def one_nn_accuracy(
    sample_sets: "list[np.ndarray]",
    reference_sets: "list[np.ndarray]",
    chunk: int = 4096,
) -> float:
    """1-NNA between two sets of point clouds (PointFlow / Surf-D paper's
    third set metric alongside MMD and COV; the reference ships no metric
    code at all).

    Leave-one-out 1-NN two-sample classification accuracy over the pooled
    set under Chamfer distance: 0.5 means generated and reference shapes are
    indistinguishable (ideal); 1.0 means perfectly separable. Callers should
    pass equally sized sets — unbalanced sizes bias the null accuracy away
    from 0.5.
    """
    pools = list(sample_sets) + list(reference_sets)
    labels = np.array([0] * len(sample_sets) + [1] * len(reference_sets))
    n = len(pools)
    if n < 2:
        raise ValueError("1-NNA needs at least one point cloud per set")
    dist = np.full((n, n), np.inf)
    for i in range(n):
        for j in range(i + 1, n):
            dist[i, j] = dist[j, i] = chamfer_distance(pools[i], pools[j], chunk)
    nn = dist.argmin(axis=1)
    return float((labels[nn] == labels).mean())
