"""Reconstruction/generation quality metrics.

The reference reports Chamfer/FPD in the paper but ships no metric code
(SURVEY.md §6); these are the standard definitions used by the AE export
harness (cli/export_meshes.py) and available for evaluation pipelines.
"""

from __future__ import annotations

import numpy as np


def chamfer_distance(a: np.ndarray, b: np.ndarray, chunk: int = 4096) -> float:
    """Symmetric Chamfer-L2: mean squared nearest-neighbor distance, both ways."""

    def one_sided(x, y):
        mins = []
        for i in range(0, len(x), chunk):
            d = ((x[i : i + chunk, None, :] - y[None, :, :]) ** 2).sum(-1)
            mins.append(d.min(axis=1))
        return float(np.concatenate(mins).mean())

    return one_sided(a, b) + one_sided(b, a)


def hausdorff_distance(a: np.ndarray, b: np.ndarray, chunk: int = 4096) -> float:
    """Symmetric Hausdorff (max of directed nearest-neighbor distances)."""

    def one_sided(x, y):
        worst = 0.0
        for i in range(0, len(x), chunk):
            d = np.sqrt(((x[i : i + chunk, None, :] - y[None, :, :]) ** 2).sum(-1))
            worst = max(worst, float(d.min(axis=1).max()))
        return worst

    return max(one_sided(a, b), one_sided(b, a))


def f_score(a: np.ndarray, b: np.ndarray, threshold: float = 0.01, chunk: int = 4096) -> float:
    """F-score at a distance threshold (precision/recall of surface samples)."""

    def fraction_within(x, y):
        hits = 0
        for i in range(0, len(x), chunk):
            d = np.sqrt(((x[i : i + chunk, None, :] - y[None, :, :]) ** 2).sum(-1))
            hits += int((d.min(axis=1) < threshold).sum())
        return hits / max(len(x), 1)

    precision = fraction_within(a, b)
    recall = fraction_within(b, a)
    if precision + recall == 0:
        return 0.0
    return 2 * precision * recall / (precision + recall)
