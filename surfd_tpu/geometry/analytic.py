"""Analytic signed/unsigned field fixtures for extraction parity harnesses.

The reference validates its UDF marching cubes only visually; SURVEY §7
"hard parts #1" demands Chamfer-level parity criteria for our marching-
tetrahedra redesign. The reference Cython extractor
(/root/reference/meshudf/_marching_cubes_lewiner_cy.pyx) cannot be compiled
in this environment (no Cython, installs forbidden), so the parity oracle is
*oracle-signs extraction*: run the same MT triangulation on the TRUE signed
field. Perfect sign recovery is exactly what the reference's BFS gradient-
vote machinery converges to (_cy.pyx:1160-1374), so UDF-vs-oracle Chamfer
bounds the sign-recovery error — the only part that distinguishes a UDF
extractor from a classic one.

Each fixture returns float32 grids indexed [x, y, z] over [-1, 1]³ plus an
analytic surface sampler for ground-truth Chamfer.
"""

from __future__ import annotations

import numpy as np


def _grid(R: int):
    xs = np.linspace(-1.0, 1.0, R, dtype=np.float32)
    return np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), axis=-1)


def sphere_fields(R: int, radius: float = 0.6):
    """Closed surface: sphere of given radius. Returns (sdf, udf, grad_udf,
    sample_surface(n, rng))."""
    g = _grid(R)
    d = np.linalg.norm(g, axis=-1)
    sdf = (d - radius).astype(np.float32)
    udf = np.abs(sdf)
    n = g / np.maximum(d[..., None], 1e-9)
    grad = (np.sign(sdf)[..., None] * n).astype(np.float32)

    def sample_surface(n_pts: int, rng: np.random.Generator):
        v = rng.normal(size=(n_pts, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        return (v * radius).astype(np.float32)

    return sdf, udf, grad, sample_surface


def torus_fields(R: int, ring: float = 0.55, tube: float = 0.25):
    """Closed genus-1 surface: torus around the z axis."""
    g = _grid(R)
    rho = np.sqrt(g[..., 0] ** 2 + g[..., 1] ** 2)
    q = np.stack([rho - ring, g[..., 2]], axis=-1)
    qn = np.linalg.norm(q, axis=-1)
    sdf = (qn - tube).astype(np.float32)
    udf = np.abs(sdf)
    # ∇sdf: d/dxyz of |(rho - ring, z)| - tube
    safe_rho = np.maximum(rho, 1e-9)
    safe_qn = np.maximum(qn, 1e-9)[..., None]
    grad_sdf = np.stack(
        [
            q[..., 0] / safe_qn[..., 0] * g[..., 0] / safe_rho,
            q[..., 0] / safe_qn[..., 0] * g[..., 1] / safe_rho,
            q[..., 1] / safe_qn[..., 0],
        ],
        axis=-1,
    )
    grad = (np.sign(sdf)[..., None] * grad_sdf).astype(np.float32)

    def sample_surface(n_pts: int, rng: np.random.Generator):
        theta = rng.uniform(0, 2 * np.pi, n_pts)
        phi = rng.uniform(0, 2 * np.pi, n_pts)
        rr = ring + tube * np.cos(phi)
        return np.stack(
            [rr * np.cos(theta), rr * np.sin(theta), tube * np.sin(phi)], axis=-1
        ).astype(np.float32)

    return sdf, udf, grad, sample_surface


def sheet_fields(R: int, half: float = 0.5):
    """OPEN surface: square sheet z=0, |x|,|y| ≤ half — the case signed
    extraction cannot represent (the reason Surf-D uses UDFs at all). No sdf
    exists; returns (None, udf, grad_udf, sample_surface)."""
    g = _grid(R)
    cp = g.copy()
    cp[..., 0] = np.clip(cp[..., 0], -half, half)
    cp[..., 1] = np.clip(cp[..., 1], -half, half)
    cp[..., 2] = 0.0
    delta = g - cp
    udf = np.linalg.norm(delta, axis=-1).astype(np.float32)
    grad = (delta / np.maximum(udf[..., None], 1e-9)).astype(np.float32)

    def sample_surface(n_pts: int, rng: np.random.Generator):
        xy = rng.uniform(-half, half, (n_pts, 2))
        return np.concatenate([xy, np.zeros((n_pts, 1))], axis=-1).astype(np.float32)

    return None, udf, grad, sample_surface


FIXTURES = {
    "sphere": sphere_fields,
    "torus": torus_fields,
    "open_sheet": sheet_fields,
}
