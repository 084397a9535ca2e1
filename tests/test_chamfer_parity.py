"""Chamfer-level parity criteria for the UDF extractor (VERDICT r1 missing #3).

The reference Cython extractor cannot be compiled here (no Cython, installs
forbidden), so the oracle is the strongest available substitute: the same MT
triangulation run with the TRUE signs of the analytic field. Recovering signs
from gradients is the only thing that distinguishes a UDF extractor from a
classic one (it is what the reference's 600-line BFS vote machinery does,
_marching_cubes_lewiner_cy.pyx:1160-1374) — so UDF-vs-oracle Chamfer measures
exactly the sign-recovery error. On closed analytic surfaces our crossing-
parity recovery is EXACT (bitwise-identical mesh); vs the analytic surface
the error is pure interpolation, RMS ≈ 0.27 voxel.

scripts/chamfer_parity.py runs the same harness at 256³/512³; measured
numbers live in PARITY.md.
"""

import numpy as np
import pytest

from surfd_tpu.geometry.analytic import sheet_fields, sphere_fields, torus_fields
from surfd_tpu.geometry.marching import marching_tetrahedra, marching_tetrahedra_udf
from surfd_tpu.geometry.metrics import chamfer_distance, hausdorff_distance

R = 96
VOXEL = 2.0 / (R - 1)


@pytest.mark.parametrize("make", [sphere_fields, torus_fields], ids=["sphere", "torus"])
def test_udf_extraction_matches_oracle_signs_exactly(make):
    """Closed surfaces: sign recovery from gradients must reproduce the
    oracle-signs mesh exactly (same triangulation, same interpolation)."""
    sdf, udf, grad, _ = make(R)
    m_udf = marching_tetrahedra_udf(udf, grad)
    m_oracle = marching_tetrahedra(sdf, iso=0.0)
    assert len(m_udf.vertices) > 1000
    hd = hausdorff_distance(m_udf.vertices, m_oracle.vertices)
    assert hd < 1e-5 * VOXEL, f"sign recovery diverged: Hausdorff {hd / VOXEL:.3f} voxels"
    # face counts agree too (identical triangulation up to ordering)
    assert len(m_udf.faces) == len(m_oracle.faces)


@pytest.mark.parametrize(
    "make", [sphere_fields, torus_fields, sheet_fields],
    ids=["sphere", "torus", "open_sheet"],
)
def test_udf_extraction_chamfer_vs_analytic_surface(make):
    """All fixtures (incl. the open sheet, which no signed method can
    represent): sub-voxel Chamfer against the true surface."""
    _, udf, grad, sample = make(R)
    mesh = marching_tetrahedra_udf(udf, grad)
    true_pts = sample(max(len(mesh.vertices), 10000), np.random.default_rng(0))
    rms = np.sqrt(chamfer_distance(mesh.vertices, true_pts) / 2.0)
    hd = hausdorff_distance(mesh.vertices, true_pts)
    assert rms < 0.5 * VOXEL, f"RMS {rms / VOXEL:.3f} voxels"
    # the sheet mesh overhangs its open boundary by up to ~1 voxel (the UDF
    # rounds the edge); closed surfaces stay within a voxel everywhere
    assert hd < 1.5 * VOXEL, f"Hausdorff {hd / VOXEL:.3f} voxels"


def test_numpy_and_native_extractors_agree():
    """The C++ fast path and the numpy reference implementation are the same
    algorithm — meshes must coincide geometrically."""
    from surfd_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    _, udf, grad, _ = torus_fields(64)
    m_np = marching_tetrahedra_udf(udf, grad, use_native=False)
    m_cc = marching_tetrahedra_udf(udf, grad, use_native=True)
    assert len(m_np.faces) == len(m_cc.faces)
    hd = hausdorff_distance(m_np.vertices, m_cc.vertices)
    assert hd < 1e-5
