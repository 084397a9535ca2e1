"""Chamfer parity harness: UDF extraction vs oracle-signs extraction.

Measures, at a given resolution, how far the UDF marching-tetrahedra surface
(sign recovery from gradients — the hard part the reference solves with its
BFS vote machinery, _marching_cubes_lewiner_cy.pyx:1160-1374) deviates from
(a) the SAME triangulation run with the true signs, and (b) the analytic
surface. Prints a markdown table (pasted into PARITY.md).

Usage: python scripts/chamfer_parity.py [R=256]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from surfd_tpu.geometry.analytic import FIXTURES
from surfd_tpu.geometry.marching import marching_tetrahedra, marching_tetrahedra_udf
from surfd_tpu.geometry.metrics import chamfer_distance, hausdorff_distance


def run(R: int):
    voxel = 2.0 / (R - 1)
    rng = np.random.default_rng(0)
    print(f"R = {R}, voxel = {voxel:.5f}\n")
    print("| fixture | verts (udf) | vs oracle-signs: RMS/voxel | Hausdorff/voxel "
          "| vs analytic: RMS/voxel | Hausdorff/voxel | time (s) |")
    print("|---|---|---|---|---|---|---|")
    for name, make in FIXTURES.items():
        sdf, udf, grad, sample = make(R)
        t0 = time.perf_counter()
        m_udf = marching_tetrahedra_udf(udf, grad)
        dt = time.perf_counter() - t0

        true_pts = sample(len(m_udf.vertices), rng)

        if sdf is not None:
            m_oracle = marching_tetrahedra(sdf, iso=0.0)
            ch = chamfer_distance(m_udf.vertices, m_oracle.vertices)
            hd = hausdorff_distance(m_udf.vertices, m_oracle.vertices)
        else:
            # open surface: the oracle IS the analytic sheet (no signed field
            # exists — the entire reason Surf-D uses UDFs)
            ch = chamfer_distance(m_udf.vertices, true_pts)
            hd = hausdorff_distance(m_udf.vertices, true_pts)
        rms = np.sqrt(ch / 2.0)

        ch_t = chamfer_distance(m_udf.vertices, true_pts)
        hd_t = hausdorff_distance(m_udf.vertices, true_pts)
        rms_t = np.sqrt(ch_t / 2.0)
        print(
            f"| {name} | {len(m_udf.vertices)} | {rms / voxel:.3f} | {hd / voxel:.3f} "
            f"| {rms_t / voxel:.3f} | {hd_t / voxel:.3f} | {dt:.2f} |"
        )


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
