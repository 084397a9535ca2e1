"""Host-only repro for the run-over-run mt_pass2/marching degradation
(VERDICT r3 weak #2): repeatedly extract the SAME analytic sphere UDF grid
through the native marching path — no TPU, no tunnel — and print per-phase
times + process RSS after every run.

If times grow monotonically here, the cause is host-side (allocator /
page-fault behavior); if they are flat, the degradation lives in the
device-interaction path (grid fill / face filter interleaving).

Usage: python scripts/profile_mt_repeat.py [--resolution 512] [--runs 10]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def rss_mb() -> float:
    with open("/proc/self/statm") as fh:
        return int(fh.read().split()[1]) * 4096 / 1e6


def build_sphere_field(R: int, radius=0.6, max_dist=0.1):
    """Dense UDF grid of a sphere + analytic gradient lookup, built slab-wise
    to keep peak temporaries small on the 1-vCPU host."""
    xs = np.linspace(-1, 1, R, dtype=np.float32)
    grid = np.empty((R, R, R), np.float32)
    for i in range(R):
        yy, zz = np.meshgrid(xs, xs, indexing="ij")
        r = np.sqrt(xs[i] ** 2 + yy**2 + zz**2)
        grid[i] = np.minimum(np.abs(r - radius), max_dist)
    return grid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--runs", type=int, default=10)
    ap.add_argument("--churn-mb", type=int, default=0,
                    help="allocate+free this many MB of numpy arrays between "
                         "runs to emulate the pipeline's interleaved buffers")
    args = ap.parse_args()
    R = args.resolution

    from surfd_tpu.geometry.marching import marching_tetrahedra_udf

    t0 = time.perf_counter()
    grid = build_sphere_field(R)
    print(f"grid built in {time.perf_counter()-t0:.1f}s rss={rss_mb():.0f}MB",
          file=sys.stderr)

    xs = np.linspace(-1, 1, R, dtype=np.float32)

    def grad_at(pts):
        n = np.linalg.norm(pts, axis=-1, keepdims=True)
        return pts / np.maximum(n, 1e-9)  # outward for r>radius; sign flips
        # inside are irrelevant for the sphere (no crossings there)

    def grad_sphere(pts):
        r = np.linalg.norm(pts, axis=-1, keepdims=True)
        d = pts / np.maximum(r, 1e-9)
        return np.where(r >= 0.6, d, -d).astype(np.float32)

    keep = None
    for i in range(args.runs):
        times = {}
        t0 = time.perf_counter()
        mesh = marching_tetrahedra_udf(grid, grad_sphere, times=times)
        dt = time.perf_counter() - t0
        print(
            f"run {i}: {dt:6.2f}s rss={rss_mb():7.0f}MB "
            f"V={len(mesh.vertices)} F={len(mesh.faces)}  {times}",
            file=sys.stderr, flush=True,
        )
        if args.churn_mb:
            # emulate pipeline interleaving: hold the previous mesh while
            # allocating fresh buffers, as get_mesh_from_udf does
            keep = [np.random.rand(args.churn_mb * 131072) for _ in range(1)]
            del keep


if __name__ == "__main__":
    main()
