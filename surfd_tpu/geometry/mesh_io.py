"""Minimal OBJ/PLY mesh I/O (replaces open3d read/write_triangle_mesh,
SURVEY.md §2.11 item 9)."""

from __future__ import annotations

import numpy as np

from .marching import Mesh


def write_obj(path: str, mesh: Mesh) -> None:
    v = np.asarray(mesh.vertices, dtype=np.float64)
    f = np.asarray(mesh.faces, dtype=np.int64) + 1  # OBJ is 1-indexed
    with open(path, "w") as fh:
        fh.write("# surfd_tpu mesh\n")
        np.savetxt(fh, v, fmt="v %.8g %.8g %.8g")
        np.savetxt(fh, f, fmt="f %d %d %d")


def read_obj(path: str) -> Mesh:
    verts, faces = [], []
    with open(path) as fh:
        for line in fh:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif line.startswith("f "):
                idx = [p.split("/")[0] for p in line.split()[1:]]
                idx = [int(i) for i in idx]
                # triangulate polygon fans
                for k in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[k], idx[k + 1]])
    v = np.asarray(verts, dtype=np.float32)
    f = np.asarray(faces, dtype=np.int64)
    f = np.where(f > 0, f - 1, len(v) + f)  # handle negative OBJ indices
    return Mesh(v, f)


def write_ply(path: str, mesh: Mesh) -> None:
    v = np.asarray(mesh.vertices, dtype=np.float32)
    f = np.asarray(mesh.faces, dtype=np.int32)
    with open(path, "wb") as fh:
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {len(v)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            f"element face {len(f)}\n"
            "property list uchar int vertex_indices\nend_header\n"
        )
        fh.write(header.encode())
        fh.write(v.astype("<f4").tobytes())
        counts = np.full((len(f), 1), 3, dtype=np.uint8)
        rows = np.concatenate(
            [counts.view(np.uint8), f.astype("<i4").view(np.uint8).reshape(len(f), -1)],
            axis=1,
        )
        fh.write(rows.tobytes())
