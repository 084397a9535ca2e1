"""UDF preprocessing CLI: directory of OBJ meshes → npz training samples.

Parity with /root/reference/AutoEncoder/encdec/preprocess_udfs.py:35-162,
using the in-repo C++ BVH instead of open3d.

  python -m surfd_tpu.cli.preprocess_udfs --mesh_root MESHES --out_root DATA \
      --split train
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mesh_root", required=True)
    ap.add_argument("--out_root", required=True)
    ap.add_argument("--split", default="train")
    ap.add_argument("--num_points_pcd", type=int, default=100_000)
    ap.add_argument("--max_dist", type=float, default=0.1)
    ap.add_argument("--normalize", default="unit", choices=["none", "center", "box_center", "unit"])
    ap.add_argument("--limit", type=int, default=0)
    args = ap.parse_args()

    from ..data.preprocess import PreprocessConfig, normalize_mesh, prepare_udf_sample
    from ..geometry import read_obj

    import numpy as np

    cfg = PreprocessConfig(num_points_pcd=args.num_points_pcd, max_dist=args.max_dist)
    out_dir = Path(args.out_root) / args.split
    out_dir.mkdir(parents=True, exist_ok=True)

    meshes = sorted(Path(args.mesh_root).rglob("*.obj"))
    if args.limit:
        meshes = meshes[: args.limit]
    for i, path in enumerate(meshes):
        out = out_dir / f"{path.stem}.npz"
        if out.exists():
            continue
        mesh = read_obj(str(path))
        if args.normalize != "none":
            mesh = normalize_mesh(mesh, args.normalize)
        payload = prepare_udf_sample(mesh, cfg)
        np.savez(out, **payload)
        print(f"[{i+1}/{len(meshes)}] {path.name} → {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
