"""Write a captions CSV for the synthetic corpus (text-conditioning runs).

The reference's text mode reads text2shape captions keyed by model id
(/root/reference/data_loaders/dataset.py:118-127). The synthetic corpus has
no captions, so this emits class-consistent ones (a few fixed templates per
family, assigned deterministically by item index) in the 2-column
`id,caption` form `load_text2shape_captions` accepts — enough signal for the
denoiser to learn caption→family conditioning through the frozen CLIP text
tower, and reusable verbatim as generation prompts.

Usage:
  python scripts/make_synthetic_captions.py --data_root data/surfd_corpus
"""

import argparse
import csv
import os
import sys

sys.path.insert(0, ".")

TEMPLATES = {
    "sphere": [
        "a smooth closed sphere",
        "a round ball",
        "a solid sphere shape",
    ],
    "torus": [
        "a torus",
        "a donut shaped ring",
        "a closed ring surface",
    ],
    "sheet": [
        "an open flat sheet",
        "a draped open surface",
        "a thin open sheet of fabric",
    ],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--splits", default="train,test")
    ap.add_argument("--out", default="", help="default: <data_root>/captions.csv")
    args = ap.parse_args()

    rows = []
    for split in args.splits.split(","):
        d = os.path.join(args.data_root, split)
        if not os.path.isdir(d):
            continue
        for f in sorted(os.listdir(d)):
            if not f.endswith(".npz"):
                continue
            fid = f[: -len(".npz")]
            fam = fid.rsplit("_", 1)[0]
            idx = int(fid.rsplit("_", 1)[1]) if fid.rsplit("_", 1)[1].isdigit() else 0
            pool = TEMPLATES.get(fam)
            if pool is None:
                continue
            # corpus ids interleave families with stride 3, so divide first
            # to actually cycle templates within a family
            rows.append((fid, pool[(idx // 3) % len(pool)]))

    out = args.out or os.path.join(args.data_root, "captions.csv")
    with open(out, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["id", "caption"])
        w.writerows(rows)
    print(f"wrote {out} ({len(rows)} captions)")


if __name__ == "__main__":
    main()
