"""Render the quality-harness JSONs into the markdown tables README/PARITY
publish.

Inputs are what the harnesses write:
  * export_meshes → <out>/recon_metrics.json  (AE reconstruction, per split)
  * eval_gen_quality → <out>/gen_quality.json (MMD-Chamfer / COV per class)

Usage:
  python scripts/make_quality_report.py \
      --recon train=/tmp/recon_train test=/tmp/recon_test \
      --gen /tmp/surfd_gen_eval --meta "AE step 15725, res 128, CPU fallback"

The reference ships no metric code at all (SURVEY.md §6: the paper's tables
have no in-repo reproduction, AutoEncoder/encdec/export_meshes.py computes
nothing); this formatter is part of closing that gap end to end.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _load(path: str, name: str) -> dict:
    p = os.path.join(path, name) if os.path.isdir(path) else path
    with open(p) as f:
        return json.load(f)


def recon_table(splits: dict[str, dict]) -> str:
    classes: list[str] = []
    for s in splits.values():
        for c in s.get("per_class", {}):
            if c not in classes:
                classes.append(c)
    lines = [
        "| split | n | Chamfer ↓ | Hausdorff ↓ | F-score@0.01 ↑ | "
        + " | ".join(f"{c} CD" for c in classes) + " |",
        "|---|---|---|---|---|" + "---|" * len(classes),
    ]
    for name, s in splits.items():
        per = s.get("per_class", {})
        cells = [
            name,
            str(s["n"]) + (f" ({s['n_empty']} empty)" if s.get("n_empty") else ""),
            f"{s['mean_chamfer']:.5f}" if s.get("mean_chamfer") is not None else "—",
            f"{s['mean_hausdorff']:.5f}" if s.get("mean_hausdorff") is not None else "—",
            f"{s['mean_f_score@0.01']:.3f}"
            if s.get("mean_f_score@0.01") is not None else "—",
        ] + [
            f"{per[c]['chamfer']:.5f}" if c in per else "—" for c in classes
        ]
        lines.append("| " + " | ".join(cells) + " |")
    return "\n".join(lines)


def gen_table(gen: dict) -> str:
    lines = [
        "| class | MMD-Chamfer ↓ | COV ↑ | 1-NNA →0.5 | empty |",
        "|---|---|---|---|---|",
    ]
    for cname, r in gen.items():
        if cname.startswith("_"):
            continue
        mmd = f"{r['mmd_chamfer']:.5f}" if r.get("mmd_chamfer") is not None else "—"
        nna = f"{r['one_nna']:.2f}" if r.get("one_nna") is not None else "—"
        lines.append(
            f"| {cname} | {mmd} | {r['cov']:.2f} | {nna} | {r.get('n_empty', 0)} |"
        )
    meta = gen.get("_meta", {})
    if meta:
        lines.append(
            f"\n(guidance {meta.get('guidance')}, {meta.get('per_class')} samples/"
            f"class at {meta.get('resolution')}³, wall {meta.get('wall_s')}s)"
        )
    return "\n".join(lines)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--recon", nargs="*", default=[],
                    help="split=dir pairs (dir holds recon_metrics.json)")
    ap.add_argument("--gen", default="",
                    help="dir holding gen_quality.json (or the file itself)")
    ap.add_argument("--meta", default="", help="one-line provenance note")
    args = ap.parse_args()

    if args.meta:
        print(f"_{args.meta}_\n")
    if args.recon:
        splits = {}
        for pair in args.recon:
            name, _, path = pair.partition("=")
            splits[name] = _load(path, "recon_metrics.json")
        print("### AE reconstruction (export_meshes harness)\n")
        print(recon_table(splits))
        print()
    if args.gen:
        print("### Generation quality (eval_gen_quality harness)\n")
        print(gen_table(_load(args.gen, "gen_quality.json")))
    if not args.recon and not args.gen:
        sys.exit("nothing to report: pass --recon and/or --gen")


if __name__ == "__main__":
    main()
