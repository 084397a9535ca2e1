"""Generation-quality harness for a trained diffusion model.

The reference ships no generative metrics (SURVEY.md §6: the paper's
Chamfer/FPD tables have no in-repo code); this closes that loop for the
synthetic-corpus quality run (VERDICT r2 #3). For each category it samples
latents with CFG, extracts meshes, and reports the two standard set metrics
against the training corpus surfaces:

  * MMD-Chamfer  — mean over samples of min_train Chamfer(sample, train):
                   how close each generated shape is to the data manifold.
  * COV          — fraction of train shapes that are the nearest neighbour of
                   some sample (coverage/mode collapse indicator).

Usage:
  python scripts/eval_gen_quality.py --data_root /tmp/surfd_corpus \
      --ae_dir /tmp/surfd_ae --model_path /tmp/surfd_diff/ckpt \
      --category_list /tmp/surfd_corpus/category_list.txt \
      --per_class 4 --resolution 256 --out /tmp/surfd_gen_eval
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/surfd_jax_cache")
jax.config.update("jax_compilation_cache_dir", "/tmp/surfd_jax_cache")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--ae_dir", required=True)
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--category_list", required=True)
    ap.add_argument("--latent_size", type=int, default=32)
    ap.add_argument("--model_channels", type=int, default=224)
    ap.add_argument("--per_class", type=int, default=4)
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--guidance_param", type=float, default=2.0)
    ap.add_argument("--timestep_respacing", default="")
    ap.add_argument("--chamfer_points", type=int, default=4096)
    # floaters filter like the reference sample scripts (generate_uncond.py:
    # 117-122 mincomponentsize 2500); 0 disables
    ap.add_argument("--min_component_faces", type=int, default=2500)
    ap.add_argument("--surface_bias", default="auto",
                    help="decoder-floor calibration for extraction; 'auto' "
                         "matches the generate_* CLIs (config default is 0.0)")
    ap.add_argument("--seed", type=int, default=10)
    ap.add_argument("--out", default="/tmp/surfd_gen_eval")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    from surfd_tpu.cli._common import (
        build_schedule,
        load_decoder,
        load_denoiser,
        parse_surface_bias,
    )
    from surfd_tpu.data.manifests import load_garment_categories
    from surfd_tpu.geometry import write_obj
    from surfd_tpu.geometry.marching import Mesh
    from surfd_tpu.models.mdm import make_cfg_model_fn
    from surfd_tpu.pipelines import (
        MeshExtractionConfig,
        get_mesh_from_udf,
        make_udf_fn,
        sample_latents,
    )

    rng = np.random.default_rng(args.seed)
    id2cat, cat2name = load_garment_categories(args.category_list)
    classes = [cat2name[i] for i in sorted(cat2name)]
    args.num_actions = len(classes)
    args.noise_schedule = getattr(args, "noise_schedule", "cosine")
    args.diffusion_steps = 1000
    args.sigma_small = True
    args.random_init = False
    args.decoder_hidden, args.decoder_layers = 512, 5

    # ground-truth meshes per class from the train split (exact BVH
    # surface-to-surface metrics, geometry.metrics.mesh_surface_metrics)
    from surfd_tpu.data import UdfDataset

    train = UdfDataset(args.data_root, "train")
    gt_by_class: dict[int, list] = {i: [] for i in range(len(classes))}
    gt_ids: dict[int, list[str]] = {i: [] for i in range(len(classes))}
    for i in range(len(train)):
        fid = train.item_id(i)
        c = id2cat.get(fid, None)
        if c is None:
            continue
        gt_by_class[c].append(train.mesh(i))
        gt_ids[c].append(fid)

    sched = build_schedule(args)
    mdm, variables = load_denoiser(args, "category")
    decoder, dec_vars = load_decoder(args)

    from surfd_tpu.diffusion import VarType

    results = {}
    t_all = time.perf_counter()
    for ci, cname in enumerate(classes):
        action = jnp.full((args.per_class,), ci, jnp.int32)
        model_fn = make_cfg_model_fn(
            mdm, variables, args.guidance_param, action=action
        )
        lat = np.asarray(sample_latents(
            sched, model_fn, args.per_class, args.latent_size,
            jax.random.PRNGKey(args.seed + ci), var_type=VarType.FIXED_SMALL,
        ))
        dists = []
        sample_pcs = []  # per-sample surface point clouds for 1-NNA
        for k in range(args.per_class):
            udf_fn = make_udf_fn(decoder, dec_vars, jnp.asarray(lat[k]))
            mesh, stats = get_mesh_from_udf(
                udf_fn,
                cfg=MeshExtractionConfig(
                    resolution=args.resolution,
                    min_component_faces=args.min_component_faces,
                    surface_bias=parse_surface_bias(args.surface_bias),
                ),
                return_stats=True,
            )
            path = os.path.join(args.out, f"{cname}_{k}.obj")
            if len(mesh.faces) == 0:
                print(f"[{cname} {k}] EMPTY mesh", flush=True)
                dists.append((np.inf, -1))
                continue
            out_mesh = Mesh(np.asarray(mesh.vertices), np.asarray(mesh.faces))
            write_obj(path, out_mesh)
            from surfd_tpu.data.preprocess import sample_points_on_mesh
            from surfd_tpu.geometry.metrics import mesh_surface_metrics

            sample_pcs.append(
                sample_points_on_mesh(out_mesh, args.chamfer_points, rng)
            )

            ds = [
                mesh_surface_metrics(mesh, g, n=args.chamfer_points, rng=rng)["chamfer"]
                for g in gt_by_class[ci]
            ]
            j = int(np.argmin(ds))
            dists.append((float(ds[j]), j))
            print(
                f"[{cname} {k}] {len(mesh.faces)} faces, "
                f"nearest {gt_ids[ci][j]} chamfer {ds[j]:.5f}", flush=True
            )
        finite = [d for d, _ in dists if np.isfinite(d)]
        covered = {j for _, j in dists if j >= 0}
        # 1-NNA vs an equal-size random GT subset (equal sizes keep the
        # two-sample null at 0.5); empty meshes simply shrink the sample set
        nna = None
        if sample_pcs:
            from surfd_tpu.data.preprocess import sample_points_on_mesh
            from surfd_tpu.geometry.metrics import one_nn_accuracy

            gt_pick = rng.choice(
                len(gt_by_class[ci]),
                size=min(len(sample_pcs), len(gt_by_class[ci])), replace=False,
            )
            gt_pcs = [
                sample_points_on_mesh(gt_by_class[ci][g], args.chamfer_points, rng)
                for g in gt_pick
            ]
            nna = one_nn_accuracy(sample_pcs, gt_pcs)
        results[cname] = {
            "mmd_chamfer": float(np.mean(finite)) if finite else None,
            "cov": len(covered) / max(1, len(gt_by_class[ci])),
            "one_nna": nna,
            "n_empty": int(sum(1 for d, _ in dists if not np.isfinite(d))),
            "per_sample": [
                {"chamfer": (None if not np.isfinite(d) else d),
                 "nearest": (gt_ids[ci][j] if j >= 0 else None)}
                for d, j in dists
            ],
        }

    results["_meta"] = {
        "guidance": args.guidance_param,
        "resolution": args.resolution,
        "per_class": args.per_class,
        "wall_s": round(time.perf_counter() - t_all, 1),
    }
    with open(os.path.join(args.out, "gen_quality.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
