"""Shared plumbing for the generation CLIs.

All five reference scripts share one skeleton (SURVEY.md §2.8): load model →
sample latents → decode UDF grids → extract + clean meshes → write. The
checkpoint story differs from the reference (torch .pt): denoiser state comes
from an Orbax run directory and AE weights from an npz export
(utils/checkpoint.py save_params_npz) — `--random-init` runs the pipe with
fresh weights for smoke testing.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def base_parser(desc: str) -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=desc)
    ap.add_argument("--ae_dir", default="", help="AE run dir (ae.npz + config.json)")
    ap.add_argument("--model_path", default="", help="diffusion run dir (orbax) or npz")
    ap.add_argument("--random-init", action="store_true", help="fresh weights (smoke test)")
    ap.add_argument("--num_samples", type=int, default=2)
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--latent_size", type=int, default=32)
    ap.add_argument("--model_channels", type=int, default=224)
    # decoder dims are hardcoded 512/5 in the reference (generate_uncond.py:58-65);
    # exposed here so small-AE runs can round-trip
    ap.add_argument("--decoder_hidden", type=int, default=512)
    ap.add_argument("--decoder_layers", type=int, default=5)
    ap.add_argument("--sampler", default="ddpm", choices=["ddpm", "ddim", "plms"])
    ap.add_argument("--timestep_respacing", default="")
    ap.add_argument(
        "--noise_schedule", default="cosine", choices=["linear", "cosine"]
    )
    ap.add_argument("--diffusion_steps", type=int, default=1000)
    # reference --sigma_small default True (parser_util.py): FIXED_SMALL
    # posterior variance; --no-sigma_small selects FIXED_LARGE (betas)
    ap.add_argument(
        "--sigma_small", action=argparse.BooleanOptionalAction, default=True
    )
    ap.add_argument("--guidance_param", type=float, default=1.0)
    # reference generate scripts all pass clip_denoised=False
    # (generate_uncond.py:77) — latents are unbounded
    ap.add_argument(
        "--clip_denoised", action=argparse.BooleanOptionalAction, default=False
    )
    # 0 = auto: the --category_list length when one is given, else the
    # reference default 9 (parser_util.py) — overridable so category models
    # trained on other class sets round-trip
    ap.add_argument("--num_actions", type=int, default=0)
    ap.add_argument("--seed", type=int, default=10)
    ap.add_argument("--output_dir", default="outputs")
    ap.add_argument("--watertight", action="store_true")
    # pymeshlab-equivalent defaults (reference generate_uncond.py:117-122)
    ap.add_argument("--min_component_faces", type=int, default=2500)
    ap.add_argument("--smooth_iters", type=int, default=3)
    ap.add_argument("--max_batch", type=int, default=2**17)
    ap.add_argument(
        "--surface_bias", default="auto",
        help="decoder surface-bias calibration: auto (estimate the UDF floor "
        "from the fill's block minima and subtract it), none, or a float",
    )
    ap.add_argument(
        "--data_parallel", action="store_true",
        help="shard the UDF grid-query stream over all devices ('data' mesh axis)",
    )
    ap.add_argument(
        "--pipeline_depth", type=int, default=1,
        help="overlap host/device phases across samples (2 on PCIe-attached "
        "hosts; keep 1 on serial tunnelled links — see pipelines/batch.py)",
    )
    return ap


# Training-time settings that generation must reproduce or the checkpoint
# will not load (or worse, load into the wrong architecture). Saved key →
# generation-args attribute. Mirrors the reference's parse_and_load_from_model
# (/root/reference/utils/parser_util.py:7-20), which re-merges the model/
# diffusion arg groups from the run dir's args.json over the sampling CLI.
_DIFFUSION_MERGE_KEYS = {
    "latent_size": "latent_size",
    "model_channels": "model_channels",
    "num_actions": "num_actions",
    "noise_schedule": "noise_schedule",
    "diffusion_steps": "diffusion_steps",
}
_AE_MERGE_KEYS = {
    "latent_size": "latent_size",
    "hidden_dim": "decoder_hidden",
    "num_hidden_layers": "decoder_layers",
}


def parse_surface_bias(s) -> float | str:
    """--surface_bias value: "auto" | "none"/"off" | a float in UDF units."""
    if isinstance(s, (int, float)):
        return float(s)
    s = str(s).strip().lower()
    if s == "auto":
        return "auto"
    if s in ("none", "off", ""):
        return 0.0
    return float(s)


def _explicit_cli_keys(argv) -> set:
    """Attribute names the user explicitly passed on the command line."""
    if argv is None:
        argv = sys.argv[1:]
    keys = set()
    for tok in argv:
        if tok.startswith("--"):
            keys.add(tok[2:].split("=", 1)[0].replace("-", "_"))
    return keys


def merge_saved_args(args, argv=None):
    """Overlay training-time model args from the run dirs onto `args`.

    Reads `{model_path}/args.json` (written by cli/train_diffusion.py) and
    `{ae_dir}/args.json` (written by cli/train_ae.py) and overrides the
    architecture keys the checkpoints were trained with, so sampling a
    checkpoint trained at non-default dims needs no re-typed flags. Flags the
    user explicitly passed on the command line win, matching the reference's
    behavior for its --latent_size overwrite (parser_util.py:15-18).
    """
    explicit = _explicit_cli_keys(argv)

    def overlay(run_dir: str, key_map: dict, label: str):
        path = os.path.join(run_dir, "args.json")
        if not (run_dir and os.path.isdir(run_dir) and os.path.exists(path)):
            return
        import json

        with open(path) as f:
            saved = json.load(f)
        for saved_key, attr in key_map.items():
            if saved_key not in saved or attr in explicit:
                continue
            cur = getattr(args, attr, None)
            if cur != saved[saved_key]:
                print(
                    f"[{label} args.json] {attr}: {cur} -> {saved[saved_key]}",
                    file=sys.stderr,
                )
            setattr(args, attr, saved[saved_key])
        # max_dist changes the UDF the decoder was trained to predict — the
        # extraction must use the training value (no CLI flag exposes it)
        if label == "ae" and "max_dist" in saved:
            args.ae_max_dist = float(saved["max_dist"])

    overlay(getattr(args, "model_path", ""), _DIFFUSION_MERGE_KEYS, "diffusion")
    overlay(getattr(args, "ae_dir", ""), _AE_MERGE_KEYS, "ae")
    return args


def build_schedule(args):
    from ..diffusion import named_beta_schedule, named_schedule, space_timesteps, spaced_schedule

    name = getattr(args, "noise_schedule", "cosine")
    steps = getattr(args, "diffusion_steps", 1000)
    if args.timestep_respacing:
        base = named_beta_schedule(name, steps)
        return spaced_schedule(base, space_timesteps(steps, args.timestep_respacing))
    return named_schedule(name, steps)


def load_denoiser(args, cond_mode: str):
    """MDM + params from --model_path (npz or orbax dir) or random init."""
    from ..models import MDM

    mdm = MDM(cond_mode=cond_mode, clip_dim=512,
              model_channels=getattr(args, "model_channels", 224),
              num_actions=getattr(args, "num_actions", 0) or 9)
    L = args.latent_size
    x = jnp.zeros((1, L, 1))
    t = jnp.zeros((1,), jnp.int32)
    kw = {}
    if cond_mode in ("text", "sketch", "img"):
        kw["context"] = jnp.zeros((1, 512))
    elif cond_mode == "category":
        kw["action"] = jnp.zeros((1,), jnp.int32)
    variables = mdm.init(jax.random.PRNGKey(0), x, t, **kw)
    if args.random_init or not args.model_path:
        if not args.random_init:
            print("WARNING: no --model_path given; using random weights", file=sys.stderr)
        return mdm, variables
    from ..utils.checkpoint import load_params_npz

    if args.model_path.endswith(".npz"):
        params = load_params_npz(args.model_path, variables["params"])
        return mdm, {"params": params}
    # orbax run dir: restore the train state and take (ema_)params
    from ..training import create_train_state, make_optimizer
    from ..utils.checkpoint import Checkpointer

    state = create_train_state(variables["params"], make_optimizer())
    restored = Checkpointer(args.model_path).restore(jax.tree.map(np.asarray, state))
    params = restored.ema_params if restored.ema_params is not None else restored.params
    return mdm, {"params": params}


def load_decoder(args):
    """CbnDecoder + variables from --ae_dir/ae.npz (flat npz of params and
    batch_stats) or random init."""
    from ..models import CbnDecoder, CoordsEncoder

    decoder = CbnDecoder(
        latent_dim=args.latent_size,
        hidden_dim=getattr(args, "decoder_hidden", 512),
        num_hidden_layers=getattr(args, "decoder_layers", 5),
    )
    ce = CoordsEncoder()
    variables = decoder.init(
        jax.random.PRNGKey(1),
        ce.encode(jnp.zeros((1, 8, 3))),
        jnp.zeros((1, args.latent_size)),
    )
    path = os.path.join(args.ae_dir, "ae_decoder.npz") if args.ae_dir else ""
    if path and os.path.exists(path):
        from ..utils.checkpoint import load_params_npz

        variables = load_params_npz(path, variables)
    elif not args.random_init:
        print("WARNING: no AE decoder weights found; using random weights", file=sys.stderr)
    return decoder, variables


def run_generation(args, cond_mode: str, context=None, action=None, tag: str = "sample"):
    """Sample latents and extract one mesh per sample."""
    from ..geometry import write_obj
    from ..models.mdm import make_cfg_model_fn
    from ..pipelines import (
        MeshExtractionConfig,
        get_mesh_from_udf,
        get_watertight_mesh_from_udf,
        make_udf_fn,
        sample_latents,
    )

    merge_saved_args(args)
    sched = build_schedule(args)
    mdm, variables = load_denoiser(args, cond_mode)
    decoder, dec_vars = load_decoder(args)

    model_fn = make_cfg_model_fn(
        mdm, variables, args.guidance_param, context=context, action=action
    )
    from ..diffusion import VarType

    var_type = (
        VarType.FIXED_SMALL if getattr(args, "sigma_small", True) else VarType.FIXED_LARGE
    )
    rng = jax.random.PRNGKey(args.seed)
    t0 = time.perf_counter()
    latents = sample_latents(
        sched, model_fn, args.num_samples, args.latent_size, rng,
        sampler=args.sampler, var_type=var_type,
        clip_denoised=getattr(args, "clip_denoised", False),
    )
    latents.block_until_ready()
    print(f"sampled {args.num_samples} latents in {time.perf_counter()-t0:.2f}s", file=sys.stderr)

    mesh_axes = None
    if getattr(args, "data_parallel", False) and len(jax.devices()) > 1:
        from ..parallel import make_mesh

        mesh_axes = make_mesh(data=len(jax.devices()), model=1)
        print(f"grid-query stream sharded over {len(jax.devices())} devices", file=sys.stderr)

    os.makedirs(args.output_dir, exist_ok=True)
    max_dist = getattr(args, "ae_max_dist", 0.1)  # training value via merge_saved_args
    cfg = MeshExtractionConfig(
        resolution=args.resolution,
        max_batch=args.max_batch,
        max_dist=max_dist,
        min_component_faces=args.min_component_faces,
        final_laplacian_iters=args.smooth_iters,
        mesh=mesh_axes,
        surface_bias=parse_surface_bias(getattr(args, "surface_bias", "auto")),
    )
    # Extractions run through the batch generator; --pipeline_depth 2
    # overlaps sample k's host passes (marching emit, cleanup) with sample
    # k+1's device passes on hosts whose device link can take it
    # (pipelines/batch.py documents the measured tradeoff).
    from ..pipelines import generate_meshes_pipelined

    depth = max(1, getattr(args, "pipeline_depth", 1))
    fns = (make_udf_fn(decoder, dec_vars, latents[k]) for k in range(args.num_samples))
    out_paths = []
    t0 = time.perf_counter()
    gen = generate_meshes_pipelined(fns, cfg, watertight=args.watertight, depth=depth)
    for k, mesh in enumerate(gen):
        path = os.path.join(args.output_dir, f"{tag}_{k}.obj")
        write_obj(path, mesh)
        print(
            f"[{k}] {len(mesh.vertices)} verts / {len(mesh.faces)} faces "
            f"at t+{time.perf_counter()-t0:.2f}s → {path}",
            file=sys.stderr,
        )
        out_paths.append(path)
    return out_paths
