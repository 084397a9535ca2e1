"""CLI smoke tests: drive the user-facing entry points end-to-end on tiny
shapes with random weights (the reference has no CLI tests at all)."""

import os
import subprocess
import sys

import numpy as np
import pytest

ENV = dict(
    os.environ,
    JAX_PLATFORMS="cpu",
    XLA_FLAGS=os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=1200):
    return subprocess.run(
        [sys.executable, "-m"] + args,
        cwd=REPO, env=ENV, capture_output=True, text=True, timeout=timeout,
    )


def test_build_schedule_honors_flags():
    """--noise_schedule/--diffusion_steps flow into the schedule (reference
    parser_util.py diffusion group; ours previously hardcoded cosine/1000)."""
    from surfd_tpu.cli._common import base_parser, build_schedule
    from surfd_tpu.diffusion import named_beta_schedule

    args = base_parser("t").parse_args(
        ["--noise_schedule", "linear", "--diffusion_steps", "100"]
    )
    sched = build_schedule(args)
    assert sched.num_timesteps == 100
    np.testing.assert_allclose(
        np.asarray(sched.betas), named_beta_schedule("linear", 100), rtol=1e-6
    )
    # respacing sections come from the configured total, not 1000
    args = base_parser("t").parse_args(
        ["--noise_schedule", "linear", "--diffusion_steps", "100",
         "--timestep_respacing", "ddim25"]
    )
    assert build_schedule(args).num_timesteps == 25
    assert not args.sigma_small is False  # default True (reference parity)


def test_category_list_resolution(tmp_path):
    """--category_list format (full ids, as scripts/make_synthetic_corpus.py
    emits) resolves class indices and the 0=auto num_actions default."""
    from surfd_tpu.cli._common import base_parser
    from surfd_tpu.data.manifests import load_garment_categories

    p = tmp_path / "category_list.txt"
    p.write_text("sphere sphere_000 sphere_003\ntorus torus_001\nsheet sheet_002\n")
    id2cat, cat2name = load_garment_categories(str(p))
    assert id2cat == {"sphere_000": 0, "sphere_003": 0, "torus_001": 1, "sheet_002": 2}
    assert [cat2name[i] for i in sorted(cat2name)] == ["sphere", "torus", "sheet"]
    # base_parser: 0 = auto sentinel so a 3-class list round-trips through
    # generate CLIs without clobbering by the reference default 9
    assert base_parser("t").parse_args([]).num_actions == 0


def test_merge_saved_args(tmp_path):
    """Generation re-merges training-time model args from the run dirs'
    args.json (reference utils/parser_util.py:7-20 parse_and_load_from_model);
    explicit CLI flags win (its --latent_size overwrite, :15-18)."""
    import json

    from surfd_tpu.cli._common import base_parser, merge_saved_args

    diff_dir = tmp_path / "diffusion"
    ae_dir = tmp_path / "ae"
    diff_dir.mkdir(), ae_dir.mkdir()
    (diff_dir / "args.json").write_text(json.dumps({
        "latent_size": 48, "model_channels": 96, "num_actions": 3,
        "noise_schedule": "linear", "diffusion_steps": 500,
    }))
    (ae_dir / "args.json").write_text(json.dumps({
        "latent_size": 48, "hidden_dim": 256, "num_hidden_layers": 4,
        "max_dist": 0.2,
    }))

    argv = ["--model_path", str(diff_dir), "--ae_dir", str(ae_dir)]
    args = merge_saved_args(base_parser("t").parse_args(argv), argv)
    assert (args.latent_size, args.model_channels, args.num_actions) == (48, 96, 3)
    assert (args.noise_schedule, args.diffusion_steps) == ("linear", 500)
    assert (args.decoder_hidden, args.decoder_layers) == (256, 4)
    assert args.ae_max_dist == 0.2

    # explicit CLI flags beat the saved args
    argv = argv + ["--latent_size", "16", "--noise_schedule=cosine"]
    args = merge_saved_args(base_parser("t").parse_args(argv), argv)
    assert args.latent_size == 16 and args.noise_schedule == "cosine"
    assert args.model_channels == 96  # non-explicit keys still merged

    # an npz --model_path or a missing args.json is a silent no-op
    argv = ["--model_path", str(tmp_path / "w.npz")]
    args = merge_saved_args(base_parser("t").parse_args(argv), argv)
    assert args.latent_size == 32 and args.model_channels == 224


@pytest.mark.slow
def test_generate_uncond_smoke(tmp_path):
    r = _run([
        "surfd_tpu.cli.generate_uncond", "--random-init",
        "--num_samples", "1", "--resolution", "48", "--model_channels", "32",
        "--min_component_faces", "0", "--smooth_iters", "0",
        "--timestep_respacing", "ddim10",
        "--output_dir", str(tmp_path),
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    # an OBJ file was produced (possibly empty mesh with random weights)
    assert (tmp_path / "uncond_0.obj").exists()


@pytest.mark.slow
def test_generate_cat_smoke(tmp_path):
    r = _run([
        "surfd_tpu.cli.generate_cat", "--random-init", "--category", "dress",
        "--num_samples", "1", "--resolution", "48", "--model_channels", "32",
        "--min_component_faces", "0", "--smooth_iters", "0",
        "--timestep_respacing", "ddim10", "--sampler", "ddim",
        "--output_dir", str(tmp_path),
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "cat0_0.obj").exists()


@pytest.mark.slow
def test_preprocess_and_train_ae_smoke(tmp_path):
    # build two tiny sphere meshes
    from surfd_tpu.geometry import marching_tetrahedra, write_obj

    xs = np.linspace(-1, 1, 24)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), axis=-1)
    mesh = marching_tetrahedra(np.linalg.norm(g, axis=-1) - 0.6, iso=0.0)
    mdir = tmp_path / "meshes"
    mdir.mkdir()
    write_obj(str(mdir / "a.obj"), mesh)
    write_obj(str(mdir / "b.obj"), mesh)

    r = _run([
        "surfd_tpu.cli.preprocess_udfs", "--mesh_root", str(mdir),
        "--out_root", str(tmp_path / "data"), "--num_points_pcd", "512",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    files = list((tmp_path / "data" / "train").glob("*.npz"))
    assert len(files) == 2
    z = np.load(files[0])
    assert z["pcd"].shape == (512, 3)

    # AE training for 2 epochs on the tiny data
    r = _run([
        "surfd_tpu.cli.train_ae", "--data_root", str(tmp_path / "data"),
        "--save_dir", str(tmp_path / "ae"), "--latent_size", "8",
        "--hidden_dim", "32", "--num_hidden_layers", "1",
        "--num_points_pcd", "128", "--num_points_forward", "256",
        "--batch_size", "2", "--num_epochs", "2", "--log_interval", "1",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "ae" / "ae_decoder.npz").exists()
    assert (tmp_path / "ae" / "metrics.jsonl").exists()


@pytest.mark.slow
def test_train_diffusion_smoke(tmp_path):
    # minimal dataset
    from surfd_tpu.geometry import marching_tetrahedra
    from surfd_tpu.data.preprocess import PreprocessConfig, prepare_udf_sample

    xs = np.linspace(-1, 1, 24)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), axis=-1)
    mesh = marching_tetrahedra(np.linalg.norm(g, axis=-1) - 0.6, iso=0.0)
    payload = prepare_udf_sample(
        mesh, PreprocessConfig(num_points_pcd=256, counts=(128, 64, 16), num_uniform=16)
    )
    d = tmp_path / "data" / "train"
    d.mkdir(parents=True)
    for name in ("a", "b"):
        np.savez(d / f"{name}.npz", **payload)

    r = _run([
        "surfd_tpu.cli.train_diffusion", "--data_root", str(tmp_path / "data"),
        "--save_dir", str(tmp_path / "diff"), "--latent_size", "8", "--model_channels", "32",
        "--batch_size", "2", "--num_steps", "3", "--num_points_pcd", "64",
        "--log_interval", "1", "--save_interval", "1000",
    ], timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "diff" / "args.json").exists()
    assert (tmp_path / "diff" / "metrics.jsonl").exists()
