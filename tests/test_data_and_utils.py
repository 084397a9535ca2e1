"""Data layer + utils tests: preprocessing round trip, curriculum, config,
logger, checkpointing."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surfd_tpu.data import (
    CurriculumState,
    DiffusionDataset,
    SequenceSamplerComplement,
    SequenceSamplerTrain,
    UdfDataset,
    ae_batch_iterator,
    batched,
    compute_udf_from_mesh,
    diffusion_batch_iterator,
    mask2bbox,
    normalize_mesh,
    prepare_udf_sample,
    crop_square,
    random_point_sampling,
    sample_points_around_pcd,
    sample_points_on_mesh,
)
from surfd_tpu.data.preprocess import PreprocessConfig
from surfd_tpu.geometry import Mesh, marching_tetrahedra
from surfd_tpu.utils import Logger, SurfDConfig, apply_overrides, fixseed, load_config, save_config


def _sphere_mesh(r=32):
    xs = np.linspace(-1, 1, r)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), axis=-1)
    return marching_tetrahedra(np.linalg.norm(g, axis=-1) - 0.6, iso=0.0)


def test_sample_points_on_mesh_uniform_on_sphere():
    mesh = _sphere_mesh()
    pts = sample_points_on_mesh(mesh, 5000, np.random.default_rng(0))
    r = np.linalg.norm(pts, axis=1)
    assert np.abs(r - 0.6).max() < 0.02  # points on the sphere surface
    assert np.abs(pts.mean(axis=0)).max() < 0.05  # roughly uniform


def test_compute_udf_from_mesh_matches_analytic():
    mesh = _sphere_mesh(48)
    rng = np.random.default_rng(1)
    q = rng.uniform(-1, 1, (2000, 3)).astype(np.float32)
    udf, grad = compute_udf_from_mesh(mesh, q, max_dist=0.1)
    expected = np.minimum(np.abs(np.linalg.norm(q, axis=1) - 0.6), 0.1)
    np.testing.assert_allclose(udf, expected, atol=0.01)
    # gradients are unit and point away from the surface
    np.testing.assert_allclose(np.linalg.norm(grad, axis=1), 1.0, atol=1e-4)
    far = udf > 0.02
    radial = q / np.linalg.norm(q, axis=1, keepdims=True)
    sign = np.sign(np.linalg.norm(q, axis=1) - 0.6)
    cos = (grad * radial).sum(1) * sign
    assert cos[far].mean() > 0.95


def test_prepare_udf_sample_and_datasets(tmp_path):
    mesh = _sphere_mesh()
    cfg = PreprocessConfig(
        num_points_pcd=1000, counts=(500, 400, 50), num_uniform=50
    )
    payload = prepare_udf_sample(mesh, cfg)
    assert payload["coords"].shape == (1000, 3)
    assert payload["labels"].max() <= 0.1 + 1e-6
    d = tmp_path / "train"
    d.mkdir()
    for name in ("a", "b", "c"):
        np.savez(d / f"{name}.npz", **payload)

    ds = UdfDataset(str(tmp_path), "train")
    assert len(ds) == 3
    item = ds[0]
    assert item["pcd"].shape == (1000, 3)

    it = ae_batch_iterator(
        ds, lambda: [0, 1, 2], batch_size=2, num_points_pcd=128,
        num_points_forward=256, rng=np.random.default_rng(0),
    )
    batch = next(it)
    assert batch["pcd"].shape == (2, 128, 3)
    assert batch["coords"].shape == (2, 256, 3)
    assert batch["udf"].shape == (2, 256)
    assert batch["gradients"].shape == (2, 256, 3)

    # diffusion dataset with category conditioning
    dd = DiffusionDataset(
        str(tmp_path), "train", cond_mode="category", category_map={"a": 2, "b": 1}
    )
    di = diffusion_batch_iterator(dd, batch_size=2, num_points_pcd=64,
                                  rng=np.random.default_rng(0), shuffle=False)
    b = next(di)
    assert b["pcd"].shape == (2, 64, 3)
    assert b["action"].shape == (2,)


def test_precompute_latents_and_latent_iterator(tmp_path):
    """Precomputed frozen-encoder latents: chunked encode, npz memoization,
    and the latent batch iterator (reference re-encodes every step,
    training_loop_single.py:192-194 — this is the opt-in faster path)."""
    from surfd_tpu.data import latent_diffusion_batch_iterator, precompute_latents
    from surfd_tpu.models import Dgcnn

    mesh = _sphere_mesh()
    cfg = PreprocessConfig(num_points_pcd=500, counts=(200, 100, 50), num_uniform=50)
    payload = prepare_udf_sample(mesh, cfg)
    d = tmp_path / "train"
    d.mkdir()
    cat_map = {"a": 0, "b": 1, "c": 2}
    for name in cat_map:
        np.savez(d / f"{name}.npz", **payload)
    ds = DiffusionDataset(str(tmp_path), "train", cond_mode="category",
                          category_map=cat_map)

    enc = Dgcnn(size_latent=8, k=4)
    ev = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 3)))
    calls = []

    def encode(p):
        calls.append(p.shape)
        return np.asarray(enc.apply(ev, jnp.asarray(p)))

    cache = str(tmp_path / "lat.npz")
    lat = precompute_latents(ds, encode, 64, np.random.default_rng(0),
                             encode_batch=2, cache_path=cache)
    assert sorted(lat) == ["a", "b", "c"]
    assert all(v.shape == (8,) and v.dtype == np.float32 for v in lat.values())
    # 3 items in chunks of 2: two fixed-shape calls, tail padded
    assert calls == [(2, 64, 3), (2, 64, 3)]

    # memoized: a second call encodes nothing and returns identical values
    calls.clear()
    lat2 = precompute_latents(ds, encode, 64, np.random.default_rng(9),
                              encode_batch=2, cache_path=cache)
    assert calls == []
    np.testing.assert_array_equal(lat2["b"], lat["b"])

    # cache keyed by num_points_pcd: a different count re-encodes
    precompute_latents(ds, encode, 32, np.random.default_rng(0),
                       encode_batch=3, cache_path=cache)
    assert calls == [(3, 32, 3)]

    it = latent_diffusion_batch_iterator(ds, lat, 2, np.random.default_rng(1))
    b = next(it)
    assert b["latents"].shape == (2, 8)
    assert b["action"].shape == (2,)
    id_of = {v: k for k, v in cat_map.items()}
    for row, act in zip(b["latents"], b["action"]):
        np.testing.assert_array_equal(row, lat[id_of[int(act)]])


def test_ae_iterator_rotation_augmentation(tmp_path):
    from surfd_tpu.data.datasets import random_rotation_matrix

    # uniform SO(3): orthonormal, det +1
    for s in range(4):
        r = random_rotation_matrix(np.random.default_rng(s))
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
        assert np.linalg.det(r) == pytest.approx(1.0, abs=1e-6)

    mesh = _sphere_mesh()
    cfg = PreprocessConfig(num_points_pcd=1000, counts=(500, 400, 50), num_uniform=50)
    payload = prepare_udf_sample(mesh, cfg)
    d = tmp_path / "train"
    d.mkdir()
    np.savez(d / "a.npz", **payload)
    ds = UdfDataset(str(tmp_path), "train")

    kw = dict(batch_size=1, num_points_pcd=128, num_points_forward=256)
    plain = next(ae_batch_iterator(ds, lambda: [0], rng=np.random.default_rng(3), **kw))
    aug = next(ae_batch_iterator(ds, lambda: [0], rng=np.random.default_rng(3),
                                 augment_rotations=True, **kw))
    # same subsample indices (rotation drawn after sampling), so labels match
    # exactly: UDF is rotation-invariant
    np.testing.assert_allclose(aug["udf"], plain["udf"])
    # a single rigid rotation links the two batches: recover it from the pcds
    # and check it maps coords and gradients too
    r, *_ = np.linalg.lstsq(plain["pcd"][0], aug["pcd"][0], rcond=None)
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-4)
    np.testing.assert_allclose(plain["coords"][0] @ r, aug["coords"][0], atol=1e-4)
    np.testing.assert_allclose(plain["gradients"][0] @ r, aug["gradients"][0], atol=1e-4)
    # batch is genuinely rotated
    assert np.abs(aug["pcd"] - plain["pcd"]).max() > 0.05


def test_normalize_mesh_modes():
    mesh = Mesh(np.array([[1, 1, 1], [3, 1, 1], [1, 5, 1]], np.float32),
                np.array([[0, 1, 2]]))
    c = normalize_mesh(mesh, "box_center")
    assert np.allclose((c.vertices.max(0) + c.vertices.min(0)) / 2, 0)
    u = normalize_mesh(mesh, "unit")
    assert np.abs(u.vertices).max() == pytest.approx(1.0)


def test_curriculum_state(tmp_path):
    st = CurriculumState(10, [0, 1])
    assert st.complement == list(range(2, 10))
    st.add_easiest([5, 6, 7], [0.3, 0.1, 0.2], k=2)
    assert 6 in st.training_idxes and 7 in st.training_idxes and 5 not in st.training_idxes
    p = str(tmp_path / "idx.txt")
    st.save(p)
    st2 = CurriculumState.load(p, 10)
    assert st2.training_idxes == st.training_idxes

    rng = np.random.default_rng(0)
    train_sampler = SequenceSamplerTrain(st, rng)
    assert sorted(train_sampler) == st.training_idxes
    comp = SequenceSamplerComplement(st)
    assert list(comp) == st.complement
    assert list(batched(iter(range(5)), 2)) == [[0, 1], [2, 3], [4]]
    assert list(batched(iter(range(5)), 2, drop_last=True)) == [[0, 1], [2, 3]]


def test_random_point_sampling_with_fixed_inds():
    pts = np.arange(30, dtype=np.float32).reshape(1, 10, 3)
    rng = np.random.default_rng(0)
    inds = np.array([0, 5])
    out = random_point_sampling(pts, 2, rng, inds=inds)
    np.testing.assert_array_equal(out[0, 0], pts[0, 0])
    np.testing.assert_array_equal(out[0, 1], pts[0, 5])


def test_mask_and_crop():
    mask = np.zeros((10, 12), bool)
    mask[2:5, 3:7] = True
    assert mask2bbox(mask) == (3, 2, 7, 5)
    img = np.full((10, 12, 3), 128, np.uint8)
    crop = crop_square(img, (3, 2, 7, 5))
    assert crop.shape[0] == crop.shape[1]


def test_clip_preprocess_preserves_aspect_ratio():
    """Shorter-side resize + center crop (CLIP _transform): a non-square
    image must NOT be squashed — a centered vertical stripe stays the same
    width fraction of the crop regardless of the input's aspect ratio."""
    from surfd_tpu.data.conditioning import clip_preprocess

    def stripe_width(h, w):
        img = np.zeros((h, w, 3), np.uint8)
        x0 = w // 2 - w // 8
        img[:, x0 : x0 + w // 4] = 255  # centered stripe, 1/4 of the width
        out = clip_preprocess(img, size=224)
        # un-normalize to a binary mask of the stripe
        on = (out[:, :, 0] * 0.26862954 + 0.48145466) > 0.5
        return on[112].sum()

    square = stripe_width(256, 256)
    wide = stripe_width(256, 512)  # stripe is 128 px of 512 → 56 px post-crop
    # aspect-squash would leave the wide stripe at 1/4 of 224 = 56... both
    # are 1/4-width stripes CENTERED, so after shorter-side resize + center
    # crop the wide image's stripe occupies 128·(224/256) = 112 px while a
    # squash to 224 would give 56 px.
    assert abs(square - 56) <= 3
    assert abs(wide - 112) <= 3, f"aspect squash detected: {wide} px"


def test_config_roundtrip_and_overrides(tmp_path):
    cfg = SurfDConfig()
    apply_overrides(cfg, ["model.latent_size=64", "diffusion.noise_schedule=linear",
                          "generate.watertight=true", "model.channel_mult=1,2,4"])
    assert cfg.model.latent_size == 64
    assert cfg.generate.watertight is True
    assert cfg.model.channel_mult == (1, 2, 4)
    p = str(tmp_path / "cfg.json")
    save_config(cfg, p)
    cfg2 = load_config(p)
    assert cfg2.model.latent_size == 64
    assert cfg2.model.channel_mult == (1, 2, 4)
    assert cfg2.diffusion.noise_schedule == "linear"


def test_dataset_presets_match_reference_values():
    # the shipped presets mirror AutoEncoder/cfg/{deepfashion3d,pix3d,shapenet}
    from surfd_tpu.utils.config import available_presets, load_preset

    assert available_presets() == ["deepfashion3d", "pix3d", "text2shape"]
    df = load_preset("deepfashion3d")
    assert (df["latent_size"], df["batch_size"], df["num_epochs"]) == (32, 8, 6000)
    assert df["watertight"] is False and df["resolution"] == 512
    px = load_preset("pix3d")
    assert (px["latent_size"], px["batch_size"], px["num_epochs"]) == (64, 2, 20000)
    t2 = load_preset("text2shape")
    assert (t2["latent_size"], t2["batch_size"], t2["num_epochs"]) == (64, 6, 10000)
    assert t2["watertight"] is True
    import pytest

    with pytest.raises(FileNotFoundError):
        load_preset("nonexistent")


def test_preset_defaults_yield_to_explicit_flags():
    import argparse

    from surfd_tpu.utils.config import apply_preset_defaults

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="")
    ap.add_argument("--latent_size", type=int, default=32)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--watertight", action="store_true")
    argv = ["--config", "text2shape", "--batch_size", "3"]
    apply_preset_defaults(ap, argv)
    args = ap.parse_args(argv)
    assert args.latent_size == 64  # preset value
    assert args.batch_size == 3  # explicit flag wins over preset
    assert args.watertight is True  # preset overrides store_true default


def test_logger_mean_and_sinks(tmp_path, capsys):
    lg = Logger(str(tmp_path), formats=("stdout", "jsonl", "csv"))
    lg.logkv_mean("loss", 1.0)
    lg.logkv_mean("loss", 3.0)
    lg.logkv("lr", 1e-4)
    lg.dumpkvs(step=5)
    out = capsys.readouterr().out
    assert "loss" in out and "2" in out
    rows = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert rows[0]["loss"] == 2.0 and rows[0]["step"] == 5
    assert (tmp_path / "metrics.csv").exists()
    lg.close()


def test_checkpointer_roundtrip(tmp_path):
    from surfd_tpu.training import create_train_state, make_optimizer
    from surfd_tpu.utils.checkpoint import Checkpointer

    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    tx = make_optimizer()
    state = create_train_state(params, tx)
    ck = Checkpointer(str(tmp_path / "ck"))
    ck.save(0, state)
    state2 = state.replace(step=state.step + 10,
                           params={"w": jnp.full((4, 4), 2.0), "b": jnp.ones((4,))})
    ck.save(10, state2)
    ck.wait()
    assert ck.latest_step() == 10
    restored = ck.restore(jax.tree.map(np.zeros_like, state2))
    assert int(restored.step) == 10
    np.testing.assert_allclose(restored.params["w"], 2.0)
    ck.close()


def test_fixseed_deterministic():
    k1 = fixseed(7)
    a = np.random.rand(3)
    k2 = fixseed(7)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))


def test_checkpointer_force_overwrites_existing_step(tmp_path):
    """save(force=True) must re-save an existing step (partial/corrupt-write
    recovery — advisor r2); without force it is a no-op."""
    import numpy as np

    from surfd_tpu.utils.checkpoint import Checkpointer

    ck = Checkpointer(str(tmp_path / "ck"))
    state = {"w": np.arange(4.0, dtype=np.float32)}
    assert ck.save(7, state)
    ck.wait()
    assert ck.save(7, {"w": np.zeros(4, np.float32)}) is False
    new = {"w": np.full(4, 9.0, np.float32)}
    assert ck.save(7, new, force=True)
    ck.wait()
    out = ck.restore(state, step=7)
    np.testing.assert_array_equal(out["w"], new["w"])


def test_prefetch_iterator_order_exceptions_and_finite():
    """prefetch_iterator preserves order, ends with the source, and re-raises
    producer exceptions at the consumer's next()."""
    import numpy as np

    from surfd_tpu.data import prefetch_iterator

    # order + termination
    out = list(prefetch_iterator(iter(range(17)), depth=3))
    assert out == list(range(17))

    # array batches come through unchanged
    batches = [{"x": np.full((4, 3), i, np.float32)} for i in range(5)]
    got = list(prefetch_iterator(iter(batches), depth=2))
    for a, b in zip(batches, got):
        np.testing.assert_array_equal(a["x"], b["x"])

    # exception relays
    def boom():
        yield 1
        raise RuntimeError("producer died")

    it = prefetch_iterator(boom(), depth=2)
    assert next(it) == 1
    import pytest

    with pytest.raises(RuntimeError, match="producer died"):
        next(it)

    with pytest.raises(ValueError):
        prefetch_iterator(iter([]), depth=0)


def test_prefetch_preserves_ae_batch_stream(tmp_path):
    """prefetch_iterator(ae_batch_iterator(...)) yields the exact same batch
    stream as the bare iterator under the same seed — threading must not
    change training data order or content."""
    import numpy as np

    from surfd_tpu.data import ae_batch_iterator, prefetch_iterator
    from surfd_tpu.data.datasets import UdfDataset

    root = tmp_path / "train"
    root.mkdir()
    rng = np.random.default_rng(3)
    for i in range(4):
        np.savez(
            root / f"m{i}.npz",
            pcd=rng.normal(size=(300, 3)).astype(np.float32),
            coords=rng.uniform(-1, 1, (500, 3)).astype(np.float32),
            labels=rng.uniform(0, 0.1, 500).astype(np.float32),
            gradients=rng.normal(size=(500, 3)).astype(np.float32),
        )

    def make(seed):
        ds = UdfDataset(str(tmp_path), "train")
        return ae_batch_iterator(
            ds, lambda: [0, 1, 2, 3], 2, 64, 128,
            np.random.default_rng(seed), augment_rotations=True,
        )

    plain = make(7)
    fetched = prefetch_iterator(make(7), depth=2)
    for _ in range(6):
        a, b = next(plain), next(fetched)
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


def test_csv_sink_preserves_history_across_restart(tmp_path):
    """A resumed run's Logger must append to metrics.csv, not erase the
    curve logged before the restart (StallWatchdog restarts depend on it)."""
    import csv

    from surfd_tpu.utils.logging import Logger

    d = str(tmp_path)
    lg = Logger(d, formats=("csv",))
    lg.log_metrics({"loss": 1.0}, 10)
    lg.log_metrics({"loss": 0.5, "new_key": 2.0}, 20)
    lg.close()

    lg2 = Logger(d, formats=("csv",))
    lg2.log_metrics({"loss": 0.25}, 30)
    lg2.close()

    with open(tmp_path / "metrics.csv", newline="") as f:
        rows = list(csv.DictReader(f))
    assert [r["step"] for r in rows] == ["10", "20", "30"]
    assert rows[0]["new_key"] == ""  # grown column back-filled empty
    assert rows[2]["loss"] == "0.25"


def test_text_batches_carry_encoded_contexts(tmp_path):
    """Text-mode diffusion batches must contain (B, 512) CLIP contexts when
    an encode_text is wired (without one the trainer consumes only 'context'
    and would silently train unconditioned), and distinct captions must map
    to distinct contexts."""
    import jax
    import jax.numpy as jnp

    from surfd_tpu.data import DiffusionDataset
    from surfd_tpu.data.datasets import diffusion_batch_iterator
    from surfd_tpu.models.clip import init_clip, tokenize

    root = tmp_path / "corpus"
    (root / "train").mkdir(parents=True)
    rng = np.random.default_rng(0)
    caps = {
        "sphere_000": "a smooth closed sphere",
        "sheet_001": "an open flat sheet",
    }
    for fid in caps:
        np.savez(
            root / "train" / f"{fid}.npz",
            pcd=rng.normal(size=(256, 3)).astype(np.float32),
            coords=rng.normal(size=(64, 3)).astype(np.float32),
            labels=rng.uniform(0, 0.1, 64).astype(np.float32),
            gradients=rng.normal(size=(64, 3)).astype(np.float32),
        )
    with open(root / "captions.csv", "w") as f:
        f.write("id,caption\n")
        for k, v in caps.items():
            f.write(f"{k},{v}\n")

    ds = DiffusionDataset(str(root), "train", cond_mode="text",
                          captions_csv=str(root / "captions.csv"))
    # tiny random towers but the real 512-d context the MDM consumes
    model, cvars = init_clip(
        vision_layers=1, vision_width=64, text_width=64, text_layers=1,
        embed_dim=512, image_size=32, patch_size=16,
    )

    def encode_text(texts):
        return np.asarray(model.encode_text(cvars, jnp.asarray(tokenize(texts))))

    it = diffusion_batch_iterator(ds, 2, 64, np.random.default_rng(1),
                                  encode_text=encode_text, shuffle=False)
    batch = next(it)
    assert batch["context"].shape == (2, 512)
    assert np.isfinite(batch["context"]).all()
    # different captions -> different contexts
    assert not np.allclose(batch["context"][0], batch["context"][1])
