"""Model tests: shapes, init parity, kNN vs brute force (SURVEY.md §4f)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surfd_tpu.models import (
    MDM,
    CbnDecoder,
    CoordsEncoder,
    Dgcnn,
    UNet1D,
    knn_indices,
    make_cfg_model_fn,
    timestep_embedding,
)


def test_timestep_embedding_shape_and_values():
    emb = timestep_embedding(jnp.array([0.0, 1.0, 500.0]), 224)
    assert emb.shape == (3, 224)
    # t=0: cos part all 1, sin part all 0
    np.testing.assert_allclose(emb[0, :112], 1.0, atol=1e-6)
    np.testing.assert_allclose(emb[0, 112:], 0.0, atol=1e-6)
    # first frequency is 1.0 → emb[1,0] = cos(1)
    assert float(emb[1, 0]) == pytest.approx(np.cos(1.0), abs=1e-6)


def test_coords_encoder_dims_and_order():
    enc = CoordsEncoder()
    assert enc.out_dim == 63
    x = jnp.array([[0.5, -0.25, 1.0]])
    e = enc.encode(x)
    assert e.shape == (1, 63)
    np.testing.assert_allclose(e[0, :3], x[0])
    np.testing.assert_allclose(e[0, 3:6], np.sin(np.asarray(x[0])), rtol=1e-6)
    np.testing.assert_allclose(e[0, 6:9], np.cos(np.asarray(x[0])), rtol=1e-6)
    # last freq is 2^9
    np.testing.assert_allclose(e[0, -3:], np.cos(np.asarray(x[0]) * 512), rtol=1e-4)


def test_knn_vs_bruteforce():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(2, 64, 3)).astype(np.float32))
    idx = knn_indices(pts, k=5)
    assert idx.shape == (2, 64, 5)
    # brute force reference
    p = np.asarray(pts)
    d = ((p[:, :, None, :] - p[:, None, :, :]) ** 2).sum(-1)
    ref = np.argsort(d, axis=-1, kind="stable")[:, :, :5]
    # Self must be first; neighbor distance sets must match.
    np.testing.assert_array_equal(np.asarray(idx[..., 0]), np.arange(64)[None, :].repeat(2, 0))
    d_ours = np.take_along_axis(d, np.asarray(idx), axis=-1)
    d_ref = np.take_along_axis(d, ref, axis=-1)
    np.testing.assert_allclose(np.sort(d_ours, -1), np.sort(d_ref, -1), atol=1e-5)


def test_knn_blocked_matches_single_topk():
    """The two-phase blocked top-k (the production path at N=10k) must be
    index-identical to the single lax.top_k reduction."""
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.normal(size=(2, 1000, 3)).astype(np.float32))
    blocked = knn_indices(pts, k=20, block=100)  # 1000 % 100 == 0 → blocked
    single = knn_indices(pts, k=20, block=999)  # no divisor → single top_k
    np.testing.assert_array_equal(np.asarray(blocked), np.asarray(single))


def test_knn_chunked_matches_unchunked():
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.normal(size=(1, 256, 3)).astype(np.float32))
    a = knn_indices(pts, k=8, chunk=64)
    b = knn_indices(pts, k=8, chunk=256)
    d = ((np.asarray(pts)[0, :, None] - np.asarray(pts)[0, None]) ** 2).sum(-1)
    da = np.take_along_axis(d, np.asarray(a[0]), -1)
    db = np.take_along_axis(d, np.asarray(b[0]), -1)
    np.testing.assert_allclose(da, db, atol=1e-5)


def test_dgcnn_shapes_and_init():
    model = Dgcnn(size_latent=32)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 128, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    lat = model.apply(variables, x)
    assert lat.shape == (2, 32)
    assert "batch_stats" in variables
    # train mode mutates batch_stats
    lat2, updates = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert lat2.shape == (2, 32)


def test_cbn_decoder_shapes_and_zero_init_identity():
    enc = CoordsEncoder()
    dec = CbnDecoder(latent_dim=32, hidden_dim=64, num_hidden_layers=2)
    coords = jnp.asarray(np.random.default_rng(3).uniform(-1, 1, (2, 100, 3)), jnp.float32)
    latent = jnp.asarray(np.random.default_rng(4).normal(size=(2, 32)), jnp.float32)
    variables = dec.init(jax.random.PRNGKey(0), enc.encode(coords), latent)
    out = dec.apply(variables, enc.encode(coords), latent)
    assert out.shape == (2, 100)
    # CBN gamma kernels start at zero (init parity with cbndec.py:62-66)
    g = variables["params"]["block_0"]["bn_0"]["gamma"]["kernel"]
    np.testing.assert_allclose(np.asarray(g), 0.0)
    b = variables["params"]["block_0"]["fc_1"]["kernel"]
    np.testing.assert_allclose(np.asarray(b), 0.0)


def test_unet1d_shapes_and_zero_out():
    model = UNet1D(model_channels=32, channel_mult=(1, 2), num_res_blocks=1)
    x = jnp.ones((2, 32, 1))
    t = jnp.array([0, 10])
    variables = model.init(jax.random.PRNGKey(0), x, t)
    out = model.apply(variables, x, t)
    assert out.shape == (2, 32, 1)
    # zero-init output conv → output must be exactly zero at init
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_unet1d_context_and_class_conditioning():
    x = jnp.ones((2, 32, 1))
    t = jnp.array([1, 2])
    ctx_model = UNet1D(model_channels=32, channel_mult=(1, 2), num_res_blocks=1)
    v = ctx_model.init(jax.random.PRNGKey(0), x, t, context=jnp.ones((2, 512)))
    out = ctx_model.apply(v, x, t, context=jnp.ones((2, 512)))
    assert out.shape == (2, 32, 1)

    cls_model = UNet1D(
        model_channels=32, channel_mult=(1, 2), num_res_blocks=1, num_classes=9
    )
    v = cls_model.init(jax.random.PRNGKey(0), x, t, y=jnp.array([0, 5]))
    out = cls_model.apply(v, x, t, y=jnp.array([0, 5]))
    assert out.shape == (2, 32, 1)
    with pytest.raises(AssertionError):
        cls_model.apply(v, x, t)  # class-conditional model requires y


def test_mdm_facade_and_cfg():
    x = jnp.ones((2, 32, 1))
    t = jnp.array([1, 2])
    mdm = MDM(cond_mode="sketch", model_channels=32, channel_mult=(1, 2), num_res_blocks=1)
    ctx = jnp.ones((2, 512))
    v = mdm.init(jax.random.PRNGKey(0), x, t, context=ctx)
    out = mdm.apply(v, x, t, context=ctx)
    assert out.shape == (2, 32, 1)

    fn = make_cfg_model_fn(mdm, v, guidance_scale=2.5, context=ctx)
    out_g = fn(x, t)
    assert out_g.shape == (2, 32, 1)
    # scale=1 returns plain conditional output
    fn1 = make_cfg_model_fn(mdm, v, guidance_scale=1.0, context=ctx)
    np.testing.assert_allclose(np.asarray(fn1(x, t)), np.asarray(out), atol=1e-6)


def test_mdm_category_cfg_null_class():
    """The CFG unconditional branch uses a dedicated null class, not class 0
    (VERDICT r1 weak #4; reference cfg_sampler.py:18-26 semantics)."""
    x = jnp.ones((2, 32, 1))
    t = jnp.array([1, 2])
    mdm = MDM(
        cond_mode="category", num_actions=9,
        model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
    )
    assert mdm.null_action == 9
    action = jnp.array([0, 3])
    v = mdm.init(jax.random.PRNGKey(0), x, t, action=action)
    # the embedding table has a reserved row for the null class
    assert v["params"]["unet"]["label_emb"]["embedding"].shape[0] == 10

    # perturb the zero-init output conv so outputs are not identically zero
    v = jax.tree_util.tree_map(
        lambda p: p + 0.01 * jax.random.normal(jax.random.PRNGKey(7), p.shape), v
    )

    null = jnp.full((2,), mdm.null_action, jnp.int32)
    out_null = mdm.apply(v, x, t, action=null)
    out_cls0 = mdm.apply(v, x, t, action=jnp.zeros((2,), jnp.int32))
    # uncond is NOT aliased onto class 0
    assert not np.allclose(np.asarray(out_null), np.asarray(out_cls0), atol=1e-6)

    # guided output matches the manual CFG formula with the null branch,
    # so it is invariant to which real class the uncond pass would alias
    fn = make_cfg_model_fn(mdm, v, guidance_scale=2.5, action=action)
    out_cond = mdm.apply(v, x, t, action=action)
    expect = out_null + 2.5 * (out_cond - out_null)
    np.testing.assert_allclose(np.asarray(fn(x, t)), np.asarray(expect), atol=1e-5)


def test_mdm_rejects_bad_cond_mode():
    with pytest.raises(ValueError):
        MDM(cond_mode="bogus").init(
            jax.random.PRNGKey(0), jnp.ones((1, 32, 1)), jnp.array([0])
        )


def test_unet1d_spatial_transformer_path():
    model = UNet1D(
        model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
        use_spatial_transformer=True, context_dim=64,
    )
    x = jnp.ones((2, 32, 1))
    t = jnp.array([1, 2])
    ctx = jnp.ones((2, 64))
    v = model.init(jax.random.PRNGKey(0), x, t, context=ctx)
    # perturb params: zero-init projections otherwise hide the context path
    v = jax.tree.map(
        lambda p: p + 0.05 * jax.random.normal(jax.random.PRNGKey(9), p.shape), v
    )
    out = model.apply(v, x, t, context=ctx)
    assert out.shape == (2, 32, 1)
    # context must actually flow through cross-attention
    out2 = model.apply(v, x, t, context=ctx * 3.0)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_grid_autoencoder_roundtrip_shapes():
    from surfd_tpu.models import GridAutoencoder

    ae = GridAutoencoder(base_channels=8, channel_mult=(1, 2), latent_channels=4)
    x = jnp.ones((1, 16, 16, 16, 1))
    v = ae.init(jax.random.PRNGKey(0), x)
    out = ae.apply(v, x)
    assert out.shape == (1, 16, 16, 16, 1)
    z = ae.apply(v, x, method=GridAutoencoder.encode)
    assert z.shape == (1, 8, 8, 8, 4)


def test_label_emb_null_row_zero_init():
    """From-scratch category models start with a ZERO null embedding row so
    the CFG uncond branch matches the reference's zeroed-conditioning
    semantics (cfg_sampler.py:18-23) before any conditioning-dropout
    training (advisor r2; torch_convert zero-pads the row for converted
    checkpoints already)."""
    mdm = MDM(
        cond_mode="category", num_actions=9,
        model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
    )
    x = jnp.ones((2, 32, 1))
    t = jnp.array([1, 2])
    v = mdm.init(jax.random.PRNGKey(0), x, t, action=jnp.array([0, 3]))
    emb = np.asarray(v["params"]["unet"]["label_emb"]["embedding"])
    assert emb.shape[0] == 10
    np.testing.assert_array_equal(emb[mdm.null_action], 0.0)
    # real class rows are NOT zero (torch nn.Embedding N(0,1) init)
    assert np.abs(emb[:9]).max() > 0.1


def test_resblock_dropout_paths():
    """UNet res-block dropout (reference openaimodel.py:228,450): train=True
    is stochastic over the dropout rng; train=False (and dropout=0) is
    deterministic and identical to the no-dropout model on the same params."""
    kw = dict(cond_mode="no_cond", model_channels=32, channel_mult=(1, 2),
              num_res_blocks=1)
    mdm_d = MDM(dropout=0.5, **kw)
    mdm_0 = MDM(dropout=0.0, **kw)
    x = jnp.ones((2, 32, 1))
    t = jnp.array([1, 2])
    v = mdm_d.init(jax.random.PRNGKey(0), x, t)  # train=False: no rng needed
    # perturb the zero-init out convs so outputs are nonzero
    v = jax.tree.map(
        lambda p: p + 0.05 * jax.random.normal(jax.random.PRNGKey(7), p.shape), v
    )
    out_det = mdm_d.apply(v, x, t)
    out_0 = mdm_0.apply(v, x, t)
    np.testing.assert_allclose(np.asarray(out_det), np.asarray(out_0), atol=1e-6)

    o1 = mdm_d.apply(v, x, t, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    o2 = mdm_d.apply(v, x, t, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)
    # same rng → reproducible
    o1b = mdm_d.apply(v, x, t, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o1b), atol=1e-6)


def test_knn_auto_chunk_accounts_for_batch():
    """VERDICT r2 #10: the kNN tiling policy caps B·N²·4 bytes, not N alone."""
    from surfd_tpu.models.dgcnn import auto_chunk, knn_indices

    # production AE config stays on the fast single-tile path
    assert auto_chunk(8, 10_000) == 10_000
    # one notch up (batch 16 × 10k = 6.4 GB) tiles instead of OOMing
    c = auto_chunk(16, 10_000)
    assert c < 10_000
    assert 16 * c * 10_000 * 4 <= 4 * 1024**3
    # huge single-item clouds tile too
    assert auto_chunk(1, 40_000) < 40_000
    # and the tiled path stays exact
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(2, 256, 3)), jnp.float32)
    i_full = knn_indices(pts, 8, chunk=256)
    i_tiled = knn_indices(pts, 8, chunk=64)
    np.testing.assert_array_equal(np.asarray(i_full), np.asarray(i_tiled))
