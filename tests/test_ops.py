"""Folded-decoder evaluation tests: fold correctness + precision tiers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surfd_tpu.models import CbnDecoder, CoordsEncoder, udf_from_logits
from surfd_tpu.ops.decoder_kernel import fold_decoder, folded_udf, make_fused_udf_fn


@pytest.fixture(scope="module")
def decoder_setup():
    decoder = CbnDecoder(latent_dim=16, hidden_dim=128, num_hidden_layers=3)
    ce = CoordsEncoder()
    latent = jax.random.normal(jax.random.PRNGKey(0), (1, 16)) * 0.5
    variables = decoder.init(
        jax.random.PRNGKey(1), ce.encode(jnp.zeros((1, 8, 3))), latent
    )
    # randomize params so the test is non-trivial (zero-init CBN is identity)
    variables = jax.tree.map(
        lambda x: x + 0.05 * jax.random.normal(jax.random.PRNGKey(2), x.shape),
        variables,
    )
    return decoder, ce, variables, latent


def test_folded_matches_flax(decoder_setup):
    decoder, ce, variables, latent = decoder_setup
    pts = jax.random.uniform(jax.random.PRNGKey(3), (256, 3), minval=-1, maxval=1)
    ref = udf_from_logits(decoder.apply(variables, ce.encode(pts[None]), latent)[0])
    folded = fold_decoder(variables, latent[0])
    out = folded_udf(folded, pts, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_folded_bf16_close(decoder_setup):
    decoder, ce, variables, latent = decoder_setup
    pts = jax.random.uniform(jax.random.PRNGKey(4), (256, 3), minval=-1, maxval=1)
    ref = udf_from_logits(decoder.apply(variables, ce.encode(pts[None]), latent)[0])
    folded = fold_decoder(variables, latent[0])
    out = folded_udf(folded, pts, dtype=jnp.bfloat16)
    # bf16 matmuls with f32 accum: UDF error well under a voxel at 512³
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 2e-3


def test_fused_udf_fn_contract(decoder_setup):
    decoder, ce, variables, latent = decoder_setup
    fn = make_fused_udf_fn(variables, latent[0])
    pts = jax.random.uniform(jax.random.PRNGKey(5), (128, 3), minval=-1, maxval=1)
    u = np.asarray(fn(pts))
    assert u.shape == (128,)
    g = np.asarray(fn.grad_fn(pts))
    assert g.shape == (128, 3)
    ok = np.asarray(fn.below_fn(pts, 0.05))
    assert set(np.unique(ok)).issubset({0, 1})
    # gradient vs autodiff through the unfolded flax decoder (finite
    # differences are invalid at posenc frequency 2^9)
    def flax_udf(p):
        from surfd_tpu.models import udf_from_logits

        return udf_from_logits(decoder.apply(variables, ce.encode(p[None]), latent)[0])

    _, vjp = jax.vjp(flax_udf, pts)
    (g_ref,) = vjp(jnp.ones(pts.shape[0]))
    np.testing.assert_allclose(g, np.asarray(g_ref), atol=1e-4)


def test_folded_udf_mixed_accuracy():
    """bf16-MXU/f32-VPU folded evaluation stays within ~1e-3·max_dist of the
    reference decoder (the pure-bf16 variant is looser; both are measured in
    scripts/bench_decoder_eval.py)."""
    from surfd_tpu.models.decoder import CbnDecoder, CoordsEncoder, udf_from_logits
    from surfd_tpu.ops.decoder_kernel import fold_decoder, folded_udf_mixed

    dec = CbnDecoder(latent_dim=8, hidden_dim=64, num_hidden_layers=2)
    rng = np.random.default_rng(1)
    lat = jnp.asarray(rng.normal(size=(8,)), jnp.float32)
    dv = dec.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 63)), jnp.zeros((1, 8)))
    dv = jax.tree.map(
        lambda a: jnp.asarray(rng.normal(size=a.shape, scale=0.05), a.dtype) + a, dv
    )
    pts = jnp.asarray(rng.uniform(-1, 1, (4096, 3)), jnp.float32)
    out = folded_udf_mixed(fold_decoder(dv, lat, 0.1), pts)
    enc = CoordsEncoder()
    ref = udf_from_logits(dec.apply(dv, enc.encode(pts[None]), lat[None])[0], 0.1)
    assert float(jnp.abs(out - ref).max()) < 1e-3
