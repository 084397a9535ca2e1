"""EncoderUNet1D (classifier half-UNet) + classifier guidance.

Covers /root/reference/models/openaimodel.py:752-968 (EncoderUNetModel) and
the guided-diffusion classifier-guidance recipe driven through our
`cond_fn` hooks (diffusion/gaussian.py:207-262). Numerical parity vs the
real torch module lives in test_reference_parity.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surfd_tpu.diffusion import named_schedule, p_sample_loop
from surfd_tpu.models import EncoderUNet1D, make_classifier_cond_fn

CFG = dict(
    model_channels=32,
    out_channels=5,
    num_res_blocks=1,
    attention_resolutions=(1, 2),
    channel_mult=(1, 2),
    num_heads=4,
    num_head_channels=8,
    seq_len=16,
)


@pytest.mark.parametrize("pool", ["adaptive", "attention", "spatial", "spatial_v2"])
def test_pool_heads_shapes_and_grads(pool):
    model = EncoderUNet1D(pool=pool, **CFG)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 16, 1)), jnp.float32)
    t = jnp.asarray([0, 250, 999], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    logits = model.apply({"params": params}, x, t)
    assert logits.shape == (3, 5)
    assert np.all(np.isfinite(np.asarray(logits)))

    # the head must backprop into the trunk (the whole point of a classifier
    # used for guidance is ∇_x, but ∇_θ training comes first)
    def loss(p):
        return jnp.sum(model.apply({"params": p}, x, t) ** 2)

    g = jax.grad(loss)(params)
    gnorm = sum(float(jnp.sum(jnp.abs(v))) for v in jax.tree.leaves(g))
    assert np.isfinite(gnorm)
    if pool != "adaptive":  # adaptive's zeroed out-conv blocks ∇ at init
        assert gnorm > 0


def test_adaptive_head_starts_at_zero_logits():
    """zero_module'd head (openaimodel.py:899-903): fresh classifier predicts
    uniform — exactly like the reference's."""
    model = EncoderUNet1D(pool="adaptive", **CFG)
    x = jnp.ones((2, 16, 1))
    t = jnp.zeros((2,), jnp.int32)
    params = model.init(jax.random.PRNGKey(1), x, t)["params"]
    logits = model.apply({"params": params}, x, t)
    np.testing.assert_array_equal(np.asarray(logits), 0.0)


def test_classifier_guided_sampling_shifts_samples():
    """End-to-end classifier guidance: cond_fn = scale·∇_x log p(y|x_t)
    plugged into p_sample_loop (condition_mean, gaussian.py:210-214).
    With a linear probe classifier p(y=1|x) = σ(w·Σx), guidance toward y=1
    must raise Σx of the samples vs unguided, deterministically (shared rng).
    """
    sched = named_schedule("cosine", 8)
    # pass-through denoiser x0̂ = x: the guidance drift accumulated in x_t
    # survives the final step (with x0̂ = 0, t=0's posterior coef2 = 0 and
    # FIXED_SMALL variance = 0 would erase the whole trajectory)
    model_fn = lambda x, t: x

    w = 3.0

    def classifier_apply(x, t):
        s = jnp.sum(x, axis=(1, 2), keepdims=False)
        return jnp.stack([jnp.zeros_like(s), w * s], axis=-1)  # (B, 2) logits

    y = jnp.ones((4,), jnp.int32)
    cond_fn = make_classifier_cond_fn(classifier_apply, y, scale=2.0)

    rng = jax.random.PRNGKey(7)
    base = p_sample_loop(sched, model_fn, (4, 16, 1), rng)
    guided = p_sample_loop(sched, model_fn, (4, 16, 1), rng, cond_fn=cond_fn)
    assert np.all(np.isfinite(np.asarray(guided)))
    assert float(jnp.mean(jnp.sum(guided, axis=(1, 2)))) > float(
        jnp.mean(jnp.sum(base, axis=(1, 2)))
    )


def test_cond_fn_matches_manual_gradient():
    model = EncoderUNet1D(pool="spatial", **CFG)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 16, 1)), jnp.float32)
    t = jnp.asarray([5, 9], jnp.int32)
    params = model.init(jax.random.PRNGKey(2), x, t)["params"]
    apply = lambda xi, ti: model.apply({"params": params}, xi, ti)
    y = jnp.asarray([1, 3], jnp.int32)
    got = make_classifier_cond_fn(apply, y, scale=0.5)(x, t)

    def manual(xi):
        lp = jax.nn.log_softmax(apply(xi, t), axis=-1)
        return jnp.take_along_axis(lp, y[:, None], axis=-1).sum()

    want = jax.grad(manual)(x) * 0.5
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-7)
