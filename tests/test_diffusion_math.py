"""Golden-value tests of the diffusion process math vs closed forms.

Strategy per SURVEY.md §4(a)-(c): the reference's schedule math is pure numpy
(gaussian_diffusion.py:144-181), so we check our precomputed constants against
independently-derived closed forms, roundtrip q_sample/posterior identities,
and the respacing invariants of space_timesteps (respace.py:7-60).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surfd_tpu.diffusion import (
    MeanType,
    VarType,
    make_schedule,
    named_beta_schedule,
    named_schedule,
    p_mean_variance,
    p_sample_loop,
    ddim_sample_loop,
    plms_sample_loop,
    predict_eps_from_xstart,
    predict_xstart_from_eps,
    q_posterior_mean_variance,
    q_sample,
    space_timesteps,
    spaced_schedule,
    training_losses,
)


def test_linear_betas_closed_form():
    betas = named_beta_schedule("linear", 1000)
    assert betas[0] == pytest.approx(1e-4)
    assert betas[-1] == pytest.approx(0.02)
    assert np.all(np.diff(betas) > 0)


def test_cosine_betas_match_alpha_bar():
    import math

    T = 100
    betas = named_beta_schedule("cosine", T)
    f = lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
    # alphas_cumprod[i] should equal f((i+1)/T)/f(0) wherever beta < 0.999 cap.
    ac = np.cumprod(1 - betas)
    for i in range(T // 2):
        assert ac[i] == pytest.approx(f((i + 1) / T) / f(0), rel=1e-6)


def test_schedule_constants_identities():
    sched = named_schedule("cosine", 50)
    ac = np.asarray(sched.alphas_cumprod, dtype=np.float64)
    np.testing.assert_allclose(sched.sqrt_alphas_cumprod, np.sqrt(ac), rtol=1e-6)
    np.testing.assert_allclose(
        sched.sqrt_one_minus_alphas_cumprod, np.sqrt(1 - ac), rtol=1e-5
    )
    np.testing.assert_allclose(
        sched.sqrt_recip_alphas_cumprod * sched.sqrt_alphas_cumprod,
        np.ones_like(ac),
        rtol=1e-5,
    )
    # posterior mean coefficients sum to the DDPM identity:
    # coef1*x0 + coef2*xt with x0 = xt = 1 gives (sqrt(acp)*b + sqrt(a)(1-acp))/(1-ac)
    betas = np.asarray(sched.betas, dtype=np.float64)
    acp = np.asarray(sched.alphas_cumprod_prev, dtype=np.float64)
    expect = (np.sqrt(acp) * betas + np.sqrt(1 - betas) * (1 - acp)) / (1 - ac)
    got = np.asarray(sched.posterior_mean_coef1) + np.asarray(sched.posterior_mean_coef2)
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_q_sample_statistics():
    sched = named_schedule("cosine", 10)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.ones((4096, 1, 8))
    t = jnp.full((4096,), 5, jnp.int32)
    noise = jax.random.normal(rng, x0.shape)
    xt = q_sample(sched, x0, t, noise)
    mean = float(xt.mean())
    std = float(xt.std())
    assert mean == pytest.approx(float(sched.sqrt_alphas_cumprod[5]), abs=0.02)
    assert std == pytest.approx(float(sched.sqrt_one_minus_alphas_cumprod[5]), abs=0.02)


def test_xstart_eps_roundtrip():
    sched = named_schedule("cosine", 100)
    rng = jax.random.PRNGKey(1)
    x0 = jax.random.normal(rng, (8, 1, 32))
    eps = jax.random.normal(jax.random.PRNGKey(2), x0.shape)
    t = jnp.arange(8, dtype=jnp.int32) * 12
    xt = q_sample(sched, x0, t, eps)
    # predict x0 from eps and back
    x0_hat = predict_xstart_from_eps(sched, xt, t, eps)
    np.testing.assert_allclose(x0_hat, x0, atol=1e-4)
    eps_hat = predict_eps_from_xstart(sched, xt, t, x0)
    np.testing.assert_allclose(eps_hat, eps, atol=2e-3)


def test_posterior_at_t0_is_x0():
    # q(x_{-1}|x_0, x_0) has coef1[0] = ... posterior mean at t=0 collapses to x0
    sched = named_schedule("cosine", 10)
    x0 = jnp.ones((2, 1, 4)) * 0.3
    xt = jnp.ones((2, 1, 4)) * 0.7
    mean, _, _ = q_posterior_mean_variance(sched, x0, xt, jnp.zeros((2,), jnp.int32))
    # At t=0, alphas_cumprod_prev=1 so coef1 = beta0/(1-a0) = 1, coef2 = 0.
    np.testing.assert_allclose(mean, x0, atol=1e-5)


def test_space_timesteps_ddim():
    steps = space_timesteps(1000, "ddim50")
    assert len(steps) == 50
    assert 0 in steps
    steps = space_timesteps(300, [10, 15, 20])
    assert len(steps) == 45


def test_spaced_schedule_preserves_alpha_bar():
    base = named_beta_schedule("cosine", 1000)
    use = space_timesteps(1000, "ddim50")
    sp = spaced_schedule(base, use)
    base_ac = np.cumprod(1 - base)
    kept = sorted(use)
    np.testing.assert_allclose(
        np.asarray(sp.alphas_cumprod), base_ac[kept], rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(sp.timestep_map), np.array(kept))
    assert sp.original_num_steps == 1000


def _zero_model(x, t):
    """A denoiser that always predicts x0 = 0."""
    return jnp.zeros_like(x)


def test_p_mean_variance_start_x():
    sched = named_schedule("cosine", 10)
    x = jnp.ones((2, 1, 4))
    t = jnp.full((2,), 5, jnp.int32)
    out = p_mean_variance(sched, _zero_model, x, t, mean_type=MeanType.START_X)
    # pred_xstart must be exactly the model output (clipped)
    np.testing.assert_allclose(out.pred_xstart, 0.0)
    expect_mean, _, _ = q_posterior_mean_variance(sched, jnp.zeros_like(x), x, t)
    np.testing.assert_allclose(out.mean, expect_mean, rtol=1e-5)


def test_p_sample_loop_contracts_to_zero():
    # With a model that always predicts x0=0, DDPM sampling must converge near 0.
    sched = named_schedule("cosine", 25)
    out = p_sample_loop(sched, _zero_model, (4, 1, 8), jax.random.PRNGKey(0))
    assert float(jnp.abs(out).max()) < 0.15


def test_ddim_loop_deterministic_eta0():
    sched = named_schedule("cosine", 25)
    a = ddim_sample_loop(
        sched, _zero_model, (2, 1, 8), jax.random.PRNGKey(3),
        noise=jnp.ones((2, 1, 8)),
    )
    b = ddim_sample_loop(
        sched, _zero_model, (2, 1, 8), jax.random.PRNGKey(4),
        noise=jnp.ones((2, 1, 8)),
    )
    # eta=0 and fixed init noise → fully deterministic regardless of rng
    np.testing.assert_allclose(a, b, atol=1e-6)
    assert float(jnp.abs(a).max()) < 1e-3


def test_plms_loop_runs_and_contracts():
    sched = named_schedule("cosine", 25)
    out = plms_sample_loop(sched, _zero_model, (2, 1, 8), jax.random.PRNGKey(5), order=2)
    assert out.shape == (2, 1, 8)
    assert float(jnp.abs(out).max()) < 1e-3  # deterministic sampler, x0-target 0


def test_training_losses_l1_zero_when_model_perfect():
    sched = named_schedule("cosine", 100)
    x0 = jax.random.normal(jax.random.PRNGKey(6), (4, 1, 32)) * 0.5
    t = jnp.array([0, 10, 50, 99], jnp.int32)

    def perfect_model(x, tt):
        return jnp.broadcast_to(x0, x.shape)

    terms = training_losses(sched, perfect_model, x0, t, jax.random.PRNGKey(7))
    np.testing.assert_allclose(terms["loss"], 0.0, atol=1e-4)


def test_training_losses_scale():
    # loss should be 1000 * mean|out - x0| for START_X/L1 (reference :1317)
    sched = named_schedule("cosine", 100)
    x0 = jnp.ones((2, 1, 8)) * 0.25
    t = jnp.array([3, 42], jnp.int32)
    model = lambda x, tt: jnp.zeros_like(x)
    terms = training_losses(sched, model, x0, t, jax.random.PRNGKey(8))
    np.testing.assert_allclose(terms["loss"], 1000 * 0.25, rtol=1e-5)


def test_jit_p_sample_loop():
    sched = named_schedule("cosine", 10)
    f = jax.jit(lambda r: p_sample_loop(sched, _zero_model, (2, 1, 8), r))
    out = f(jax.random.PRNGKey(0))
    assert out.shape == (2, 1, 8)


def test_sample_latents_unclipped_by_default():
    """Reference generate scripts all sample with clip_denoised=False
    (generate_uncond.py:77): DGCNN latents are unbounded, so the library
    default of True would truncate x0-hat to [-1,1]. A constant x0=3 model
    must come out near 3, not 1."""
    from surfd_tpu.pipelines import sample_latents

    sched = named_schedule("cosine", 20)
    model = lambda x, tt: jnp.full_like(x, 3.0)
    out = sample_latents(sched, model, 2, 8, jax.random.PRNGKey(1))
    assert out.shape == (2, 8)
    np.testing.assert_allclose(np.asarray(out), 3.0, atol=0.2)
