"""Pure-functional Gaussian diffusion: q/p math, losses, and scan-based samplers.

TPU-first re-design of the reference `GaussianDiffusion`
(/root/reference/diffusion/gaussian_diffusion.py:106-1342). Differences by
design, not omission:

  * No classes/state — every function takes a `Schedule` pytree and a
    `model_fn(x, t) -> output` closure; conditioning lives in the closure.
  * The reference's Python sampling loops (p_sample_loop_progressive at
    gaussian_diffusion.py:635-708, ddim at :858, plms at :1058) become a single
    jitted `lax.scan` over timesteps — one compiled program per sampler, no
    host round-trips between denoise steps.
  * PLMS keeps its Adams-Bashforth history (order ≤ 4) in the scan carry as a
    fixed-size ring buffer instead of a Python list.
  * Respacing is handled by `Schedule.timestep_map` (see schedule.py), so
    there is no wrapped-model object.

Supported (parity with the reference): mean types prev_x/start_x/epsilon;
variance types fixed_small/fixed_large/learned/learned_range; losses
mse/rescaled_mse (with the reference's L1×weight variant used by Surf-D,
gaussian_diffusion.py:1317), kl/rescaled_kl; cond_fn mean- and score-based
guidance (:393-469); inpainting mask hook (:288-293); skip_timesteps/
init_image warm starts; const_noise.
"""

from __future__ import annotations

import enum
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .schedule import Schedule

ModelFn = Callable[..., jnp.ndarray]


class MeanType(str, enum.Enum):
    PREVIOUS_X = "prev_x"
    START_X = "start_x"
    EPSILON = "epsilon"


class VarType(str, enum.Enum):
    LEARNED = "learned"
    FIXED_SMALL = "fixed_small"
    FIXED_LARGE = "fixed_large"
    LEARNED_RANGE = "learned_range"


class LossType(str, enum.Enum):
    MSE = "mse"
    RESCALED_MSE = "rescaled_mse"
    KL = "kl"
    RESCALED_KL = "rescaled_kl"


def _extract(arr: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep coefficients and broadcast to an ndim tensor.

    Mirrors `_extract_into_tensor` (gaussian_diffusion.py:1329-1342).
    """
    # Schedule arrays are host numpy (embedded as HLO literals at trace time:
    # pre-created DEVICE constants throttle every later h2d on the axon
    # tunnel); jnp.asarray makes the traced gather explicit.
    out = jnp.asarray(arr)[t].astype(jnp.float32)
    return out.reshape(out.shape + (1,) * (ndim - 1))


# ---------------------------------------------------------------------------
# q(x_t | ...) forward process
# ---------------------------------------------------------------------------

def q_mean_variance(sched: Schedule, x_start, t):
    """q(x_t | x_0) mean/variance (gaussian_diffusion.py:195-210)."""
    nd = x_start.ndim
    mean = _extract(sched.sqrt_alphas_cumprod, t, nd) * x_start
    variance = _extract(1.0 - sched.alphas_cumprod, t, nd)
    log_variance = _extract(sched.log_one_minus_alphas_cumprod, t, nd)
    return mean, variance, log_variance


def q_sample(sched: Schedule, x_start, t, noise):
    """Sample x_t ~ q(x_t | x_0) (gaussian_diffusion.py:212-232)."""
    nd = x_start.ndim
    return (
        _extract(sched.sqrt_alphas_cumprod, t, nd) * x_start
        + _extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * noise
    )


def q_posterior_mean_variance(sched: Schedule, x_start, x_t, t):
    """q(x_{t-1} | x_t, x_0) (gaussian_diffusion.py:234-256)."""
    nd = x_t.ndim
    mean = (
        _extract(sched.posterior_mean_coef1, t, nd) * x_start
        + _extract(sched.posterior_mean_coef2, t, nd) * x_t
    )
    variance = _extract(sched.posterior_variance, t, nd)
    log_variance = _extract(sched.posterior_log_variance_clipped, t, nd)
    return mean, variance, log_variance


# ---------------------------------------------------------------------------
# Model-output interpretation
# ---------------------------------------------------------------------------

def predict_xstart_from_eps(sched: Schedule, x_t, t, eps):
    nd = x_t.ndim
    return (
        _extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t
        - _extract(sched.sqrt_recipm1_alphas_cumprod, t, nd) * eps
    )


def predict_xstart_from_xprev(sched: Schedule, x_t, t, xprev):
    nd = x_t.ndim
    return (
        _extract(1.0 / sched.posterior_mean_coef1, t, nd) * xprev
        - _extract(sched.posterior_mean_coef2 / sched.posterior_mean_coef1, t, nd) * x_t
    )


def predict_eps_from_xstart(sched: Schedule, x_t, t, pred_xstart):
    nd = x_t.ndim
    return (
        _extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t - pred_xstart
    ) / _extract(sched.sqrt_recipm1_alphas_cumprod, t, nd)


class PMeanVar(NamedTuple):
    mean: jnp.ndarray
    variance: jnp.ndarray
    log_variance: jnp.ndarray
    pred_xstart: jnp.ndarray


def p_mean_variance(
    sched: Schedule,
    model_fn: ModelFn,
    x: jnp.ndarray,
    t: jnp.ndarray,
    *,
    mean_type: MeanType = MeanType.START_X,
    var_type: VarType = VarType.FIXED_SMALL,
    clip_denoised: bool = True,
    denoised_fn: Optional[Callable] = None,
    inpainting: Optional[tuple] = None,
) -> PMeanVar:
    """p(x_{t-1} | x_t) parameters + x_0 prediction.

    Mirrors gaussian_diffusion.py:258-363. `t` indexes the (possibly respaced)
    schedule; the denoiser sees `sched.model_timesteps(t)`. `inpainting` is an
    optional (mask, motion) pair (reference :288-293).
    """
    nd = x.ndim
    model_output = model_fn(x, sched.model_timesteps(t))

    if inpainting is not None:
        mask, motion = inpainting
        model_output = jnp.where(mask, motion, model_output)

    if var_type in (VarType.LEARNED, VarType.LEARNED_RANGE):
        # Channel-last layout (B, ..., C) — the TPU-native convention here,
        # vs the reference's channel-first split (gaussian_diffusion.py:298).
        C = x.shape[-1]
        model_output, model_var_values = jnp.split(model_output, [C], axis=-1)
        if var_type == VarType.LEARNED:
            model_log_variance = model_var_values
            model_variance = jnp.exp(model_log_variance)
        else:
            min_log = _extract(sched.posterior_log_variance_clipped, t, nd)
            max_log = _extract(jnp.log(sched.betas), t, nd)
            frac = (model_var_values + 1) / 2
            model_log_variance = frac * max_log + (1 - frac) * min_log
            model_variance = jnp.exp(model_log_variance)
    elif var_type == VarType.FIXED_LARGE:
        model_variance = _extract(sched.fixed_large_variance, t, nd)
        model_log_variance = _extract(sched.fixed_large_log_variance, t, nd)
    else:  # FIXED_SMALL
        model_variance = _extract(sched.posterior_variance, t, nd)
        model_log_variance = _extract(sched.posterior_log_variance_clipped, t, nd)

    def process_xstart(xs):
        if denoised_fn is not None:
            xs = denoised_fn(xs)
        if clip_denoised:
            xs = jnp.clip(xs, -1.0, 1.0)
        return xs

    if mean_type == MeanType.PREVIOUS_X:
        pred_xstart = process_xstart(predict_xstart_from_xprev(sched, x, t, model_output))
        model_mean = model_output
    else:
        if mean_type == MeanType.START_X:
            pred_xstart = process_xstart(model_output)
        else:
            pred_xstart = process_xstart(predict_xstart_from_eps(sched, x, t, model_output))
        model_mean, _, _ = q_posterior_mean_variance(sched, pred_xstart, x, t)

    return PMeanVar(model_mean, model_variance, model_log_variance, pred_xstart)


# ---------------------------------------------------------------------------
# Guidance hooks (cond_fn)
# ---------------------------------------------------------------------------

def condition_mean(sched: Schedule, cond_fn, out: PMeanVar, x, t) -> PMeanVar:
    """Sohl-Dickstein-style mean shift (gaussian_diffusion.py:393-406)."""
    gradient = cond_fn(x, sched.model_timesteps(t))
    return out._replace(mean=out.mean + out.variance * gradient)


def condition_score(sched: Schedule, cond_fn, out: PMeanVar, x, t) -> PMeanVar:
    """Song-style score conditioning (gaussian_diffusion.py:423-445)."""
    nd = x.ndim
    alpha_bar = _extract(sched.alphas_cumprod, t, nd)
    eps = predict_eps_from_xstart(sched, x, t, out.pred_xstart)
    eps = eps - jnp.sqrt(1 - alpha_bar) * cond_fn(x, sched.model_timesteps(t))
    pred_xstart = predict_xstart_from_eps(sched, x, t, eps)
    mean, _, _ = q_posterior_mean_variance(sched, pred_xstart, x, t)
    return out._replace(mean=mean, pred_xstart=pred_xstart)


# ---------------------------------------------------------------------------
# Samplers — single steps
# ---------------------------------------------------------------------------

def _nonzero_mask(t, ndim):
    return (t != 0).astype(jnp.float32).reshape((-1,) + (1,) * (ndim - 1))


def p_sample(
    sched: Schedule,
    model_fn: ModelFn,
    x,
    t,
    rng,
    *,
    cond_fn=None,
    const_noise: bool = False,
    **pmv_kwargs,
):
    """One DDPM ancestral step (gaussian_diffusion.py:471-520)."""
    out = p_mean_variance(sched, model_fn, x, t, **pmv_kwargs)
    noise = jax.random.normal(rng, x.shape, x.dtype)
    if const_noise:
        noise = jnp.broadcast_to(noise[:1], noise.shape)
    if cond_fn is not None:
        out = condition_mean(sched, cond_fn, out, x, t)
    sample = out.mean + _nonzero_mask(t, x.ndim) * jnp.exp(0.5 * out.log_variance) * noise
    return sample, out.pred_xstart


def ddim_sample(
    sched: Schedule,
    model_fn: ModelFn,
    x,
    t,
    rng,
    *,
    eta: float = 0.0,
    cond_fn=None,
    **pmv_kwargs,
):
    """One DDIM step (gaussian_diffusion.py:711-770)."""
    nd = x.ndim
    out = p_mean_variance(sched, model_fn, x, t, **pmv_kwargs)
    if cond_fn is not None:
        out = condition_score(sched, cond_fn, out, x, t)
    eps = predict_eps_from_xstart(sched, x, t, out.pred_xstart)
    alpha_bar = _extract(sched.alphas_cumprod, t, nd)
    alpha_bar_prev = _extract(sched.alphas_cumprod_prev, t, nd)
    sigma = (
        eta
        * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
        * jnp.sqrt(1 - alpha_bar / alpha_bar_prev)
    )
    noise = jax.random.normal(rng, x.shape, x.dtype)
    mean_pred = (
        out.pred_xstart * jnp.sqrt(alpha_bar_prev)
        + jnp.sqrt(1 - alpha_bar_prev - sigma**2) * eps
    )
    sample = mean_pred + _nonzero_mask(t, nd) * sigma * noise
    return sample, out.pred_xstart


def ddim_reverse_sample(sched: Schedule, model_fn: ModelFn, x, t, **pmv_kwargs):
    """Deterministic ODE step t -> t+1 (gaussian_diffusion.py:789-829)."""
    nd = x.ndim
    out = p_mean_variance(sched, model_fn, x, t, **pmv_kwargs)
    eps = (
        _extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x - out.pred_xstart
    ) / _extract(sched.sqrt_recipm1_alphas_cumprod, t, nd)
    alpha_bar_next = _extract(sched.alphas_cumprod_next, t, nd)
    mean_pred = out.pred_xstart * jnp.sqrt(alpha_bar_next) + jnp.sqrt(1 - alpha_bar_next) * eps
    return mean_pred, out.pred_xstart


# ---------------------------------------------------------------------------
# Samplers — jitted scan loops
# ---------------------------------------------------------------------------

def _init_noise(rng, shape, noise, dtype=jnp.float32):
    if noise is not None:
        return noise
    return jax.random.normal(rng, shape, dtype)


def _loop_indices(sched: Schedule, skip_timesteps: int):
    return jnp.arange(sched.num_timesteps - skip_timesteps - 1, -1, -1)


def _warm_start(sched, img, init_image, skip_timesteps):
    """skip_timesteps/init_image warm start (gaussian_diffusion.py:664-676)."""
    if skip_timesteps and init_image is None:
        init_image = jnp.zeros_like(img)
    if init_image is not None:
        t0 = jnp.full((img.shape[0],), sched.num_timesteps - skip_timesteps - 1, jnp.int32)
        img = q_sample(sched, init_image, t0, img)
    return img


def p_sample_loop(
    sched: Schedule,
    model_fn: ModelFn,
    shape,
    rng,
    *,
    noise=None,
    skip_timesteps: int = 0,
    init_image=None,
    cond_fn=None,
    const_noise: bool = False,
    **pmv_kwargs,
):
    """Full DDPM ancestral sampling as one `lax.scan`.

    Replaces the reference Python loop (gaussian_diffusion.py:570-708).
    """
    rng, nrng = jax.random.split(rng)
    img = _warm_start(sched, _init_noise(nrng, shape, noise), init_image, skip_timesteps)

    def step(carry, t):
        x, r = carry
        r, sub = jax.random.split(r)
        tb = jnp.full((shape[0],), t, jnp.int32)
        x, _ = p_sample(
            sched, model_fn, x, tb, sub,
            cond_fn=cond_fn, const_noise=const_noise, **pmv_kwargs,
        )
        return (x, r), None

    (img, _), _ = jax.lax.scan(step, (img, rng), _loop_indices(sched, skip_timesteps))
    return img


def ddim_sample_loop(
    sched: Schedule,
    model_fn: ModelFn,
    shape,
    rng,
    *,
    eta: float = 0.0,
    noise=None,
    skip_timesteps: int = 0,
    init_image=None,
    cond_fn=None,
    **pmv_kwargs,
):
    """Full DDIM sampling as one `lax.scan` (gaussian_diffusion.py:858-972)."""
    rng, nrng = jax.random.split(rng)
    img = _warm_start(sched, _init_noise(nrng, shape, noise), init_image, skip_timesteps)

    def step(carry, t):
        x, r = carry
        r, sub = jax.random.split(r)
        tb = jnp.full((shape[0],), t, jnp.int32)
        x, _ = ddim_sample(sched, model_fn, x, tb, sub, eta=eta, cond_fn=cond_fn, **pmv_kwargs)
        return (x, r), None

    (img, _), _ = jax.lax.scan(step, (img, rng), _loop_indices(sched, skip_timesteps))
    return img


# Adams-Bashforth coefficients for PLMS orders 1-4, padded to 4 taps; row k is
# order k+1, columns weight eps[-1], eps[-2], eps[-3], eps[-4]
# (gaussian_diffusion.py:1036-1046).
_AB_COEFFS = np.array(
    [
        [1.0, 0.0, 0.0, 0.0],
        [3.0 / 2.0, -1.0 / 2.0, 0.0, 0.0],
        [23.0 / 12.0, -16.0 / 12.0, 5.0 / 12.0, 0.0],
        [55.0 / 24.0, -59.0 / 24.0, 37.0 / 24.0, -9.0 / 24.0],
    ]
)


def plms_sample_loop(
    sched: Schedule,
    model_fn: ModelFn,
    shape,
    rng,
    *,
    order: int = 2,
    noise=None,
    skip_timesteps: int = 0,
    init_image=None,
    cond_fn=None,
    **pmv_kwargs,
):
    """PLMS (pseudo linear multistep) sampling as one `lax.scan`.

    Mirrors gaussian_diffusion.py:974-1169: first step uses the pseudo
    improved-Euler corrector (two model evals), later steps Adams-Bashforth of
    `min(order, history)`; eps history is a fixed ring buffer in the carry.
    """
    if not 1 <= order <= 4:
        raise ValueError("order must be 1..4")
    rng, nrng = jax.random.split(rng)
    img = _warm_start(sched, _init_noise(nrng, shape, noise), init_image, skip_timesteps)

    def eps_and_x0(x, tb):
        out = p_mean_variance(sched, model_fn, x, tb, **pmv_kwargs)
        if cond_fn is not None:
            out = condition_score(sched, cond_fn, out, x, tb)
        eps = predict_eps_from_xstart(sched, x, tb, out.pred_xstart)
        return eps, out.pred_xstart

    nd = img.ndim

    def step(carry, t):
        x, hist, n_hist = carry
        tb = jnp.full((shape[0],), t, jnp.int32)
        alpha_bar_prev = _extract(sched.alphas_cumprod_prev, tb, nd)
        eps, x0 = eps_and_x0(x, tb)

        def first_step(_):
            # Pseudo improved Euler (reference :1024-1031).
            mean_pred = x0 * jnp.sqrt(alpha_bar_prev) + jnp.sqrt(1 - alpha_bar_prev) * eps
            eps2, _ = eps_and_x0(mean_pred, jnp.maximum(tb - 1, 0))
            return (eps + eps2) / 2.0

        def multi_step(_):
            # Ring buffer holds the previous eps values, newest at slot 0.
            new_hist = jnp.concatenate([eps[None], hist[:-1]], axis=0)
            cur_order = jnp.minimum(order, n_hist + 1)
            coeffs = jnp.asarray(_AB_COEFFS)[cur_order - 1]
            return jnp.tensordot(coeffs, new_hist, axes=1)

        use_euler = jnp.logical_and(order > 1, n_hist == 0)
        eps_prime = jax.lax.cond(use_euler, first_step, multi_step, None)
        pred_prime = predict_xstart_from_eps(sched, x, tb, eps_prime)
        mean_pred = pred_prime * jnp.sqrt(alpha_bar_prev) + jnp.sqrt(1 - alpha_bar_prev) * eps_prime

        mask = _nonzero_mask(tb, nd)
        sample = mean_pred * mask + x0 * (1 - mask)
        hist = jnp.concatenate([eps[None], hist[:-1]], axis=0)
        return (sample, hist, jnp.minimum(n_hist + 1, 4)), None

    hist0 = jnp.zeros((4,) + tuple(shape), img.dtype)
    (img, _, _), _ = jax.lax.scan(
        step, (img, hist0, jnp.int32(0)), _loop_indices(sched, skip_timesteps)
    )
    return img


# ---------------------------------------------------------------------------
# Likelihoods and losses
# ---------------------------------------------------------------------------

def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL between two diagonal gaussians (reference diffusion/losses.py:12-39)."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    """(reference diffusion/losses.py:42-47)"""
    return 0.5 * (1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi) * (x + 0.044715 * x**3)))


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of discretized-to-256-bins data (losses.py:50-77)."""
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, a_min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, a_min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min, jnp.log(jnp.clip(cdf_delta, a_min=1e-12))),
    )


def mean_flat(x):
    return x.reshape(x.shape[0], -1).mean(axis=1)


def vb_terms_bpd(
    sched: Schedule,
    model_fn: ModelFn,
    x_start,
    x_t,
    t,
    *,
    mean_type=MeanType.START_X,
    var_type=VarType.FIXED_SMALL,
    clip_denoised: bool = True,
):
    """Per-timestep variational bound term in bits (gaussian_diffusion.py:1171-1204)."""
    true_mean, _, true_logvar = q_posterior_mean_variance(sched, x_start, x_t, t)
    out = p_mean_variance(
        sched, model_fn, x_t, t,
        mean_type=mean_type, var_type=var_type, clip_denoised=clip_denoised,
    )
    kl = mean_flat(normal_kl(true_mean, true_logvar, out.mean, out.log_variance)) / jnp.log(2.0)
    decoder_nll = -discretized_gaussian_log_likelihood(
        x_start, means=out.mean, log_scales=0.5 * out.log_variance
    )
    decoder_nll = mean_flat(decoder_nll) / jnp.log(2.0)
    return jnp.where(t == 0, decoder_nll, kl), out.pred_xstart


def training_losses(
    sched: Schedule,
    model_fn: ModelFn,
    x_start,
    t,
    rng,
    *,
    noise=None,
    mean_type: MeanType = MeanType.START_X,
    var_type: VarType = VarType.FIXED_SMALL,
    loss_type: LossType = LossType.MSE,
    l1_weight: float = 1000.0,
) -> dict:
    """Per-example training losses (gaussian_diffusion.py:1206-1326).

    Surf-D config: mean_type=START_X + L1; the loss is
    `l1_weight * |model_output − x_start|` averaged per example (reference
    :1317 computes a scalar; we return per-example for schedule samplers).
    """
    if noise is None:
        noise = jax.random.normal(rng, x_start.shape, x_start.dtype)
    x_t = q_sample(sched, x_start, t, noise)
    terms: dict[str, Any] = {}

    if loss_type in (LossType.KL, LossType.RESCALED_KL):
        loss, _ = vb_terms_bpd(
            sched, model_fn, x_start, x_t, t,
            mean_type=mean_type, var_type=var_type, clip_denoised=False,
        )
        if loss_type == LossType.RESCALED_KL:
            loss = loss * sched.num_timesteps
        terms["loss"] = loss
        return terms

    model_output = model_fn(x_t, sched.model_timesteps(t))

    if var_type in (VarType.LEARNED, VarType.LEARNED_RANGE):
        C = x_t.shape[-1]
        model_output, model_var_values = jnp.split(model_output, [C], axis=-1)
        frozen = jnp.concatenate(
            [jax.lax.stop_gradient(model_output), model_var_values], axis=-1
        )
        vb, _ = vb_terms_bpd(
            sched, lambda *_a: frozen, x_start, x_t, t,
            mean_type=mean_type, var_type=var_type, clip_denoised=False,
        )
        if loss_type == LossType.RESCALED_MSE:
            vb = vb * (sched.num_timesteps / 1000.0)
        terms["vb"] = vb

    target = {
        MeanType.PREVIOUS_X: q_posterior_mean_variance(sched, x_start, x_t, t)[0],
        MeanType.START_X: x_start,
        MeanType.EPSILON: noise,
    }[mean_type]

    terms["latent_l1"] = l1_weight * mean_flat(jnp.abs(model_output - target))
    terms["mse"] = mean_flat((model_output - target) ** 2)
    terms["loss"] = terms["latent_l1"] + terms.get("vb", 0.0)
    return terms
