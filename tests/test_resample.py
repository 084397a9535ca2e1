"""Schedule-sampler tests (reference diffusion/resample.py:8-154)."""

import numpy as np

from surfd_tpu.diffusion import (
    LossSecondMomentResampler,
    UniformSampler,
    create_named_schedule_sampler,
)


def test_uniform_sampler_weights():
    s = UniformSampler(100)
    rng = np.random.default_rng(0)
    t, w = s.sample(1000, rng)
    assert t.min() >= 0 and t.max() < 100
    np.testing.assert_allclose(w, 1.0)


def test_factory():
    assert isinstance(create_named_schedule_sampler("uniform", 10), UniformSampler)
    assert isinstance(
        create_named_schedule_sampler("loss-second-moment", 10), LossSecondMomentResampler
    )


def test_loss_second_moment_warmup_and_weighting():
    s = LossSecondMomentResampler(4, history_per_term=3)
    # Before warm-up, uniform.
    np.testing.assert_allclose(s.weights(), 1.0)
    # Fill history: t=0 gets big losses, others small.
    for _ in range(3):
        s.update_with_all_losses([0, 1, 2, 3], [10.0, 1.0, 1.0, 1.0])
    w = s.weights()
    assert w[0] > w[1]
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-6)
    # History ring shifts oldest out.
    s.update_with_all_losses([0], [0.0])
    assert s._loss_history[0, -1] == 0.0


def test_importance_weights_unbiased():
    s = LossSecondMomentResampler(10, history_per_term=2)
    for _ in range(2):
        s.update_with_all_losses(list(range(10)), list(np.arange(10) + 1.0))
    rng = np.random.default_rng(1)
    t, w = s.sample(200_000, rng)
    # E[w * f(t)] under importance sampling == E_uniform[f(t)] * T ... check f=1
    np.testing.assert_allclose(w.mean(), 1.0, rtol=0.02)
