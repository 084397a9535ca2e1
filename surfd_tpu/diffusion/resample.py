"""Timestep schedule samplers for diffusion training.

Re-design of /root/reference/diffusion/resample.py:8-154. The samplers are
host-side (their state is a tiny (T, K) float array updated once per step —
keeping it out of the compiled step function avoids recompilation and costs
nothing), but the distributed story changes: the reference gathers variable-
length per-rank loss lists with `dist.all_gather` (resample.py:83-99); under
pjit the per-example losses of the *global* batch are already addressable on
every host, so `update_with_all_losses` is called directly with the global
(t, loss) vectors — no collective, no pickle padding.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import numpy as np


def create_named_schedule_sampler(name: str, num_timesteps: int):
    """Factory matching reference `create_named_schedule_sampler` (resample.py:8-22)."""
    if name == "uniform":
        return UniformSampler(num_timesteps)
    if name == "loss-second-moment":
        return LossSecondMomentResampler(num_timesteps)
    raise NotImplementedError(f"unknown schedule sampler: {name}")


class ScheduleSampler(ABC):
    """Importance-sampling distribution over timesteps (resample.py:25-58)."""

    # whether update_with_all_losses consumes the per-example losses — lets
    # the train loop skip the per-step device fetch for stateless samplers
    needs_losses: bool = False

    @abstractmethod
    def weights(self) -> np.ndarray:
        """Unnormalized per-timestep sampling weights."""

    def sample(self, batch_size: int, rng: np.random.Generator):
        """Importance-sample timesteps; returns (indices, importance weights)."""
        w = self.weights()
        p = w / w.sum()
        indices = rng.choice(len(p), size=(batch_size,), p=p)
        weights = 1.0 / (len(p) * p[indices])
        return indices.astype(np.int32), weights.astype(np.float32)

    def update_with_all_losses(self, ts, losses) -> None:
        """Update sampler state with the global batch's per-example losses."""


class UniformSampler(ScheduleSampler):
    def __init__(self, num_timesteps: int):
        self.num_timesteps = num_timesteps
        self._weights = np.ones([num_timesteps])

    def weights(self) -> np.ndarray:
        return self._weights


class LossSecondMomentResampler(ScheduleSampler):
    """E[loss²]^0.5-proportional sampling (resample.py:124-154)."""

    needs_losses = True

    def __init__(self, num_timesteps: int, history_per_term: int = 10, uniform_prob: float = 0.001):
        self.num_timesteps = num_timesteps
        self.history_per_term = history_per_term
        self.uniform_prob = uniform_prob
        self._loss_history = np.zeros([num_timesteps, history_per_term], dtype=np.float64)
        self._loss_counts = np.zeros([num_timesteps], dtype=np.int64)

    def weights(self) -> np.ndarray:
        if not self._warmed_up():
            return np.ones([self.num_timesteps], dtype=np.float64)
        w = np.sqrt(np.mean(self._loss_history**2, axis=-1))
        w /= w.sum()
        w *= 1 - self.uniform_prob
        w += self.uniform_prob / len(w)
        return w

    def update_with_all_losses(self, ts, losses) -> None:
        for t, loss in zip(np.asarray(ts).tolist(), np.asarray(losses).tolist()):
            if self._loss_counts[t] == self.history_per_term:
                # Shift out the oldest loss term.
                self._loss_history[t, :-1] = self._loss_history[t, 1:]
                self._loss_history[t, -1] = loss
            else:
                self._loss_history[t, self._loss_counts[t]] = loss
                self._loss_counts[t] += 1

    def _warmed_up(self) -> bool:
        return bool((self._loss_counts == self.history_per_term).all())
