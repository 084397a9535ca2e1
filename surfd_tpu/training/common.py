"""Shared training utilities: train state, optimizer, EMA, norms.

Replaces the reference's `MixedPrecisionTrainer`
(/root/reference/diffusion/fp16_util.py:148-236) and the AdamW + step-decay
setup (/root/reference/training_loop_single.py:87-89, 299-309). On TPU there
is no loss-scaling machinery: the master params stay float32 and bfloat16 is
used inside the model where requested, which needs no NaN backoff.
"""

from __future__ import annotations

import os
import sys
import threading
import time
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    batch_stats: Any = None
    ema_params: Any = None


def make_optimizer(
    lr: float = 1e-4,
    weight_decay: float = 0.0,
    decay_rate: float = 0.9,
    decay_every: int = 1000,
    lr_floor: float = 1e-7,
) -> optax.GradientTransformation:
    """AdamW with the reference's staircase anneal: lr ← lr·0.9 every 1000
    steps, floored at 1e-7 (training_loop_single.py:299-309)."""
    schedule = optax.exponential_decay(
        init_value=lr,
        transition_steps=decay_every,
        decay_rate=decay_rate,
        staircase=True,
        end_value=lr_floor,
    )
    return optax.adamw(schedule, weight_decay=weight_decay)


def ema_update(ema_params, params, rate: float):
    """EMA of parameters (reference diffusion/nn.py `update_ema`)."""
    return jax.tree.map(lambda e, p: e * rate + p * (1.0 - rate), ema_params, params)


def global_norm(tree) -> jnp.ndarray:
    """sqrt(Σ‖x‖²) over a pytree (grad/param norm logging,
    fp16_util.py:199-212)."""
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.vdot(x, x).real for x in leaves))


def select_update_if_finite(ok, new_state, state):
    """In-graph failure detection: keep the update only when `ok` (scalar
    bool — loss and grad norm finite), else carry the previous params /
    opt_state / batch_stats / EMA forward and only advance the step counter.

    This is the TPU analog of the reference's fp16 NaN backoff
    (/root/reference/diffusion/fp16_util.py:189-235): there is no loss scale
    to shrink in bf16, but a poisoned batch (NaN in data, overflowed loss)
    must not corrupt the parameters. Runs entirely inside the jitted step —
    zero host syncs; surface the skip via a `nonfinite_skipped` metric.
    """
    guarded = jax.tree.map(lambda n, o: jnp.where(ok, n, o), new_state, state)
    return guarded.replace(step=new_state.step)


def create_train_state(
    params,
    tx: optax.GradientTransformation,
    batch_stats=None,
    ema: bool = False,
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=batch_stats,
        ema_params=jax.tree.map(jnp.copy, params) if ema else None,
    )


class GracefulShutdown:
    """Preemption handling for training loops (SURVEY §5 failure-detection
    row; the reference has none — a SIGTERM mid-epoch loses everything since
    its last 50k-step save).

    Registers SIGTERM/SIGINT handlers that set a flag; loops poll
    `requested` once per step and checkpoint + exit cleanly. TPU preemption
    notices arrive as SIGTERM with ~30 s of grace — one step + one Orbax
    async save fit comfortably. Use as a context manager so the previous
    handlers are restored (important under pytest).
    """

    def __init__(self, signals=None):
        import signal as _signal

        self._signal = _signal
        self.signals = signals or (_signal.SIGTERM, _signal.SIGINT)
        self.requested = False
        self._prev = {}

    def _handler(self, signum, frame):
        self.requested = True

    def __enter__(self):
        for s in self.signals:
            self._prev[s] = self._signal.signal(s, self._handler)
        return self

    def __exit__(self, *exc):
        for s, h in self._prev.items():
            self._signal.signal(s, h)
        return False


class StallWatchdog:
    """Hang detection for training loops (SURVEY §5 failure-detection row).

    The link to the device can wedge a pending RPC forever — every thread
    asleep, no exception ever raised (observed on the tunnelled deployment;
    CUDA/NCCL either completes or aborts, so the reference never needed
    this). A wedged step can be neither interrupted nor checkpointed (the
    state lives device-side behind the same dead link), so the only safe
    recovery is: exit the process with a distinctive code and let a restart
    loop (scripts/train_with_restarts.sh) resume from the last checkpoint.

    Loops call `tick()` once per completed step. Async dispatch means a tick
    lags true device progress by at most the in-flight queue depth; when the
    link wedges, the loop stops ticking within seconds. The first tick gets
    `first_grace_s` (compile time is legitimate minutes); after that,
    silence for `timeout_s` triggers exit(EXIT_CODE) from a daemon thread.
    `timeout_s=0` disables. Use as a context manager.
    """

    EXIT_CODE = 42

    def __init__(self, timeout_s: float = 480.0, first_grace_s: float = 3600.0):
        self.timeout_s = float(timeout_s)
        self.first_grace_s = float(first_grace_s)
        self._last = None  # monotonic time of the last tick; None = pre-first
        self._t0 = None
        self._stop = threading.Event()

    def tick(self):
        self._last = time.monotonic()

    def _watch(self):
        while not self._stop.wait(min(30.0, self.timeout_s / 4)):
            now = time.monotonic()
            if self._last is None:
                if now - self._t0 > self.first_grace_s:
                    self._bark(now - self._t0, "no first step")
            elif now - self._last > self.timeout_s:
                self._bark(now - self._last, "no step completed")

    def _bark(self, silent_s: float, why: str):
        print(
            f"StallWatchdog: {why} in {silent_s:.0f}s — device link presumed "
            f"wedged; exiting {self.EXIT_CODE} for the restart loop",
            file=sys.stderr, flush=True,
        )
        os._exit(self.EXIT_CODE)

    def __enter__(self):
        self._t0 = time.monotonic()
        if self.timeout_s > 0:
            threading.Thread(target=self._watch, daemon=True,
                             name="stall-watchdog").start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        return False
