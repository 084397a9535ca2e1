"""Latent-diffusion training step and loop.

Re-design of the reference `TrainLoop`
(/root/reference/training_loop_single.py:32-388) + `train_diffcloth.py`:

  * The whole step (frozen DGCNN encode → q_sample → denoise → L1 → AdamW
    update) is ONE jitted SPMD program over the ('data','model') mesh; DDP's
    gradient all-reduce (train_diffcloth.py:180-184) becomes the psum XLA
    inserts for the replicated-param/shard-batch layout.
  * The latent-size selection bug (training_loop_single.py:103-106:
    `'text' or 'img' in cond_mode` is always truthy → always 64) is fixed by
    making latent size an explicit config field.
  * Optimizer state IS checkpointed and resumed (the reference saves opt
    state but never restores it, training_loop_single.py:158-169).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion import Schedule, training_losses
from ..diffusion.gaussian import LossType, MeanType, VarType
from ..models.mdm import MDM
from .common import TrainState, ema_update, global_norm, select_update_if_finite


@dataclass
class DiffusionTrainConfig:
    latent_size: int = 32  # 32 deepfashion3d / 64 pix3d,text2shape (BASELINE.md)
    batch_size: int = 2  # per reference train_diffcloth.py:143
    lr: float = 1e-4
    weight_decay: float = 0.0
    num_steps: int = 600_000
    log_interval: int = 100
    save_interval: int = 50_000
    l1_weight: float = 1000.0
    ema_rate: float = 0.0  # 0 disables (reference keeps no EMA)
    num_points_pcd: int = 10_000
    schedule_sampler: str = "uniform"
    cond_mode: str = "no_cond"
    # Conditioning dropout for CFG: with prob p per example, context→zeros /
    # action→null_action so the samplers' unconditional branch is trained.
    # The reference STORES this (models/mdm.py:27) but never applies it — the
    # one place "match the reference" means "implement what it intended".
    cond_mask_prob: float = 0.0
    dropout: float = 0.0  # UNet res-block dropout (openaimodel.py:450)
    # exit 42 when no step completes for this long (wedged device link;
    # common.StallWatchdog) — 0 disables
    stall_exit_s: float = 480.0


def make_train_step(
    mdm: MDM,
    sched: Schedule,
    tx: optax.GradientTransformation,
    encoder_apply: Optional[Callable] = None,
    l1_weight: float = 1000.0,
    ema_rate: float = 0.0,
    cond_mask_prob: float = 0.0,
):
    """Build the jitted train step.

    Inputs per call:
      state    — TrainState (replicated)
      batch    — dict with either 'latents' (B, L) or 'pcd' (B, N, 3) when
                 encoder_apply is given (frozen DGCNN,
                 training_loop_single.py:192-194), plus optional
                 'context' (B, 512) / 'action' (B,) conditioning
      t        — (B,) timestep indices from the schedule sampler
      weights  — (B,) importance weights
      rng      — PRNGKey

    Returns (new_state, metrics) where metrics includes the per-example loss
    vector for LossAwareSampler updates (no collective needed: under pjit the
    output is globally addressable, replacing resample.py:83-99).
    """

    def loss_fn(params, batch, t, weights, rng):
        if "latents" in batch:
            latents = batch["latents"]
        else:
            assert encoder_apply is not None
            latents = jax.lax.stop_gradient(encoder_apply(batch["pcd"]))
        x0 = latents[..., None]  # (B, L, 1)

        context = batch.get("context")
        action = batch.get("action")

        rng, drop_rng, cond_rng = jax.random.split(rng, 3)
        if cond_mask_prob > 0.0:
            keep_shape = (x0.shape[0],)
            drop = jax.random.bernoulli(cond_rng, cond_mask_prob, keep_shape)
            if context is not None:
                context = jnp.where(drop[:, None], 0.0, context)
            if action is not None:
                action = jnp.where(drop, mdm.null_action, action)

        train = mdm.dropout > 0.0

        def model_fn(x, tt):
            return mdm.apply(
                {"params": params}, x, tt, context=context, action=action,
                train=train, rngs={"dropout": drop_rng} if train else None,
            )

        terms = training_losses(
            sched, model_fn, x0, t, rng,
            mean_type=MeanType.START_X, var_type=VarType.FIXED_SMALL,
            loss_type=LossType.MSE, l1_weight=l1_weight,
        )
        loss = (terms["loss"] * weights).mean()
        return loss, terms

    @jax.jit
    def train_step(state: TrainState, batch, t, weights, rng):
        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, t, weights, rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None:
            ema = ema_update(ema, params, ema_rate)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state, ema_params=ema
        )
        gnorm = global_norm(grads)
        ok = jnp.isfinite(loss) & jnp.isfinite(gnorm)
        new_state = select_update_if_finite(ok, new_state, state)
        metrics = {
            "loss": loss,
            "latent_l1": terms["latent_l1"].mean(),
            "per_example_loss": terms["loss"],
            "grad_norm": gnorm,
            "param_norm": global_norm(params),
            "nonfinite_skipped": (~ok).astype(jnp.float32),
        }
        return new_state, metrics

    return train_step


def make_chunked_train_step(step_fn, bank):
    """K train steps per device call: `lax.scan` over an on-device data bank.

    The per-step loop pays one host→device dispatch round trip per step —
    negligible locally, but dominant over a tunneled device link (and the
    reference pays the same per-step Python/DataLoader overhead,
    /root/reference/training_loop_single.py:254-297). With precomputed
    latents the whole dataset is a few KB, so it can live on-device and K
    steps can run as ONE compiled program. The host keeps full ownership of
    randomness and data order: it supplies per-step batch-index rows,
    timesteps, importance weights, and PRNG keys, so one chunk is exactly
    the Python loop over `step_fn` with the same inputs — identical to
    ULP-level fusion reordering (parity tested in
    tests/test_training_and_pipeline.py).

    bank: per-item device arrays — 'latents' (N, L) plus optional 'action'
    (N,) / 'context' (N, 512) rows, gathered per step by index.
    """

    def run_chunk(state: TrainState, idx, t, weights, rngs):
        # idx/t/weights: (K, B); rngs: (K,) PRNG keys
        def body(st, xs):
            i, tt, ww, rr = xs
            batch = {k: v[i] for k, v in bank.items()}
            st, m = step_fn(st, batch, tt, ww, rr)
            return st, {k: v for k, v in m.items() if k != "per_example_loss"}

        return jax.lax.scan(body, state, (idx, t, weights, rngs))

    return jax.jit(run_chunk)


class DiffusionTrainer:
    """Host-side training loop driving the jitted step.

    Mirrors TrainLoop.run_loop (training_loop_single.py:173-247): per step
    sample 10k pcd points (fixed indices shared across steps,
    train_diffcloth.py:189-190 — here fresh indices per run), encode, build
    cond, importance-sample t, step, log, checkpoint.
    """

    def __init__(
        self,
        cfg: DiffusionTrainConfig,
        mdm: MDM,
        sched: Schedule,
        state: TrainState,
        data_iter,
        encoder_apply=None,
        schedule_sampler=None,
        checkpointer=None,
        logger=None,
        mesh=None,
    ):
        from ..diffusion import create_named_schedule_sampler

        self.cfg = cfg
        self.mdm = mdm
        self.sched = sched
        self.state = state
        self.data_iter = data_iter
        self.schedule_sampler = schedule_sampler or create_named_schedule_sampler(
            cfg.schedule_sampler, sched.num_timesteps
        )
        self.checkpointer = checkpointer
        self.logger = logger
        self.mesh = mesh
        from .common import make_optimizer

        tx = make_optimizer(cfg.lr, cfg.weight_decay)
        self._step_fn = make_train_step(
            mdm, sched, tx, encoder_apply, cfg.l1_weight, cfg.ema_rate,
            cond_mask_prob=cfg.cond_mask_prob,
        )
        self._np_rng = np.random.default_rng(0)

    def run(self, num_steps: Optional[int] = None, rng=None):
        from .common import GracefulShutdown, StallWatchdog

        rng = rng if rng is not None else jax.random.PRNGKey(0)
        num_steps = num_steps or self.cfg.num_steps
        # host-side step counter, in lockstep with state.step (which advances
        # even when the non-finite guard skips an update): reading
        # int(self.state.step) per step would force a device round trip and
        # serialize async dispatch.
        step = start = int(self.state.step)
        with GracefulShutdown() as stop, \
                StallWatchdog(self.cfg.stall_exit_s) as wd:
            for _ in range(start, num_steps):
                if stop.requested:
                    # preemption: persist everything and leave resumably
                    if self.checkpointer:
                        self.checkpointer.save(step, self.state, force=True)
                        self.checkpointer.wait()
                    if self.logger:
                        self.logger.log_metrics({"preempted": 1.0}, step)
                    return self.state
                batch = next(self.data_iter)
                if self.mesh is not None:
                    from ..parallel.mesh import shard_batch

                    batch = shard_batch(self.mesh, batch)
                B = jax.tree.leaves(batch)[0].shape[0]
                t, weights = self.schedule_sampler.sample(B, self._np_rng)
                rng, sub = jax.random.split(rng)
                self.state, metrics = self._step_fn(
                    self.state, batch, jnp.asarray(t), jnp.asarray(weights), sub
                )
                wd.tick()
                if self.schedule_sampler.needs_losses:
                    # per-step device fetch only for the importance sampler —
                    # the uniform sampler keeps the loop free of round trips
                    per_ex = np.asarray(metrics["per_example_loss"])
                    if np.isfinite(per_ex).all():  # a poisoned batch must not
                        # enter the importance-sampler's loss history either
                        self.schedule_sampler.update_with_all_losses(t, per_ex)
                step += 1
                if self.logger and step % self.cfg.log_interval == 0:
                    host = jax.device_get(  # ONE transfer for all scalar keys
                        {k: v for k, v in metrics.items() if np.ndim(v) == 0}
                    )
                    self.logger.log_metrics(
                        {k: float(v) for k, v in host.items()}, step=step,
                    )
                if self.checkpointer and step % self.cfg.save_interval == 0:
                    self.checkpointer.save(step, self.state)
        return self.state

    def run_chunked(self, bank, steps_per_call: int, num_steps=None, rng=None):
        """Drive training through make_chunked_train_step (K steps per device
        call). Data order is the same epoch-permutation scheme as
        latent_diffusion_batch_iterator; t/weights come from the same
        schedule sampler on the same host RNG. Uniform sampler only — the
        loss-aware sampler needs per-step loss feedback on the host.
        """
        from .common import GracefulShutdown, StallWatchdog

        if self.schedule_sampler.needs_losses:
            raise ValueError("chunked training requires the uniform sampler")
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        num_steps = num_steps or self.cfg.num_steps
        chunk_fn = make_chunked_train_step(self._step_fn, bank)
        B = self.cfg.batch_size
        n = int(jax.tree.leaves(bank)[0].shape[0])
        if n < B:
            raise ValueError(f"bank of {n} items < batch size {B}")

        def index_rows():
            while True:
                order = self._np_rng.permutation(n)
                for s in range(0, n - B + 1, B):
                    yield order[s : s + B]

        rows = index_rows()
        step = int(self.state.step)
        with GracefulShutdown() as stop, \
                StallWatchdog(self.cfg.stall_exit_s) as wd:
            while step < num_steps:
                if stop.requested:
                    if self.checkpointer:
                        self.checkpointer.save(step, self.state, force=True)
                        self.checkpointer.wait()
                    if self.logger:
                        self.logger.log_metrics({"preempted": 1.0}, step)
                    return self.state
                # stop the chunk at the next log/save boundary so cadence
                # matches the per-step path
                K = min(steps_per_call, num_steps - step)
                for interval in (self.cfg.log_interval, self.cfg.save_interval):
                    if interval:
                        K = min(K, interval - step % interval)
                idx = np.stack([next(rows) for _ in range(K)]).astype(np.int32)
                t, w = self.schedule_sampler.sample(K * B, self._np_rng)
                rng, sub = jax.random.split(rng)
                rngs = jax.random.split(sub, K)
                self.state, ms = chunk_fn(
                    self.state,
                    jnp.asarray(idx),
                    jnp.asarray(np.asarray(t).reshape(K, B)),
                    jnp.asarray(np.asarray(w).reshape(K, B)),
                    rngs,
                )
                wd.tick()
                step += K
                if self.logger and step % self.cfg.log_interval == 0:
                    host = jax.device_get(ms)  # (K,) per scalar key
                    out = {k: float(np.asarray(v)[-1]) for k, v in host.items()}
                    out["nonfinite_skipped"] = float(
                        np.asarray(host["nonfinite_skipped"]).sum()
                    )
                    self.logger.log_metrics(out, step=step)
                if self.checkpointer and step % self.cfg.save_interval == 0:
                    self.checkpointer.save(step, self.state)
        return self.state
