"""Training-step throughput on the attached device.

The reference publishes no training throughput (BASELINE.md); this records
ours for the two training loops at the reference's production configs:

  * diffusion: batch 2/device (train_diffcloth.py:143), frozen DGCNN
    encoder in the step (10k pcd points -> latent 32), 224-ch MDM, x0-L1
    loss, AdamW + staircase anneal — the full jitted step of
    training/diffusion_trainer.py.
  * AE: batch 8 (deepfashion3d.yaml:9), 10k pcd + 20k query points, BCE +
    0.1 x masked-gradient MSE (second-order VJP) — the full jitted step of
    training/ae_trainer.py.

Usage: python scripts/bench_train.py [--steps 30]
Prints one JSON line per loop: {"metric": ..., "steps_per_s": ...,
"samples_per_s": ...}.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

jax.config.update("jax_compilation_cache_dir", "/tmp/surfd_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_steps(step_fn, n, warmup=3):
    for _ in range(warmup):
        step_fn()
    t0 = time.perf_counter()
    for _ in range(n):
        out = step_fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def bench_diffusion(steps: int):
    from surfd_tpu.diffusion import named_schedule
    from surfd_tpu.models import MDM, Dgcnn
    from surfd_tpu.training import create_train_state, make_optimizer
    from surfd_tpu.training.diffusion_trainer import make_train_step

    B, L, NP = 2, 32, 10_000
    encoder = Dgcnn(size_latent=L)
    enc_vars = encoder.init(jax.random.PRNGKey(0), jnp.zeros((1, NP, 3)))
    encoder_apply = lambda pcd: encoder.apply(enc_vars, pcd)

    mdm = MDM(cond_mode="no_cond")
    params = mdm.init(
        jax.random.PRNGKey(1), jnp.zeros((B, L, 1)), jnp.zeros((B,), jnp.int32)
    )["params"]
    sched = named_schedule("cosine", 1000)
    tx = make_optimizer(1e-4)
    state = create_train_state(params, tx)
    step = make_train_step(mdm, sched, tx, encoder_apply=encoder_apply)

    rngn = np.random.default_rng(0)
    batch = {"pcd": jnp.asarray(rngn.normal(size=(B, NP, 3)), jnp.float32)}
    t = jnp.asarray(rngn.integers(0, 1000, B), jnp.int32)
    w = jnp.ones((B,), jnp.float32)
    rng = jax.random.PRNGKey(2)

    holder = {"state": state}

    def one():
        holder["state"], m = step(holder["state"], batch, t, w, rng)
        return m["loss"]

    dt = time_steps(one, steps)
    print(json.dumps({
        "metric": "diffusion_train_step_seconds",
        "value": round(dt, 4), "unit": "s",
        "steps_per_s": round(1 / dt, 2),
        "samples_per_s": round(B / dt, 2),
        "batch": B, "pcd_points": NP,
    }))


def bench_ae(steps: int):
    from surfd_tpu.training import create_train_state, make_optimizer
    from surfd_tpu.training.ae_trainer import AETrainConfig, init_ae, make_ae_train_step

    cfg = AETrainConfig()
    B, NP, Q = cfg.batch_size, cfg.num_points_pcd, cfg.num_points_forward
    rngn = np.random.default_rng(0)
    pcd = jnp.asarray(rngn.normal(size=(B, NP, 3)), jnp.float32)
    coords = jnp.asarray(rngn.uniform(-1, 1, (B, Q, 3)), jnp.float32)
    encoder, decoder, params, batch_stats = init_ae(
        jax.random.PRNGKey(0), cfg, pcd[:1], coords[:1]
    )
    tx = make_optimizer(cfg.lr)
    state = create_train_state(params, tx, batch_stats=batch_stats)
    step = make_ae_train_step(encoder, decoder, tx, max_dist=cfg.max_dist)

    batch = {
        "pcd": pcd,
        "coords": coords,
        "udf": jnp.asarray(rngn.uniform(0, cfg.max_dist, (B, Q)), jnp.float32),
        "gradients": jnp.asarray(rngn.normal(size=(B, Q, 3)), jnp.float32),
    }
    holder = {"state": state}

    def one():
        holder["state"], m = step(holder["state"], batch)
        return m["loss"]

    dt = time_steps(one, steps)
    print(json.dumps({
        "metric": "ae_train_step_seconds",
        "value": round(dt, 4), "unit": "s",
        "steps_per_s": round(1 / dt, 2),
        "samples_per_s": round(B / dt, 2),
        "batch": B, "pcd_points": NP, "query_points": Q,
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--only", choices=["diffusion", "ae"], default=None)
    args = ap.parse_args()
    log(f"device: {jax.devices()[0]}")
    if args.only in (None, "diffusion"):
        bench_diffusion(args.steps)
    if args.only in (None, "ae"):
        bench_ae(args.steps)


if __name__ == "__main__":
    main()
