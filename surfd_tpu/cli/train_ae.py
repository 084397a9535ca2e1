"""AutoEncoder training CLI with curriculum learning.

Parity with /root/reference/AutoEncoder/encdec/train_encdec.py +
trainers/encdec.py:35-341: BCE-UDF + 0.1·grad loss, curriculum refresh every
`val_every` epochs adding the `curriculum_add` easiest complement samples,
best/last checkpointing, curriculum persistence.

  python -m surfd_tpu.cli.train_ae --data_root DATA --save_dir runs/ae \
      --latent_size 32 --num_epochs 6000
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="", help="shipped dataset preset "
                    "(deepfashion3d|pix3d|text2shape) or a JSON path; "
                    "explicit flags override preset values")
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--save_dir", required=True)
    ap.add_argument("--latent_size", type=int, default=32)
    ap.add_argument("--hidden_dim", type=int, default=512)
    ap.add_argument("--num_hidden_layers", type=int, default=5)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--num_epochs", type=int, default=6000)
    ap.add_argument("--num_points_pcd", type=int, default=10_000)
    ap.add_argument("--num_points_forward", type=int, default=20_000)
    ap.add_argument("--max_dist", type=float, default=0.1)
    ap.add_argument("--latent_reg", type=float, default=0.0,
                    help="L2 pull on latent codes (w·mean(latent²)); compacts "
                    "the latent manifold for the downstream diffusion — the "
                    "reference has no such term, 0 keeps its semantics")
    ap.add_argument("--augment_rotations", action="store_true",
                    help="random SO(3) rotation per item (pcd+queries+grads "
                    "jointly; UDF labels are invariant)")
    ap.add_argument("--curriculum", action="store_true")
    ap.add_argument("--curriculum_init", type=int, default=100)
    ap.add_argument("--curriculum_add", type=int, default=100)
    ap.add_argument("--val_every", type=int, default=64)
    ap.add_argument("--seed", type=int, default=10)
    ap.add_argument("--log_interval", type=int, default=10)
    ap.add_argument("--save_every_epochs", type=int, default=50,
                    help="checkpoint cadence; lower it on flaky device links "
                         "to bound the progress lost per stall restart")
    ap.add_argument("--stall_exit_s", type=float, default=480.0,
                    help="exit 42 when no step completes for this long "
                         "(wedged device link); 0 disables — run under "
                         "scripts/train_with_restarts.sh to auto-resume")
    from ..utils.config import apply_preset_defaults

    apply_preset_defaults(ap)
    args = ap.parse_args()

    from ..data import CurriculumState, SequenceSamplerTrain, UdfDataset, ae_batch_iterator
    from ..data.datasets import random_point_sampling
    from ..training import AETrainConfig, create_train_state, init_ae, make_ae_eval_step, make_ae_train_step, make_optimizer
    from ..utils import Logger, fixseed
    from ..utils.checkpoint import Checkpointer, save_params_npz

    fixseed(args.seed)
    np_rng = np.random.default_rng(args.seed)
    os.makedirs(args.save_dir, exist_ok=True)
    import json

    # args dump (reference train_diffcloth.py:126-130 equivalent) — the
    # generation CLIs re-merge the architecture keys from this file
    # (cli/_common.py merge_saved_args), so checkpoints trained at
    # non-default dims sample correctly with no re-typed flags.
    with open(os.path.join(args.save_dir, "args.json"), "w") as f:
        json.dump(vars(args), f, indent=2)

    dataset = UdfDataset(args.data_root, "train")
    n = len(dataset)
    cur_path = os.path.join(args.save_dir, "training_idxes.txt")
    if args.curriculum:
        if os.path.exists(cur_path):
            state_cur = CurriculumState.load(cur_path, n)
        else:
            init_idx = np_rng.choice(n, size=min(args.curriculum_init, n), replace=False)
            state_cur = CurriculumState(n, init_idx.tolist())
    else:
        state_cur = CurriculumState(n, list(range(n)))

    cfg = AETrainConfig(
        latent_size=args.latent_size,
        hidden_dim=args.hidden_dim,
        num_hidden_layers=args.num_hidden_layers,
        num_points_pcd=args.num_points_pcd,
        num_points_forward=args.num_points_forward,
        max_dist=args.max_dist,
        lr=args.lr,
        batch_size=args.batch_size,
    )
    encoder, decoder, params, batch_stats = init_ae(
        jax.random.PRNGKey(0), cfg,
        jnp.zeros((1, args.num_points_pcd, 3)),
        jnp.zeros((1, args.num_points_forward, 3)),
    )
    tx = make_optimizer(cfg.lr)
    state = create_train_state(params, tx, batch_stats=batch_stats)
    train_step = make_ae_train_step(
        encoder, decoder, tx, max_dist=cfg.max_dist,
        latent_reg_weight=args.latent_reg,
    )
    eval_step = make_ae_eval_step(encoder, decoder, max_dist=cfg.max_dist)

    ck = Checkpointer(os.path.join(args.save_dir, "ckpt"))
    if ck.latest_step() is not None:
        state = ck.restore(jax.tree.map(np.asarray, state))
        print(f"resumed at step {int(state.step)}", file=sys.stderr)

    logger = Logger(args.save_dir, formats=("stdout", "jsonl", "csv"))
    from ..data import prefetch_iterator

    # prefetch: prepare the next batch on a worker thread while the device
    # executes the current step (the host side is ~0.35 s/step on one core).
    # Curriculum growth reaches the producer through the live `sampler`
    # closure; at most `depth` already-queued batches lag the new index set.
    # The producer gets its OWN Generator — np.random.Generator is not
    # thread-safe and `np_rng` stays in use on the main thread (validation).
    np_rng_data = np.random.default_rng(args.seed + 1)
    sampler = SequenceSamplerTrain(state_cur, np_rng_data)
    train_iter = prefetch_iterator(ae_batch_iterator(
        dataset, lambda: list(sampler), args.batch_size,
        args.num_points_pcd, args.num_points_forward, np_rng_data, args.max_dist,
        augment_rotations=args.augment_rotations,
    ), depth=2)

    def run_val_and_grow():
        """Validate the complement set, add the easiest (encdec.py:228-296).
        Batched through one compiled eval — one dispatch per batch_size items
        instead of one per item (the tunnel costs ~100 ms per dispatch)."""
        from ..training import curriculum_validate

        comp = state_cur.complement
        if not comp:
            return
        variables = {
            "encoder": {"params": state.params["encoder"], "batch_stats": state.batch_stats["encoder"]},
            "decoder": {"params": state.params["decoder"], "batch_stats": state.batch_stats["decoder"]},
        }
        losses = curriculum_validate(
            eval_step, variables, dataset, comp,
            args.num_points_pcd, args.num_points_forward, np_rng, args.batch_size,
        )
        state_cur.add_easiest(comp, losses, args.curriculum_add)
        state_cur.save(cur_path)
        logger.log_metrics({"curriculum_size": len(state_cur.training_idxes)}, int(state.step))

    from ..training import GracefulShutdown, StallWatchdog

    def save_all():
        ck.save(global_step, state, force=True)
        save_params_npz(
            os.path.join(args.save_dir, "ae_encoder.npz"),
            {"params": state.params["encoder"], "batch_stats": state.batch_stats["encoder"]},
        )
        save_params_npz(
            os.path.join(args.save_dir, "ae_decoder.npz"),
            {"params": state.params["decoder"], "batch_stats": state.batch_stats["decoder"]},
        )

    global_step = int(state.step)
    with GracefulShutdown() as stop, StallWatchdog(args.stall_exit_s) as wd:
        for epoch in range(args.num_epochs):
            steps_per_epoch = max(len(state_cur.training_idxes) // args.batch_size, 1)
            for _ in range(steps_per_epoch):
                state, metrics = train_step(state, next(train_iter))
                wd.tick()
                # host-side counter (lockstep with state.step, which advances
                # even on guard-skipped updates): fetching int(state.step)
                # every step would cost one device round trip per step and
                # defeat async dispatch.
                global_step += 1
                if global_step % args.log_interval == 0:
                    host = jax.device_get(metrics)  # ONE transfer for all keys
                    logger.log_metrics(
                        {k: float(v) for k, v in host.items()}, global_step
                    )
                if stop.requested:
                    break
            if stop.requested:
                # preemption (SIGTERM/SIGINT): persist a resumable state
                print(f"preempted at step {global_step}; saving", file=sys.stderr)
                save_all()
                break
            if args.curriculum and (epoch + 1) % args.val_every == 0:
                run_val_and_grow()
            if (epoch + 1) % args.save_every_epochs == 0 or epoch == args.num_epochs - 1:
                save_all()
    ck.wait()
    print(f"done at step {global_step}", file=sys.stderr)


if __name__ == "__main__":
    main()
