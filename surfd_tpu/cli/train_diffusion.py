"""Diffusion training CLI.

Parity with /root/reference/train_diffcloth.py:99-190 re-architected for a
device mesh: one SPMD program, batch sharded over the 'data' axis (replacing
DDP/NCCL, :110-117,180-184), frozen DGCNN latents, L1 x0 loss, checkpoint +
resume (optimizer state included).

  python -m surfd_tpu.cli.train_diffusion --data_root DATA --cond_mode no_cond \
      --ae_dir runs/ae --save_dir runs/diffusion --num_steps 600000
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--cond_mode", default="no_cond",
                    choices=["no_cond", "text", "sketch", "img", "category"])
    ap.add_argument("--ae_dir", default="", help="dir with ae_encoder.npz")
    ap.add_argument("--save_dir", required=True)
    ap.add_argument("--latent_size", type=int, default=32)
    ap.add_argument("--model_channels", type=int, default=224)
    ap.add_argument("--batch_size", type=int, default=2)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--weight_decay", type=float, default=0.0)
    ap.add_argument(
        "--noise_schedule", default="cosine", choices=["linear", "cosine"]
    )
    ap.add_argument("--diffusion_steps", type=int, default=1000)
    ap.add_argument("--num_steps", type=int, default=600_000)
    ap.add_argument("--log_interval", type=int, default=100)
    ap.add_argument("--save_interval", type=int, default=50_000)
    ap.add_argument("--num_points_pcd", type=int, default=10_000)
    ap.add_argument("--precompute_latents", action="store_true",
                    help="encode each shape ONCE through the frozen DGCNN and "
                         "train from cached latents (the reference re-encodes "
                         "every step, training_loop_single.py:192-194); trades "
                         "the per-step pcd resample jitter for a much faster "
                         "step — cache at save_dir/latents_cache.npz")
    ap.add_argument("--schedule_sampler", default="uniform",
                    choices=["uniform", "loss-second-moment"])
    ap.add_argument("--steps_per_call", type=int, default=1,
                    help="run K train steps per device call (lax.scan over an "
                         "on-device latent bank). Requires --precompute_latents "
                         "+ the uniform sampler; removes the per-step host "
                         "dispatch round trip, which dominates on a tunneled "
                         "device link. 1 = classic per-step loop.")
    ap.add_argument("--cond_mask_prob", type=float, default=0.0,
                    help="conditioning-dropout prob for CFG training "
                         "(reference mdm.py:27 stored this but never applied it)")
    ap.add_argument("--dropout", type=float, default=0.0,
                    help="UNet res-block dropout (openaimodel.py:450)")
    ap.add_argument("--stall_exit_s", type=float, default=480.0,
                    help="exit 42 when no step completes for this long "
                         "(wedged device link); 0 disables — run under "
                         "scripts/train_with_restarts.sh to auto-resume")
    ap.add_argument("--seed", type=int, default=10)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--captions_csv", default="")
    ap.add_argument("--clip_npz", default="",
                    help="CLIP weights npz for text conditioning (the same "
                    "file generate_text consumes); required for --cond_mode "
                    "text — captions are encoded once per batch through the "
                    "frozen text tower (training_loop_single.py:122-125 "
                    "analogue; the reference re-encodes inside the denoiser)")
    # category conditioning: class map file in the garment_type_list.txt
    # format (`<name> <id> <id> ...` per line, data_loaders/dataset.py:129-137);
    # num_actions 0 = auto (list length, else the reference default 9)
    ap.add_argument("--category_list", default="")
    ap.add_argument("--num_actions", type=int, default=0)
    ap.add_argument("--overwrite", action="store_true")
    args = ap.parse_args()

    if os.path.exists(args.save_dir) and os.listdir(args.save_dir) and not (
        args.resume or args.overwrite
    ):
        # save_dir guard (reference train_diffcloth.py:122-123)
        raise SystemExit(f"save_dir {args.save_dir} exists; pass --resume or --overwrite")
    os.makedirs(args.save_dir, exist_ok=True)

    category_map = None
    if args.category_list:
        from ..data.manifests import load_garment_categories

        category_map, cat2name = load_garment_categories(args.category_list)
        if not args.num_actions:
            args.num_actions = len(cat2name)
    if not args.num_actions:
        args.num_actions = 9
    with open(os.path.join(args.save_dir, "args.json"), "w") as f:
        json.dump(vars(args), f, indent=2)  # args dump parity (:126-130)

    from ..data import DiffusionDataset, diffusion_batch_iterator
    from ..diffusion import named_schedule
    from ..models import MDM, Dgcnn
    from ..parallel import make_mesh
    from ..training import (
        DiffusionTrainConfig,
        DiffusionTrainer,
        create_train_state,
        make_optimizer,
    )
    from ..utils import Logger, fixseed
    from ..utils.checkpoint import Checkpointer, load_params_npz

    rng = fixseed(args.seed)
    np_rng = np.random.default_rng(args.seed)

    dataset = DiffusionDataset(
        args.data_root, "train", cond_mode=args.cond_mode,
        captions_csv=args.captions_csv or None,
        category_map=category_map,
    )
    # frozen encoder (training_loop_single.py:106-113)
    encoder = Dgcnn(size_latent=args.latent_size)
    probe = jnp.zeros((1, args.num_points_pcd, 3))
    enc_vars = encoder.init(jax.random.PRNGKey(0), probe)
    enc_path = os.path.join(args.ae_dir, "ae_encoder.npz") if args.ae_dir else ""
    if enc_path and os.path.exists(enc_path):
        enc_vars = load_params_npz(enc_path, enc_vars)
    else:
        print("WARNING: no AE encoder weights; using random encoder", file=sys.stderr)

    encoder_apply = lambda p: encoder.apply(enc_vars, p)  # noqa: E731

    # text conditioning: captions → frozen CLIP text tower → (B, 512)
    # contexts, once per batch on the host side of the iterator (the trainer
    # consumes only 'context'; without this, text batches would silently
    # train unconditioned)
    encode_text = None
    if args.cond_mode == "text":
        if not args.clip_npz:
            raise SystemExit(
                "--cond_mode text requires --clip_npz (CLIP text-tower "
                "weights; see models.clip.load_clip / save_clip_params)"
            )
        from ..models.clip import load_clip, tokenize

        clip_model, clip_vars = load_clip(args.clip_npz)
        tok_jit = jax.jit(lambda t: clip_model.encode_text(clip_vars, t))

        def encode_text(texts):
            return np.asarray(tok_jit(jnp.asarray(tokenize(texts))))

    if args.precompute_latents:
        from ..data.datasets import latent_diffusion_batch_iterator, precompute_latents

        lat_map = precompute_latents(
            dataset, jax.jit(encoder_apply), args.num_points_pcd, np_rng,
            cache_path=os.path.join(args.save_dir, "latents_cache.npz"),
        )
        print(f"precomputed {len(lat_map)} latents", file=sys.stderr)
        data_iter = latent_diffusion_batch_iterator(
            dataset, lat_map, args.batch_size, np_rng, encode_text=encode_text
        )
        encoder_apply = None
    else:
        data_iter = diffusion_batch_iterator(
            dataset, args.batch_size, args.num_points_pcd, np_rng,
            encode_text=encode_text,
        )
    # overlap host batch prep with the device step (np_rng is owned by the
    # producer thread from here on — nothing else on the main thread uses it)
    from ..data import prefetch_iterator

    data_iter = prefetch_iterator(data_iter, depth=2)

    mdm = MDM(cond_mode=args.cond_mode, model_channels=args.model_channels,
              dropout=args.dropout, num_actions=args.num_actions)
    x0 = jnp.zeros((args.batch_size, args.latent_size, 1))
    t0 = jnp.zeros((args.batch_size,), jnp.int32)
    kw = {}
    if args.cond_mode in ("text", "sketch", "img"):
        kw["context"] = jnp.zeros((args.batch_size, 512))
    elif args.cond_mode == "category":
        kw["action"] = jnp.zeros((args.batch_size,), jnp.int32)
    params = mdm.init(jax.random.PRNGKey(1), x0, t0, **kw)["params"]

    sched = named_schedule(args.noise_schedule, args.diffusion_steps)
    cfg = DiffusionTrainConfig(
        latent_size=args.latent_size,
        batch_size=args.batch_size,
        lr=args.lr,
        weight_decay=args.weight_decay,
        num_steps=args.num_steps,
        log_interval=args.log_interval,
        save_interval=args.save_interval,
        num_points_pcd=args.num_points_pcd,
        schedule_sampler=args.schedule_sampler,
        cond_mode=args.cond_mode,
        cond_mask_prob=args.cond_mask_prob,
        dropout=args.dropout,
        stall_exit_s=args.stall_exit_s,
    )
    tx = make_optimizer(cfg.lr, weight_decay=args.weight_decay)
    state = create_train_state(params, tx)

    ck = Checkpointer(os.path.join(args.save_dir, "ckpt"))
    if args.resume and ck.latest_step() is not None:
        state = ck.restore(jax.tree.map(np.asarray, state))
        print(f"resumed at step {int(state.step)}", file=sys.stderr)

    n_dev = len(jax.devices())
    # DP needs the batch to split evenly over 'data' (reference requires the
    # same of DDP world size, train_diffcloth.py:143)
    mesh = make_mesh() if n_dev > 1 and args.batch_size % n_dev == 0 else None
    if n_dev > 1 and mesh is None:
        print(f"batch {args.batch_size} not divisible by {n_dev} devices; "
              "running single-device", file=sys.stderr)
    logger = Logger(args.save_dir, formats=("stdout", "jsonl", "csv"))

    trainer = DiffusionTrainer(
        cfg, mdm, sched, state, data_iter,
        encoder_apply=encoder_apply,
        checkpointer=ck, logger=logger, mesh=mesh,
    )
    if args.steps_per_call > 1:
        # chunked scan path: the whole (tiny) latent dataset lives on-device;
        # conditioning payloads are per-item constants (datasets._attach_cond)
        # so they bank the same way
        if not args.precompute_latents:
            raise SystemExit("--steps_per_call > 1 requires --precompute_latents")
        if args.schedule_sampler != "uniform":
            raise SystemExit("--steps_per_call > 1 requires the uniform sampler")
        if mesh is not None:
            print("steps_per_call > 1 runs single-device; ignoring mesh",
                  file=sys.stderr)
            trainer.mesh = None
        items = [dataset.cond_item(i) for i in range(len(dataset))]
        bank = {"latents": jnp.asarray(np.stack([lat_map[it["id"]] for it in items]))}
        if args.cond_mode == "category":
            bank["action"] = jnp.asarray([it["action"] for it in items], jnp.int32)
        elif args.cond_mode == "text":
            bank["context"] = jnp.asarray(
                np.concatenate([encode_text([it["text"] for it in items[s:s + 16]])
                                for s in range(0, len(items), 16)])
            )
        elif args.cond_mode in ("sketch", "img"):
            bank["context"] = jnp.asarray(np.stack([it["context"] for it in items]))
        final = trainer.run_chunked(bank, args.steps_per_call, rng=rng)
    else:
        final = trainer.run(rng=rng)
    ck.save(int(final.step), final, force=True)
    ck.wait()
    print(f"done at step {int(final.step)}", file=sys.stderr)


if __name__ == "__main__":
    main()
