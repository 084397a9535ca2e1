"""Point-cloud AutoEncoder training: BCE-UDF + gradient-matching loss.

Re-design of `EncoderDecoderTrainer`
(/root/reference/AutoEncoder/trainers/encdec.py:35-341). The step (DGCNN
encode → posenc → CBN decode → BCE(1−udf/max_dist) + 0.1·masked grad MSE)
compiles to one SPMD program; the input-coordinate gradient is a VJP with a
ones cotangent — the exact JAX analogue of the reference's
`compute_gradients` (AutoEncoder/utils.py:365-368: autograd.grad with ones,
create_graph=True), and JAX differentiates through it for the parameter
update (second-order) without retaining a Python graph.

Curriculum learning (encdec.py:204-219) lives in data/curriculum.py as pure
host-side index state; the compiled step never changes shape.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.decoder import CbnDecoder, CoordsEncoder
from ..models.dgcnn import Dgcnn
from .common import TrainState, global_norm, select_update_if_finite


@dataclass
class AETrainConfig:
    latent_size: int = 32
    hidden_dim: int = 512
    num_hidden_layers: int = 5
    num_points_pcd: int = 10_000  # cfg deepfashion3d.yaml:10
    num_points_forward: int = 20_000  # cfg deepfashion3d.yaml:20
    max_dist: float = 0.1
    lr: float = 1e-4
    grad_loss_weight: float = 0.1
    batch_size: int = 8
    num_epochs: int = 6000
    val_every: int = 64  # curriculum refresh cadence (encdec.py:204)
    curriculum_add: int = 100  # samples added per refresh (encdec.py:293-296)


def make_ae_apply_fns(encoder: Dgcnn, decoder: CbnDecoder, coords_encoder=None):
    enc = coords_encoder or CoordsEncoder()

    def encode(variables, pcd, train=False):
        return encoder.apply(variables, pcd, train=train, mutable=["batch_stats"] if train else False)

    def decode(variables, coords, latent, train=False):
        emb = enc.encode(coords)
        return decoder.apply(variables, emb, latent, train=train, mutable=["batch_stats"] if train else False)

    return encode, decode


def make_ae_train_step(
    encoder: Dgcnn,
    decoder: CbnDecoder,
    tx: optax.GradientTransformation,
    coords_encoder: Optional[CoordsEncoder] = None,
    max_dist: float = 0.1,
    grad_loss_weight: float = 0.1,
    latent_reg_weight: float = 0.0,
):
    """Jitted AE train step.

    batch: pcd (B, Np, 3), coords (B, Q, 3), udf (B, Q) raw clipped distances,
    gradients (B, Q, 3). params = {'encoder': ..., 'decoder': ...} with
    matching batch_stats collections.

    latent_reg_weight: optional L2 pull on the latent codes
    (w · mean(latent²)). The reference has no such term; it compacts the
    latent manifold so DIFFUSION-sampled latents land closer to codes the
    decoder has seen — the open-sheet generation gap (MMD-Chamfer 340×
    spheres in r4) traces to sampled latents decoding off-manifold.
    """
    enc = coords_encoder or CoordsEncoder()

    def loss_fn(params, batch_stats, batch):
        pcd, coords = batch["pcd"], batch["coords"]
        gt_udf, gt_grad = batch["udf"], batch["gradients"]
        bce_target = 1.0 - gt_udf / max_dist  # encdec.py:141-142

        latent, enc_updates = encoder.apply(
            {"params": params["encoder"], "batch_stats": batch_stats["encoder"]},
            pcd, train=True, mutable=["batch_stats"],
        )

        def udf_of_coords(c):
            emb = enc.encode(c)
            logits, dec_updates = decoder.apply(
                {"params": params["decoder"], "batch_stats": batch_stats["decoder"]},
                emb, latent, train=True, mutable=["batch_stats"],
            )
            udf_pred = (1.0 - jax.nn.sigmoid(logits)) * max_dist
            return udf_pred, (logits, dec_updates)

        udf_pred, vjp_fn, (logits, dec_updates) = jax.vjp(
            udf_of_coords, coords, has_aux=True
        )
        (grads_wrt_coords,) = vjp_fn(jnp.ones_like(udf_pred))

        udf_loss = optax.sigmoid_binary_cross_entropy(logits, bce_target).mean()
        grad_err = (grads_wrt_coords - gt_grad) ** 2
        mask = (bce_target > 0.0) & (bce_target < 1.0)  # encdec.py:169
        denom = jnp.maximum(mask.sum() * 3, 1)
        grad_loss = jnp.where(mask[..., None], grad_err, 0.0).sum() / denom

        loss = udf_loss + grad_loss_weight * grad_loss
        if latent_reg_weight:
            loss = loss + latent_reg_weight * jnp.mean(latent**2)
        new_stats = {
            "encoder": enc_updates["batch_stats"],
            "decoder": dec_updates["batch_stats"],
        }
        return loss, (udf_loss, grad_loss, new_stats)

    @jax.jit
    def train_step(state: TrainState, batch):
        (loss, (udf_loss, grad_loss, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            batch_stats=new_stats,
        )
        gnorm = global_norm(grads)
        ok = jnp.isfinite(loss) & jnp.isfinite(gnorm)
        new_state = select_update_if_finite(ok, new_state, state)
        metrics = {
            "loss": loss,
            "udf_loss": udf_loss,
            "grad_loss": grad_loss,
            "grad_norm": gnorm,
            "nonfinite_skipped": (~ok).astype(jnp.float32),
        }
        return new_state, metrics

    return train_step


def make_ae_eval_step(
    encoder: Dgcnn,
    decoder: CbnDecoder,
    coords_encoder: Optional[CoordsEncoder] = None,
    max_dist: float = 0.1,
):
    """Per-example validation loss (for curriculum selection, encdec.py:228-296)."""
    enc = coords_encoder or CoordsEncoder()

    @jax.jit
    def eval_step(variables, batch):
        latent = encoder.apply(variables["encoder"], batch["pcd"])
        emb = enc.encode(batch["coords"])
        logits = decoder.apply(variables["decoder"], emb, latent)
        bce_target = 1.0 - batch["udf"] / max_dist
        per_point = optax.sigmoid_binary_cross_entropy(logits, bce_target)
        return per_point.mean(axis=-1)  # (B,)

    return eval_step


def curriculum_validate(
    eval_step,
    variables,
    dataset,
    candidate_idxes,
    num_points_pcd: int,
    num_points_forward: int,
    rng: np.random.Generator,
    batch_size: int = 8,
) -> list:
    """Per-item validation losses over a candidate index set, batched.

    The reference validates the complement set one item at a time
    (encdec.py:228-296 with val batch_size 1 semantics); a per-item dispatch
    costs a full device round trip (~100 ms on the tunnel), so thousands of
    candidates per refresh would take minutes. Items are pre-sampled in index
    order (rng draws identical for any batch size) and padded into fixed-size
    batches through ONE compiled eval — the per-item losses are bitwise
    independent of batch size (eval-mode BN, per-example kNN).
    """
    from ..data.datasets import random_point_sampling

    items = []
    for i in candidate_idxes:
        item = dataset[i]
        pcd = random_point_sampling(item["pcd"], num_points_pcd, rng)
        sel = random_point_sampling(
            np.concatenate([item["coords"], item["labels"][:, None]], -1),
            num_points_forward, rng,
        )
        items.append((pcd, sel[:, :3], sel[:, 3]))

    B = batch_size
    padded = items + items[-1:] * ((-len(items)) % B)
    losses: list = []
    for s in range(0, len(padded), B):
        chunk = padded[s : s + B]
        batch = {
            "pcd": jnp.asarray(np.stack([c[0] for c in chunk])),
            "coords": jnp.asarray(np.stack([c[1] for c in chunk])),
            "udf": jnp.asarray(np.stack([c[2] for c in chunk])),
        }
        losses.extend(np.asarray(eval_step(variables, batch)).tolist())
    return losses[: len(items)]


def init_ae(
    rng,
    cfg: AETrainConfig,
    example_pcd: jnp.ndarray,
    example_coords: jnp.ndarray,
):
    """Initialize encoder + decoder params/batch_stats."""
    encoder = Dgcnn(size_latent=cfg.latent_size)
    decoder = CbnDecoder(
        latent_dim=cfg.latent_size,
        hidden_dim=cfg.hidden_dim,
        num_hidden_layers=cfg.num_hidden_layers,
    )
    enc = CoordsEncoder()
    r1, r2 = jax.random.split(rng)
    ev = encoder.init(r1, example_pcd)
    latent = encoder.apply(ev, example_pcd)
    dv = decoder.init(r2, enc.encode(example_coords), latent)
    params = {"encoder": ev["params"], "decoder": dv["params"]}
    batch_stats = {"encoder": ev["batch_stats"], "decoder": dv["batch_stats"]}
    return encoder, decoder, params, batch_stats
