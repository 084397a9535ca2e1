"""MDM — the denoiser facade with conditioning routing, plus CFG.

Re-design of /root/reference/models/mdm.py:9-110 and
/root/reference/models/cfg_sampler.py:8-27.

Routing parity (reference mdm.py:91-110): text / sketch / img conditioning all
enter as a 512-d CLIP embedding `context`; category conditioning enters as an
integer class label. One deliberate change: the reference tokenizes + encodes
text through frozen CLIP inside every denoiser forward (mdm.py:86-89,96-97) —
1000× redundantly during sampling. Here CLIP is frozen and outside the jitted
graph, so text is pre-encoded once and passed as `context`, which is
mathematically identical and removes a host round-trip per step.

CFG: the reference runs two sequential model calls (cfg_sampler.py:24-26);
here the cond and uncond branches are one batched call (batch 2B) so the MXU
sees twice the batch instead of two launches.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .unet1d import UNet1D

COND_MODES = ("no_cond", "text", "sketch", "img", "category")


class MDM(nn.Module):
    """Denoiser facade. Input latent x: (B, L, 1) channel-last."""

    cond_mode: str = "no_cond"
    num_actions: int = 9  # garment classes (reference sample/generate_cat.py:21-29)
    clip_dim: int = 512
    model_channels: int = 224
    num_res_blocks: int = 2
    channel_mult: tuple = (1, 2, 4, 4)
    num_heads: int = 8
    dropout: float = 0.0  # reference openaimodel.py:450 (0 in shipped config)
    use_remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def null_action(self) -> int:
        """Dedicated unconditional class id for CFG (one past the real classes).

        The reference's `y['uncond']=True` path (cfg_sampler.py:18-26) zeroes
        the conditioning payload; aliasing class 0 for that would conflate
        "unconditional" with the first garment class, so we reserve an extra
        embedding row instead (zero-padded when converting reference ckpts).
        """
        return self.num_actions

    def setup(self):
        if self.cond_mode not in COND_MODES:
            raise ValueError(f"cond_mode must be one of {COND_MODES}, got {self.cond_mode}")
        self.unet = UNet1D(
            in_channels=1,
            model_channels=self.model_channels,
            out_channels=1,
            num_res_blocks=self.num_res_blocks,
            attention_resolutions=(4, 2, 1),
            channel_mult=self.channel_mult,
            num_classes=self.num_actions + 1 if self.cond_mode == "category" else None,
            null_class=self.null_action if self.cond_mode == "category" else None,
            num_heads=self.num_heads,
            dropout=self.dropout,
            context_dim=self.clip_dim,
            use_remat=self.use_remat,
            dtype=self.dtype,
            name="unet",
        )

    def __call__(
        self,
        x: jnp.ndarray,
        timesteps: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        action: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        if self.cond_mode in ("text", "sketch", "img"):
            assert context is not None, f"{self.cond_mode} conditioning requires context"
            return self.unet(x, timesteps, context=context, train=train)
        if self.cond_mode == "category":
            assert action is not None, "category conditioning requires action labels"
            return self.unet(x, timesteps, y=action, train=train)
        return self.unet(x, timesteps, train=train)


def make_cfg_model_fn(model: MDM, params, guidance_scale: float, *, context=None, action=None):
    """Convenience: a guided `model_fn(x, t)` for the samplers.

    The unconditional branch uses a zero context / the conditional branch's
    setup with nulled payload (the reference's y['uncond']=True path,
    cfg_sampler.py:18-23). When guidance_scale == 1 this collapses to the
    plain conditional model (train_diffcloth.py:170-172 wraps only if != 1).
    """
    def cond_fn(x, t):
        return model.apply(params, x, t, context=context, action=action)

    if guidance_scale == 1.0:
        return cond_fn

    if model.cond_mode in ("text", "sketch", "img"):
        # Single batched pass: stack [context, zeros] along batch.
        def guided(x, t):
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            ctx2 = jnp.concatenate([context, jnp.zeros_like(context)], axis=0)
            out = model.apply(params, x2, t2, context=ctx2)
            out_cond, out_uncond = jnp.split(out, 2, axis=0)
            return out_uncond + guidance_scale * (out_cond - out_uncond)

        return guided

    if model.cond_mode == "category":
        # Single batched pass: stack [action, null_action] along batch.
        def guided(x, t):
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            a2 = jnp.concatenate(
                [action, jnp.full_like(action, model.null_action)], axis=0
            )
            out = model.apply(params, x2, t2, action=a2)
            out_cond, out_uncond = jnp.split(out, 2, axis=0)
            return out_uncond + guidance_scale * (out_cond - out_uncond)

        return guided

    return cond_fn
