"""Classifier half-UNet (`EncoderUNetModel`) for classifier guidance.

TPU-native counterpart of /root/reference/models/openaimodel.py:752-968: the
UNet's encoder trunk + middle block with a pooling classification head, the
model that guided-diffusion's classifier guidance (`cond_fn`, our
`diffusion/gaussian.py condition_mean/condition_score`) differentiates to
steer sampling toward a class. Dead code in the reference Surf-D configs, but
part of the lineage — implemented so the `cond_fn` hooks have a real model to
drive.

Reference quirks handled deliberately rather than copied:
  * with dims=1 the reference's "adaptive" head (`AdaptiveAvgPool2d((1,1))`,
    openaimodel.py:898) and the "spatial" heads (`h.mean(dim=(2, 3))`,
    :957-960) index 2-D spatial axes that a 1-D trunk does not have and
    crash; the intended semantics — pool over the spatial extent — is a mean
    over the length axis here.
  * "attention" pooling (`AttentionPool2d`, openaimodel.py:32-59) is the one
    head that works for dims=1 in the reference (its `reshape(b, c, -1)` is a
    no-op on 1-D); `AttentionPool1D` matches it numerically and is
    parity-tested against the real torch module (tests/test_reference_parity.py).

Layout is channel-last (B, L, C) like the rest of the package.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import GroupNorm32, conv1d, timestep_embedding, zeros_conv
from .unet1d import AttentionBlock1D, Downsample1D, ResBlock1D


class AttentionPool1D(nn.Module):
    """CLIP-style attention pooling (openaimodel.py:32-59, `AttentionPool2d`).

    Prepends the mean token, adds a learned positional embedding, runs one
    multi-head attention layer, and returns the output at the mean-token
    position. Unlike the trunk's `AttentionBlock1D` (QKVAttentionLegacy),
    the reference pool uses `QKVAttention` — qkv split BEFORE the head split
    (openaimodel.py:377-410) — which changes the fused-tensor layout, so the
    split is done here rather than through `layers.qkv_attention`.
    """

    seq_len: int  # trunk output length (positional table is seq_len + 1)
    num_head_channels: int
    output_dim: int

    @nn.compact
    def __call__(self, x):
        B, L, C = x.shape
        assert C % self.num_head_channels == 0, (
            f"pool width {C} not divisible by num_head_channels "
            f"{self.num_head_channels}"
        )
        num_heads = C // self.num_head_channels
        pos = self.param(
            "positional_embedding",
            lambda key, shape: jax.random.normal(key, shape) / C**0.5,
            (self.seq_len + 1, C),
        )
        x = jnp.concatenate([x.mean(axis=1, keepdims=True), x], axis=1)
        x = x + pos[None].astype(x.dtype)
        qkv = conv1d(3 * C, 1, name="qkv_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)  # non-legacy: qkv before heads
        hd = C // num_heads
        q = q.reshape(B, L + 1, num_heads, hd)
        k = k.reshape(B, L + 1, num_heads, hd)
        v = v.reshape(B, L + 1, num_heads, hd)
        scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.asarray(hd, jnp.float32)))
        logits = jnp.einsum("bthc,bshc->bhts", q * scale, k * scale)
        w = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(logits.dtype)
        out = jnp.einsum("bhts,bshc->bthc", w, v).reshape(B, L + 1, C)
        out = conv1d(self.output_dim, 1, name="c_proj")(out)
        return out[:, 0]


class EncoderUNet1D(nn.Module):
    """Half UNet (encoder + middle) with a pooled classification head.

    Parameter names mirror `UNet1D`'s encoder (`down_{level}_{i}`,
    `down_attn_{level}_{i}`, `downsample_{level}`, `mid_*`) so
    `utils.torch_convert.convert_encoder_unet` can share the block-numbering
    walk with `convert_mdm_unet`.
    """

    in_channels: int = 1
    model_channels: int = 224
    out_channels: int = 9  # class logits
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    conv_resample: bool = True
    num_heads: int = 8
    num_head_channels: int = -1  # required (>0) for pool="attention"
    dropout: float = 0.0
    use_scale_shift_norm: bool = False
    pool: str = "adaptive"  # adaptive | attention | spatial | spatial_v2
    # static trunk input length; only needed by pool="attention" to size the
    # positional table (the reference passes image_size, openaimodel.py:913)
    seq_len: Optional[int] = None
    use_remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps, train: bool = False):
        base = nn.remat(ResBlock1D) if self.use_remat else ResBlock1D

        def res_block(out_ch, *, name):
            return base(
                out_ch,
                use_scale_shift_norm=self.use_scale_shift_norm,
                dropout=self.dropout,
                deterministic=not train,
                name=name,
            )

        def heads_for(ch):
            # the reference forwards num_head_channels to the trunk's
            # AttentionBlocks as well (openaimodel.py:836-843, 305-310):
            # when set, head count scales with width instead of being fixed
            if self.num_head_channels > 0:
                return ch // self.num_head_channels
            return self.num_heads

        time_embed_dim = self.model_channels * 4
        emb = nn.Dense(time_embed_dim, name="time_embed_0")(
            timestep_embedding(timesteps, self.model_channels)
        )
        emb = nn.Dense(time_embed_dim, name="time_embed_2")(nn.silu(emb))

        h = x.astype(self.dtype)
        h = conv1d(self.model_channels, 3, name="in_conv")(h)
        spatial_feats = [h.astype(x.dtype).mean(axis=1)]
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                h = res_block(mult * self.model_channels, name=f"down_{level}_{i}")(h, emb)
                if ds in self.attention_resolutions:
                    h = AttentionBlock1D(
                        heads_for(h.shape[-1]), name=f"down_attn_{level}_{i}"
                    )(h)
                spatial_feats.append(h.astype(x.dtype).mean(axis=1))
            if level != len(self.channel_mult) - 1:
                h = Downsample1D(
                    h.shape[-1], self.conv_resample, name=f"downsample_{level}"
                )(h)
                spatial_feats.append(h.astype(x.dtype).mean(axis=1))
                ds *= 2
        ch = h.shape[-1]
        h = res_block(ch, name="mid_res_0")(h, emb)
        h = AttentionBlock1D(heads_for(ch), name="mid_attn")(h)
        h = res_block(ch, name="mid_res_1")(h, emb)
        spatial_feats.append(h.astype(x.dtype).mean(axis=1))

        if self.pool == "adaptive":
            h = nn.silu(GroupNorm32()(h)).mean(axis=1, keepdims=True)
            return zeros_conv(self.out_channels, 1, name="out_conv")(h)[:, 0]
        if self.pool == "attention":
            assert self.num_head_channels > 0 and self.seq_len is not None
            h = nn.silu(GroupNorm32()(h))
            # Downsample1D (k=3, s=2, SAME-style padding) yields ceil(L/2)
            # per level, so repeated ceil-halving — NOT seq_len // ds —
            # sizes the positional table for non-power-of-two seq_len.
            trunk_len = self.seq_len
            d = ds
            while d > 1:
                trunk_len = (trunk_len + 1) // 2
                d //= 2
            return AttentionPool1D(
                trunk_len, self.num_head_channels, self.out_channels, name="attn_pool"
            )(h)
        if self.pool in ("spatial", "spatial_v2"):
            h = jnp.concatenate(spatial_feats, axis=-1)
            h = nn.Dense(2048, name="out_0")(h)
            if self.pool == "spatial_v2":
                h = nn.silu(GroupNorm32()(h))
            else:
                h = nn.relu(h)
            return nn.Dense(self.out_channels, name="out_3")(h)
        raise NotImplementedError(f"unexpected pool {self.pool!r}")


def make_classifier_cond_fn(classifier_apply, y, scale: float = 1.0):
    """Classifier-guidance `cond_fn`: ∇_x log p(y | x_t, t) · scale.

    The guided-diffusion recipe (openai/guided-diffusion classifier_sample):
    differentiate the classifier's log-softmax at the target labels w.r.t.
    the noisy input. Plug the result into `diffusion.gaussian.p_sample_loop(
    ..., cond_fn=...)` — `condition_mean` shifts the posterior mean by
    Σ·gradient (gaussian.py:207-222).

    classifier_apply: (x, t) -> (B, num_classes) logits (params pre-bound).
    y: (B,) int32 target labels.
    """

    def cond_fn(x, t):
        def log_prob(xi):
            logits = classifier_apply(xi, t)
            logp = jax.nn.log_softmax(logits, axis=-1)
            return jnp.take_along_axis(logp, y[:, None], axis=-1).sum()

        return jax.grad(log_prob)(x) * scale

    return cond_fn
