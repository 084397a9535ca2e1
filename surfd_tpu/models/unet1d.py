"""1-D UNet denoiser (guided-diffusion lineage) in Flax.

TPU-native re-implementation of the reference `UNetModel` with `dims=1`
(/root/reference/models/openaimodel.py:413-749) at the Surf-D configuration
(/root/reference/models/mdm.py:34-57): in/out channels 1, model_channels 224,
2 res blocks/level, channel_mult (1,2,4,4), attention at downsample rates
{1,2,4}, 8 heads, conditioning context added to the time embedding through a
linear projection (openaimodel.py:512-514,731-735 — NOT cross-attention).

Layout is (B, L, C) channel-last. Gradient rematerialization is exposed via
`use_remat` (the reference's use_checkpoint, openaimodel.py:250-252) using
`nn.remat` so XLA re-computes activations in backward.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import GroupNorm32, conv1d, qkv_attention, timestep_embedding, zeros_conv


class ResBlock1D(nn.Module):
    """Residual block with additive timestep-embedding injection.

    Port of `ResBlock` (openaimodel.py:163-275) for dims=1 with
    use_scale_shift_norm=False (the Surf-D setting, mdm.py:50) plus the
    scale-shift variant for completeness.
    """

    out_channels: int
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    # reference openaimodel.py:228 nn.Dropout(p=dropout) between the SiLU and
    # the zeroed out-conv; 0.0 in the shipped Surf-D config (mdm.py:40) but the
    # training capability is part of the lineage.
    dropout: float = 0.0
    deterministic: bool = True

    @nn.compact
    def __call__(self, x, emb):
        in_ch = x.shape[-1]
        h = nn.silu(GroupNorm32()(x))
        if self.up:
            h = _nearest_upsample(h)
            x = _nearest_upsample(x)
        elif self.down:
            h = nn.avg_pool(h, (2,), (2,))
            x = nn.avg_pool(x, (2,), (2,))
        h = conv1d(self.out_channels, 3, name="in_conv")(h)

        emb_out = nn.Dense(
            2 * self.out_channels if self.use_scale_shift_norm else self.out_channels,
            name="emb_proj",
        )(nn.silu(emb))
        emb_out = emb_out[:, None, :]  # broadcast over length

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32()(h) * (1 + scale) + shift
            h = nn.silu(h)
        else:
            h = h + emb_out
            h = nn.silu(GroupNorm32()(h))
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout, deterministic=self.deterministic)(h)
        h = zeros_conv(self.out_channels, 3, name="out_conv")(h)

        if in_ch != self.out_channels:
            x = conv1d(self.out_channels, 1, name="skip")(x)
        return x + h


class AttentionBlock1D(nn.Module):
    """Self-attention over the length axis (openaimodel.py:278-324)."""

    num_heads: int = 8

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        h = GroupNorm32()(x)
        qkv = conv1d(3 * ch, 1, name="qkv")(h)
        h = qkv_attention(qkv, self.num_heads)
        h = zeros_conv(ch, 1, name="proj_out")(h)
        return x + h


def _nearest_upsample(x):
    return jnp.repeat(x, 2, axis=1)


class Downsample1D(nn.Module):
    out_channels: int
    use_conv: bool = True

    @nn.compact
    def __call__(self, x):
        if self.use_conv:
            # torch pads (1,1) for k=3/s=2 (openaimodel Downsample); flax
            # "SAME" would pad (0,1) for even lengths — a one-sample shift
            return nn.Conv(
                self.out_channels, kernel_size=(3,), strides=(2,),
                padding=((1, 1),), name="op",
            )(x)
        return nn.avg_pool(x, (2,), (2,))


class Upsample1D(nn.Module):
    out_channels: int
    use_conv: bool = True

    @nn.compact
    def __call__(self, x):
        x = _nearest_upsample(x)
        if self.use_conv:
            x = conv1d(self.out_channels, 3, name="conv")(x)
        return x


class UNet1D(nn.Module):
    """The full 1-D UNet (openaimodel.py:413-749, dims=1).

    Conditioning:
      * `timesteps` → sinusoidal embedding → 2-layer MLP (openaimodel.py:504-509)
      * `y` class labels → learned embedding added to emb (:510-511, 727-730)
      * `context` (CLIP 512-d) → linear `context_proj` added to emb
        (`sketch_emb`, :512-514, 731-735)
    """

    in_channels: int = 1
    model_channels: int = 224
    out_channels: int = 1
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    conv_resample: bool = True
    num_classes: Optional[int] = None
    # when set, this label_emb row is zero-initialized so the CFG uncond
    # branch matches the reference's zeroed-conditioning semantics even for
    # from-scratch checkpoints (cfg_sampler.py:18-23 zeroes the payload)
    null_class: Optional[int] = None
    num_heads: int = 8
    dropout: float = 0.0
    use_scale_shift_norm: bool = False
    context_dim: Optional[int] = 512
    # LDM cross-attention path (reference openaimodel.py use_spatial_transformer;
    # OFF in the shipped Surf-D config, mdm.py:53)
    use_spatial_transformer: bool = False
    transformer_depth: int = 1
    use_remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps, context=None, y=None, train: bool = False):
        assert (y is not None) == (self.num_classes is not None), (
            "must specify y iff the model is class-conditional"
        )
        base = ResBlock1D
        if self.use_remat:
            base = nn.remat(ResBlock1D)

        def res_block(out_ch, *, name):
            return base(
                out_ch,
                use_scale_shift_norm=self.use_scale_shift_norm,
                dropout=self.dropout,
                deterministic=not train,
                name=name,
            )

        time_embed_dim = self.model_channels * 4
        t_emb = timestep_embedding(timesteps, self.model_channels)
        emb = nn.Dense(time_embed_dim, name="time_embed_0")(t_emb)
        emb = nn.Dense(time_embed_dim, name="time_embed_2")(nn.silu(emb))

        ctx_seq = None
        if self.num_classes is not None:
            embed_init = nn.initializers.normal(stddev=1.0)  # torch nn.Embedding default
            if self.null_class is not None:
                base_init, null_class = embed_init, self.null_class

                def embed_init(key, shape, dtype=jnp.float32):
                    return base_init(key, shape, dtype).at[null_class].set(0.0)

            emb = emb + nn.Embed(
                self.num_classes, time_embed_dim, embedding_init=embed_init,
                name="label_emb",
            )(y)
        if context is not None:
            if self.use_spatial_transformer:
                # cross-attention context: (B, T, C)
                ctx_seq = context if context.ndim == 3 else context[:, None, :]
            else:
                # additive injection into the time embedding
                # (openaimodel.py:512-514, 731-735)
                emb = emb + nn.Dense(time_embed_dim, name="context_proj")(context)

        def attn(h, name):
            if self.use_spatial_transformer:
                from .attention import SpatialTransformer1D

                return SpatialTransformer1D(
                    h.shape[-1], self.num_heads, self.transformer_depth,
                    self.context_dim, name=name,
                )(h, context=ctx_seq)
            return AttentionBlock1D(self.num_heads, name=name)(h)

        h = x.astype(self.dtype)
        h = conv1d(self.model_channels, 3, name="in_conv")(h)
        hs = [h]
        ds = 1
        # --- encoder ---
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                h = res_block(mult * self.model_channels, name=f"down_{level}_{i}")(h, emb)
                if ds in self.attention_resolutions:
                    h = attn(h, f"down_attn_{level}_{i}")
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                h = Downsample1D(h.shape[-1], self.conv_resample, name=f"downsample_{level}")(h)
                hs.append(h)
                ds *= 2
        # --- middle ---
        ch = h.shape[-1]
        h = res_block(ch, name="mid_res_0")(h, emb)
        h = attn(h, "mid_attn")
        h = res_block(ch, name="mid_res_1")(h, emb)
        # --- decoder ---
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = res_block(mult * self.model_channels, name=f"up_{level}_{i}")(h, emb)
                if ds in self.attention_resolutions:
                    h = attn(h, f"up_attn_{level}_{i}")
                if level and i == self.num_res_blocks:
                    h = Upsample1D(h.shape[-1], self.conv_resample, name=f"upsample_{level}")(h)
                    ds //= 2

        h = h.astype(x.dtype)
        h = nn.silu(GroupNorm32()(h))
        return zeros_conv(self.out_channels, 3, name="out_conv")(h)
