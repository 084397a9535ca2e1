"""Shared NN building blocks for the denoiser.

TPU-native counterparts of /root/reference/diffusion/nn.py. Layout is
channel-last (B, L, C) throughout — XLA's preferred layout — vs the
reference's channel-first torch convention.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: float = 10000.0):
    """Sinusoidal timestep embeddings, [cos | sin] order.

    Matches reference `timestep_embedding` (/root/reference/diffusion/nn.py:110-128).
    """
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class GroupNorm32(nn.Module):
    """32-group GroupNorm computed in float32 (reference nn.py:15-20,100-108)."""

    num_groups: int = 32

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        # reference always uses 32 groups (channels ≥ 32 there); shrink to a
        # divisor for narrow test configurations
        groups = self.num_groups
        while x.shape[-1] % groups != 0:
            groups //= 2
        y = nn.GroupNorm(num_groups=groups, epsilon=1e-5, dtype=jnp.float32)(
            x.astype(jnp.float32)
        )
        return y.astype(orig_dtype)


def zeros_conv(features: int, kernel_size: int, name: str | None = None) -> nn.Conv:
    """Conv1d whose weights AND bias start at zero (`zero_module`, nn.py:74-80)."""
    return nn.Conv(
        features,
        kernel_size=(kernel_size,),
        padding="SAME",
        kernel_init=nn.initializers.zeros,
        bias_init=nn.initializers.zeros,
        name=name,
    )


def conv1d(features: int, kernel_size: int = 3, stride: int = 1, name: str | None = None):
    return nn.Conv(
        features, kernel_size=(kernel_size,), strides=(stride,), padding="SAME", name=name
    )


def qkv_attention(qkv: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """Multi-head self-attention on a fused (B, T, 3*H*C) tensor.

    Port of `QKVAttentionLegacy` (/root/reference/models/openaimodel.py:347-372):
    heads split before qkv split; the 1/sqrt(sqrt(d)) scale is applied to both
    q and k for fp16 stability; softmax in fp32. Sequence length here is ≤64
    (the diffusion latent), so a flash-style kernel is unnecessary — XLA fuses
    this into a handful of MXU ops.
    """
    B, T, W = qkv.shape
    assert W % (3 * num_heads) == 0
    ch = W // (3 * num_heads)
    qkv = qkv.reshape(B, T, num_heads, 3 * ch)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    scale = 1.0 / math.sqrt(math.sqrt(ch))
    logits = jnp.einsum("bthc,bshc->bhts", q * scale, k * scale)
    weights = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(logits.dtype)
    out = jnp.einsum("bhts,bshc->bthc", weights, v)
    return out.reshape(B, T, num_heads * ch)
