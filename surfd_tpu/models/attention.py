"""LDM-style transformer blocks: cross-attention conditioning path.

Re-implementation of /root/reference/modules/attention.py:37-260
(`CrossAttention`, `BasicTransformerBlock`, `SpatialTransformer`, GEGLU,
FeedForward, LinearAttention). In the shipped Surf-D config this path is OFF
(`use_spatial_transformer=False`, models/mdm.py:53 — context enters through
the time embedding instead), but the capability is part of the framework:
`UNet1D(use_spatial_transformer=True)` routes context through these blocks.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .layers import GroupNorm32


class GEGLU(nn.Module):
    """x·W1 ⊙ gelu(x·W2) gated feed-forward input (attention.py:37-46)."""

    dim_out: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_out * 2, name="proj")(x)
        a, gate = jnp.split(h, 2, axis=-1)
        return a * nn.gelu(gate)


class FeedForward(nn.Module):
    """Transformer MLP with optional GEGLU gate (attention.py:49-64)."""

    dim: int
    mult: int = 4
    glu: bool = True

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        if self.glu:
            h = GEGLU(inner, name="geglu")(x)
        else:
            h = nn.gelu(nn.Dense(inner, name="fc_in")(x))
        return nn.Dense(self.dim, name="fc_out")(h)


class CrossAttention(nn.Module):
    """Multi-head attention with an optional external context
    (attention.py:152-193). context=None → self-attention."""

    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64

    @nn.compact
    def __call__(self, x, context=None):
        inner = self.heads * self.dim_head
        context = x if context is None else context
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, name="to_v")(context)

        B, Tq, _ = q.shape
        Tk = k.shape[1]
        q = q.reshape(B, Tq, self.heads, self.dim_head)
        k = k.reshape(B, Tk, self.heads, self.dim_head)
        v = v.reshape(B, Tk, self.heads, self.dim_head)
        scale = self.dim_head**-0.5
        logits = jnp.einsum("bthc,bshc->bhts", q * scale, k)
        weights = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(logits.dtype)
        out = jnp.einsum("bhts,bshc->bthc", weights, v).reshape(B, Tq, inner)
        return nn.Dense(self.query_dim, name="to_out")(out)


class BasicTransformerBlock(nn.Module):
    """self-attn → cross-attn → FF, pre-LN residuals (attention.py:196-215)."""

    dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64

    @nn.compact
    def __call__(self, x, context=None):
        x = x + CrossAttention(
            self.dim, heads=self.heads, dim_head=self.dim_head, name="attn1"
        )(nn.LayerNorm(name="norm1")(x))
        x = x + CrossAttention(
            self.dim, self.context_dim, self.heads, self.dim_head, name="attn2"
        )(nn.LayerNorm(name="norm2")(x), context=context)
        x = x + FeedForward(self.dim, name="ff")(nn.LayerNorm(name="norm3")(x))
        return x


class SpatialTransformer1D(nn.Module):
    """GroupNorm → 1×1 proj → transformer blocks → 1×1 zero-init proj +
    residual, over the length axis (attention.py:218-260, dims=1)."""

    channels: int
    heads: int = 8
    depth: int = 1
    context_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, context=None):
        # x: (B, L, C)
        h = GroupNorm32()(x)
        h = nn.Dense(self.channels, name="proj_in")(h)
        dim_head = self.channels // self.heads
        for i in range(self.depth):
            h = BasicTransformerBlock(
                self.channels, self.context_dim, self.heads, dim_head, name=f"block_{i}"
            )(h, context=context)
        h = nn.Dense(
            self.channels,
            kernel_init=nn.initializers.zeros,
            name="proj_out",
        )(h)
        return x + h


class LinearAttention(nn.Module):
    """Softmax-free linear attention variant (attention.py:80-99)."""

    channels: int
    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x):
        B, L, C = x.shape
        inner = self.heads * self.dim_head
        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv.reshape(B, L, self.heads, 3 * self.dim_head), 3, axis=-1)
        k = nn.softmax(k, axis=1)
        ctx = jnp.einsum("blhd,blhe->bhde", k, v)
        out = jnp.einsum("bhde,blhd->blhe", ctx, q).reshape(B, L, inner)
        return nn.Dense(C, name="to_out")(out)
