"""Fused multi-head self-attention Pallas kernel for the denoiser.

The north-star plan names a fused attention kernel for the MDM denoiser
(BASELINE.json; SURVEY.md §7 "attention over ≤64 tokens via a fused Pallas
attention kernel"). The diffusion latent is 32/64 tokens, so this is a
single-tile fused softmax-attention: one kernel computes QK^T, the f32
softmax, and the value contraction without materializing logits in HBM.
For these lengths XLA's fusion is already near-optimal — the kernel exists
for the capability and for larger-context variants; `fused_qkv_attention`
falls back to the XLA path off-TPU. NOTE: the MDM default head dim is 28
(224ch/8), which this environment's Mosaic build rejects (non-128-aligned
minor dims); the denoiser therefore uses the XLA attention by default and
this kernel targets 128-aligned head dims.

Semantics match models/layers.qkv_attention (QKVAttentionLegacy port:
heads-major fused qkv, 1/sqrt(sqrt(d)) scaling on both q and k).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.layers import qkv_attention as _xla_qkv_attention


def _attn_kernel(qkv_ref, out_ref, *, num_heads: int, ch: int, scale: float):
    # qkv_ref: (1, T, H*3c) one batch element; out: (1, T, H*c)
    T = qkv_ref.shape[1]
    qkv = qkv_ref[0].reshape(T, num_heads, 3 * ch)
    q = qkv[:, :, :ch] * scale
    k = qkv[:, :, ch : 2 * ch] * scale
    v = qkv[:, :, 2 * ch :]
    logits = jnp.einsum(
        "thc,shc->hts", q, k, preferred_element_type=jnp.float32
    )
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "hts,shc->thc", weights.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = out.reshape(T, num_heads * ch).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def pallas_qkv_attention(qkv: jnp.ndarray, num_heads: int, interpret: bool = False) -> jnp.ndarray:
    """(B, T, 3·H·c) fused qkv → (B, T, H·c), one grid step per batch element."""
    B, T, W = qkv.shape
    assert W % (3 * num_heads) == 0
    ch = W // (3 * num_heads)
    scale = 1.0 / math.sqrt(math.sqrt(ch))
    out_w = num_heads * ch
    return pl.pallas_call(
        functools.partial(_attn_kernel, num_heads=num_heads, ch=ch, scale=scale),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, T, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, T, out_w), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, out_w), qkv.dtype),
        interpret=interpret,
    )(qkv)


def fused_qkv_attention(qkv: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """Dispatch: Pallas on TPU, XLA reference elsewhere (CPU tests)."""
    if jax.default_backend() in ("tpu", "axon"):
        try:
            return pallas_qkv_attention(qkv, num_heads)
        except Exception:
            pass
    return _xla_qkv_attention(qkv, num_heads)
