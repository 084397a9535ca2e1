"""Fused UDF-decoder grid evaluation (inference-folded MLP).

The hot inference op (SURVEY.md §6: up to 1.34e8 decoder evaluations per 512³
extraction; reference loop at /root/reference/meshudf/meshudf.py:123-206 with
the CBN decoder /root/reference/AutoEncoder/models/cbndec.py:106-134).

Key observation: at inference every ConditionalBatchNorm is an affine with
constants — running BN stats plus the latent-conditioned γ/β — so for a FIXED
latent the whole decoder folds into:

    x₀ = posenc(p) @ W_in + b_in
    for each block: x ← x + W₂ᵀ·relu(a₂⊙(W₁ᵀ·relu(a₁⊙x + c₁) + b₁) + c₂)
    udf = (1 − σ(w_outᵀ·relu(a_out⊙x + c_out) + b_out)) · max_dist

`fold_decoder` precomputes the affine vectors once per latent; `folded_udf`
evaluates the folded MLP with bf16 MXU matmuls (f32 accumulation via
`preferred_element_type`); the positional encoding is computed in f32 (sin at
frequency 2⁹ needs full input precision).

Pallas retirement record (VERDICT r3 next #7 — "make it win or retire it").
A hand-written Pallas kernel for this op (weights DMA'd to VMEM once and held
resident across the point-tile grid; statically unrolled layer loop) was
built, profiled, and retired after two optimization rounds, because plain XLA
is faster on every configuration tried:

    round 3 (lightly loaded v5e, 4.19M pts): XLA bf16 23.7 Mpts/s,
      XLA f32 17.4, Pallas v1 13.3
    round 4 (same-session sweep, 0.52M pts, co-tenant load): XLA bf16 12.0,
      XLA f32 9.9, Pallas v1 7.7-8.3, Pallas v2 with 2-4 interleaved
      point-streams (ILP across the MXU/VPU boundary) 8.5-8.8, v2 with a
      bf16 affine/relu chain 8.5-8.6 — every variant below the XLA floor.

Why XLA wins here: the folded chain is 11 back-to-back (T,512)x(512,512)
matmuls with elementwise affines between them. XLA fuses each affine into the
adjacent matmul and software-pipelines HBM point-tile fetches against MXU
work across *large* blocks; the kernel's per-tile schedule (even with
multi-stream ILP) cannot beat that, and the weights (5.2 MB bf16) already fit
in cache-resident VMEM under XLA's own tiling — the "weights resident in
VMEM" advantage the kernel was built for is one XLA already has at this size.
The sweep harness lives in scripts/bench_decoder_eval.py. The v1 kernel and
the interpret-mode Pallas attention kernel survive in git history before the
retirement commit; v2 (a v1 fork whose tile is split into `streams`
sub-batches with the 11-matmul chains emitted interleaved, optionally with
the affine/relu chain in bf16) was a working-tree experiment recorded by the
numbers above.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class FoldedDecoder(NamedTuple):
    """Inference-folded decoder weights for one latent (pytree)."""

    w_in: jnp.ndarray  # (63, H)
    b_in: jnp.ndarray  # (H,)
    # per block, stacked on axis 0: (L, H) affines and (L, H, H) weights
    a1: jnp.ndarray
    c1: jnp.ndarray
    w1: jnp.ndarray
    b1: jnp.ndarray
    a2: jnp.ndarray
    c2: jnp.ndarray
    w2: jnp.ndarray
    b2: jnp.ndarray
    a_out: jnp.ndarray  # (H,)
    c_out: jnp.ndarray  # (H,)
    w_out: jnp.ndarray  # (H, 1)
    b_out: jnp.ndarray  # (1,)
    max_dist: float


def _fold_cbn(cbn_params, cbn_stats, latent, eps=1e-5):
    """ConditionalBatchNorm → (a, c) with y = a⊙x + c (cbndec.py:68-82)."""
    gamma = latent @ cbn_params["gamma"]["kernel"] + cbn_params["gamma"]["bias"]
    beta = latent @ cbn_params["beta"]["kernel"] + cbn_params["beta"]["bias"]
    mean = cbn_stats["bn"]["mean"]
    var = cbn_stats["bn"]["var"]
    inv = gamma / jnp.sqrt(var + eps)
    return inv, beta - mean * inv


def fold_decoder(decoder_vars, latent: jnp.ndarray, max_dist: float = 0.1) -> FoldedDecoder:
    """Fold CbnDecoder variables + one latent (D,) into a plain MLP."""
    p = decoder_vars["params"]
    s = decoder_vars["batch_stats"]
    lat = latent.reshape(1, -1)

    blocks = sorted(k for k in p if k.startswith("block_"))
    a1, c1, w1, b1, a2, c2, w2, b2 = [], [], [], [], [], [], [], []
    for k in blocks:
        A1, C1 = _fold_cbn(p[k]["bn_0"], s[k]["bn_0"], lat)
        A2, C2 = _fold_cbn(p[k]["bn_1"], s[k]["bn_1"], lat)
        a1.append(A1[0]); c1.append(C1[0])
        a2.append(A2[0]); c2.append(C2[0])
        w1.append(p[k]["fc_0"]["kernel"]); b1.append(p[k]["fc_0"]["bias"])
        w2.append(p[k]["fc_1"]["kernel"]); b2.append(p[k]["fc_1"]["bias"])
    AO, CO = _fold_cbn(p["bn_out"], s["bn_out"], lat)
    return FoldedDecoder(
        w_in=p["fc_p"]["kernel"],
        b_in=p["fc_p"]["bias"],
        a1=jnp.stack(a1), c1=jnp.stack(c1),
        w1=jnp.stack(w1), b1=jnp.stack(b1),
        a2=jnp.stack(a2), c2=jnp.stack(c2),
        w2=jnp.stack(w2), b2=jnp.stack(b2),
        a_out=AO[0], c_out=CO[0],
        w_out=p["fc_out"]["kernel"], b_out=p["fc_out"]["bias"],
        max_dist=max_dist,
    )


def posenc_f32(pts: jnp.ndarray, num_freqs: int = 10, max_freq_log2: int = 9):
    """NeRF positional encoding, [x, sin(f·x), cos(f·x), ...] order
    (decoder.py CoordsEncoder parity). Frequencies are static python floats."""
    freqs = [
        float(2.0 ** (max_freq_log2 * i / (num_freqs - 1))) for i in range(num_freqs)
    ]
    parts = [pts]
    for f in freqs:
        parts.append(jnp.sin(pts * f))
        parts.append(jnp.cos(pts * f))
    return jnp.concatenate(parts, axis=-1)


def folded_udf(folded: FoldedDecoder, pts: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Folded evaluation — the production grid-fill path (bf16 default)."""
    L = folded.w1.shape[0]
    x = posenc_f32(pts).astype(dtype) @ folded.w_in.astype(dtype) + folded.b_in.astype(dtype)
    for i in range(L):
        h = jax.nn.relu(x * folded.a1[i].astype(dtype) + folded.c1[i].astype(dtype))
        h = h @ folded.w1[i].astype(dtype) + folded.b1[i].astype(dtype)
        h = jax.nn.relu(h * folded.a2[i].astype(dtype) + folded.c2[i].astype(dtype))
        x = x + (h @ folded.w2[i].astype(dtype) + folded.b2[i].astype(dtype))
    h = jax.nn.relu(x * folded.a_out.astype(dtype) + folded.c_out.astype(dtype))
    logit = (h.astype(jnp.float32) @ folded.w_out + folded.b_out)[..., 0]
    return (1.0 - jax.nn.sigmoid(logit)) * folded.max_dist


def folded_udf_mixed(folded: FoldedDecoder, pts: jnp.ndarray) -> jnp.ndarray:
    """Folded evaluation, MXU-bf16 / VPU-f32 mix (the Pallas kernel's math):
    matmul inputs cast to bf16 with f32 accumulation, the affine/relu chain
    kept in f32. Max |err| vs the f32 path ≈ 6e-4·max_dist — the accuracy of
    the residual stream is set by the f32 accumulators, not the bf16 weights."""
    bf = jnp.bfloat16
    mm = lambda a, w: jax.lax.dot(
        a.astype(bf), w.astype(bf), preferred_element_type=jnp.float32
    )
    L = folded.w1.shape[0]
    x = mm(posenc_f32(pts), folded.w_in) + folded.b_in
    for i in range(L):
        h = jax.nn.relu(x * folded.a1[i] + folded.c1[i])
        h = mm(h, folded.w1[i]) + folded.b1[i]
        h = jax.nn.relu(h * folded.a2[i] + folded.c2[i])
        x = x + mm(h, folded.w2[i]) + folded.b2[i]
    h = jax.nn.relu(x * folded.a_out + folded.c_out)
    logit = (mm(h, folded.w_out) )[..., 0] + folded.b_out[0]
    return (1.0 - jax.nn.sigmoid(logit)) * folded.max_dist


def make_fused_udf_fn(decoder_vars, latent, max_dist: float = 0.1):
    """Drop-in udf_fn closure built on the folded decoder.

    Same contract as pipelines.make_udf_fn (udf_fn + .grad_fn + .below_fn)
    so get_mesh_from_udf can consume it directly.
    """
    folded = fold_decoder(decoder_vars, jnp.asarray(latent), max_dist)
    base = jax.jit(lambda pts: folded_udf(folded, pts))

    # Gradient via the XLA folded path (f32 weights for accuracy; the sign of
    # ∂udf is what marching consumes).
    @jax.jit
    def grad_fn(pts):
        f = lambda p: folded_udf(folded, p, dtype=jnp.float32)
        _, vjp = jax.vjp(f, pts)
        (g,) = vjp(jnp.ones(pts.shape[:-1], pts.dtype))
        return g

    @jax.jit
    def below_fn_impl(pts, thr):
        return (folded_udf(folded, pts) <= thr).astype(jnp.uint8)

    udf_fn = lambda pts: base(pts)
    udf_fn.grad_fn = grad_fn
    udf_fn.below_fn = lambda pts, thr: below_fn_impl(pts, jnp.float32(thr))
    udf_fn.folded = folded
    return udf_fn
