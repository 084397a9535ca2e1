"""Fused UDF-decoder grid evaluation (folded MLP + Pallas TPU kernel).

The hot inference op (SURVEY.md §6: up to 1.34e8 decoder evaluations per 512³
extraction; reference loop at /root/reference/meshudf/meshudf.py:123-206 with
the CBN decoder /root/reference/AutoEncoder/models/cbndec.py:106-134).

Key observation: at inference every ConditionalBatchNorm is an affine with
constants — running BN stats plus the latent-conditioned γ/β — so for a FIXED
latent the whole decoder folds into:

    x₀ = posenc(p) @ W_in + b_in
    for each block: x ← x + W₂ᵀ·relu(a₂⊙(W₁ᵀ·relu(a₁⊙x + c₁) + b₁) + c₂)
    udf = (1 − σ(w_outᵀ·relu(a_out⊙x + c_out) + b_out)) · max_dist

`fold_decoder` precomputes the affine vectors once per latent; the Pallas
kernel then streams point tiles from HBM while all weights (≈2.9 M params)
stay resident in VMEM across the whole grid — one kernel, no intermediate
HBM round trips. Matmuls run on the MXU in bf16 with f32 accumulation
(`preferred_element_type`); the positional encoding is computed in f32 (sin
at frequency 2⁹ needs full input precision).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
    (decoder.py CoordsEncoder parity).

    Frequencies are STATIC python floats (a traced linspace would lower to an
    f32 iota, which Mosaic rejects inside Pallas kernels)."""
    freqs = [
        float(2.0 ** (max_freq_log2 * i / (num_freqs - 1))) for i in range(num_freqs)
    ]
    parts = [pts]
    for f in freqs:
        parts.append(jnp.sin(pts * f))
        parts.append(jnp.cos(pts * f))
    return jnp.concatenate(parts, axis=-1)


def folded_udf(folded: FoldedDecoder, pts: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Plain-XLA folded evaluation (the baseline the kernel must beat)."""
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


def _decoder_kernel(
    # inputs
    pts_ref,      # (T, 3) f32 point tile (VMEM, pipelined per grid step)
    win_ref,      # (64, H) bf16 in HBM (63 zero-padded to the sublane size)
    bin_ref,      # (1, H) f32 VMEM
    aff_ref,      # (6, L, H) f32 VMEM: a1, c1, b1, a2, c2, b2 stacked
    w1_ref,       # (L, H, H) bf16 HBM
    w2_ref,       # (L, H, H) bf16 HBM
    aout_ref, cout_ref,  # (1, H) f32 VMEM
    wout_ref,     # (H, 128) bf16 VMEM (col 0 real)
    scal_ref,     # (1, 2) f32 SMEM: [b_out, max_dist]
    # outputs
    out_ref,      # (T,) f32
    # scratch (persists across grid steps)
    win_s,        # (64, H) bf16 VMEM
    w1_s,         # (L, H, H) bf16 VMEM
    w2_s,         # (L, H, H) bf16 VMEM
    sem,          # DMA semaphores (3,)
):
    L = w1_s.shape[0]

    # Copy all weights HBM→VMEM ONCE; scratch persists across the grid, so
    # every later tile reuses the resident copies (the v1 kernel re-DMA'd
    # 5.8 MB of weights per 1024-point tile and ran 2× slower than XLA).
    @pl.when(pl.program_id(0) == 0)
    def _():
        pltpu.make_async_copy(win_ref, win_s, sem.at[0]).start()
        pltpu.make_async_copy(w1_ref, w1_s, sem.at[1]).start()
        pltpu.make_async_copy(w2_ref, w2_s, sem.at[2]).start()
        pltpu.make_async_copy(win_ref, win_s, sem.at[0]).wait()
        pltpu.make_async_copy(w1_ref, w1_s, sem.at[1]).wait()
        pltpu.make_async_copy(w2_ref, w2_s, sem.at[2]).wait()

    pts = pts_ref[:]  # (T, 3) f32
    emb = posenc_f32(pts)  # (T, 63) f32 on the VPU
    emb = jnp.pad(emb, ((0, 0), (0, 1)))  # → (T, 64) matching win padding
    x = (
        jnp.dot(emb.astype(jnp.bfloat16), win_s[:], preferred_element_type=jnp.float32)
        + bin_ref[:]
    )

    # statically unrolled layer loop: dynamic (L, H, H) slicing would force
    # per-iteration VMEM copies and defeat Mosaic's scheduling
    for i in range(L):
        h = jnp.maximum(x * aff_ref[0, i] + aff_ref[1, i], 0.0)
        h = jnp.dot(h.astype(jnp.bfloat16), w1_s[i], preferred_element_type=jnp.float32)
        h = h + aff_ref[2, i]
        h = jnp.maximum(h * aff_ref[3, i] + aff_ref[4, i], 0.0)
        dx = jnp.dot(h.astype(jnp.bfloat16), w2_s[i], preferred_element_type=jnp.float32)
        x = x + dx + aff_ref[5, i]
    h = jnp.maximum(x * aout_ref[:] + cout_ref[:], 0.0)
    logit = jnp.dot(h.astype(jnp.bfloat16), wout_ref[:], preferred_element_type=jnp.float32)
    logit = logit[:, 0] + scal_ref[0, 0]
    out_ref[:] = (1.0 - jax.nn.sigmoid(logit)) * scal_ref[0, 1]


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def pallas_folded_udf(
    folded: FoldedDecoder, pts: jnp.ndarray, tile: int = 1024, interpret: bool = False
):
    """Pallas evaluation: weights copied to VMEM once, point tiles streamed.

    pts: (P, 3) with P a multiple of `tile`. Weights are bf16 (≈5.3 MB VMEM
    scratch for the 512×5 configuration); matmuls accumulate in f32.
    `interpret=True` runs the kernel in the Pallas interpreter (CPU tests).

    Measured on TPU v5e (scripts/bench_decoder_eval.py, 4.19M points,
    512×5 decoder): 13.3 Mpts/s vs 23.7 Mpts/s for the pure-bf16 XLA
    `folded_udf` and 17.4 Mpts/s for the f32 `decoder.apply` path — the
    workload is VPU-bound (affine/relu chain between matmuls), which XLA
    overlaps across large blocks better than this kernel's per-tile serial
    schedule. The XLA path therefore remains the pipeline default; the
    kernel is kept as the VMEM-resident-weights reference implementation.
    """
    P = pts.shape[0]
    assert P % tile == 0, f"P={P} must be a multiple of tile={tile}"
    H = folded.w_in.shape[1]
    L = folded.w1.shape[0]
    bf = lambda a: a.astype(jnp.bfloat16)
    f32row = lambda a: a.astype(jnp.float32).reshape(1, H)

    win = jnp.zeros((64, H), jnp.bfloat16).at[:63].set(bf(folded.w_in))
    wout = jnp.zeros((H, 128), jnp.bfloat16).at[:, 0].set(bf(folded.w_out[:, 0]))
    aff = jnp.stack(
        [folded.a1, folded.c1, folded.b1, folded.a2, folded.c2, folded.b2]
    ).astype(jnp.float32)  # (6, L, H)
    scal = jnp.stack(
        [folded.b_out.reshape(()).astype(jnp.float32), jnp.float32(folded.max_dist)]
    ).reshape(1, 2)

    grid = (P // tile,)
    kw = {"interpret": True} if interpret else {}
    vmem_const = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    hbm_const = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pl.ANY
    )
    out = pl.pallas_call(
        _decoder_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            hbm_const((64, H)),
            vmem_const((1, H)),
            vmem_const((6, L, H)),
            hbm_const((L, H, H)),
            hbm_const((L, H, H)),
            vmem_const((1, H)), vmem_const((1, H)),
            vmem_const((H, 128)),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P,), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((64, H), jnp.bfloat16),
            pltpu.VMEM((L, H, H), jnp.bfloat16),
            pltpu.VMEM((L, H, H), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # weight scratch (2×L·H² bf16 ≈ 5.2 MB) + f32 activation buffers
            # for the unrolled layer loop exceed the 16 MB scoped default at
            # tile ≥ 1024; the chip has 128 MB VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        **kw,
    )(
        pts.astype(jnp.float32),
        win,
        f32row(folded.b_in),
        aff,
        bf(folded.w1),
        bf(folded.w2),
        f32row(folded.a_out), f32row(folded.c_out),
        wout,
        scal,
    )
    return out


def make_fused_udf_fn(decoder_vars, latent, max_dist: float = 0.1, tile: int = 1024, use_pallas: bool = True):
    """Drop-in udf_fn closure built on the folded decoder.

    Same contract as pipelines.make_udf_fn (udf_fn + .grad_fn + .below_fn)
    so get_mesh_from_udf can consume it directly.
    """
    folded = fold_decoder(decoder_vars, jnp.asarray(latent), max_dist)

    if use_pallas:
        base = lambda pts: pallas_folded_udf(folded, pts, tile=tile)
    else:
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
        return (pallas_folded_udf(folded, pts, tile=tile) <= thr).astype(jnp.uint8) if use_pallas else (
            folded_udf(folded, pts) <= thr
        ).astype(jnp.uint8)

    udf_fn = lambda pts: base(pts)
    udf_fn.grad_fn = grad_fn
    udf_fn.below_fn = lambda pts, thr: below_fn_impl(pts, jnp.float32(thr))
    udf_fn.folded = folded
    return udf_fn
