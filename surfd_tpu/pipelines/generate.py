"""End-to-end generation pipeline: latent → UDF grid → mesh → cleanup.

Re-design of the reference sampling skeleton shared by all five generate
scripts (/root/reference/sample/generate_*.py, SURVEY.md §2.8) and
`get_mesh_from_udf` (/root/reference/meshudf/meshudf.py:307-514).

Split of labor:
  * TPU: latent diffusion sampling (one scan) + all UDF/gradient grid
    evaluations (block-sparse, fixed-shape batches).
  * Host: marching tetrahedra + mesh cleanup (memory-bound numpy passes).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import Schedule, p_sample_loop
from ..geometry import (
    GridFiller,
    Mesh,
    eval_in_chunks,
    eval_in_chunks_async,
    filter_small_components,
    laplacian_smooth,
    make_grad_fn,
    marching_tetrahedra,
    marching_tetrahedra_udf,
    merge_duplicate_vertices,
    smooth_borders,
    stabilize,
)
from ..models.decoder import CbnDecoder, CoordsEncoder, udf_from_logits


def make_udf_fn(
    decoder: CbnDecoder,
    decoder_vars,
    latent: jnp.ndarray,
    coords_encoder: Optional[CoordsEncoder] = None,
    max_dist: float = 0.1,
) -> Callable:
    """Jitted (P, 3) → (P,) UDF closure for ONE latent code.

    Mirrors the udf_func closure (sample/generate_uncond.py:96-101):
    sigmoid → 1−p → ×max_dist. The latent is an explicit jit argument (large
    closures would be embedded as HLO constants).
    """
    del coords_encoder  # the standard NeRF encoding is part of the cached fns
    # Params/latent are explicit jit ARGUMENTS (closed-over arrays would be
    # embedded as HLO constants — minutes of remote compile per latent), and
    # the traced callables are cached PER DECODER so binding a new latent
    # reuses the same compiled executables (`.stable` protocol consumed by
    # geometry.eval_in_chunks).
    dvars = jax.tree.map(jnp.asarray, decoder_vars)
    lat = jnp.asarray(latent)
    (
        udf_base, below_base, grad_base, jits, udf_u16_base, grad_i8_base,
        below_packed_base, below_packed_q16_base, grad_i8_gid_base_for,
        below2t_packed_q16_base, jit_bf16_err, biased_q16_bases_for,
    ) = _decoder_eval_fns(decoder, float(max_dist))
    jit_udf, jit_below, jit_grad = jits

    args = (dvars, lat)
    udf_fn = lambda pts: jit_udf(args, pts)
    udf_fn.stable = (udf_base, args)
    udf_fn.max_dist = float(max_dist)

    grad_fn = lambda pts: jit_grad(args, pts)
    grad_fn.stable = (grad_base, args)
    udf_fn.grad_fn = grad_fn

    u16_fn = lambda pts: udf_u16_base(args, pts)
    u16_fn.stable = (udf_u16_base, args)
    udf_fn.u16_fn = u16_fn

    gi8_fn = lambda pts: grad_i8_base(args, pts)
    gi8_fn.stable = (grad_i8_base, args)
    udf_fn.grad_i8_fn = gi8_fn

    # Bound thresholds are cached: jnp.float32(thr) is a host→device scalar
    # transfer that costs a full tunnel round trip per call otherwise.
    _thr_cache: dict = {}

    def _bargs(thr):
        key = float(thr)
        if key not in _thr_cache:
            _thr_cache[key] = (dvars, lat, jnp.float32(key))
        return _thr_cache[key]

    def below_fn(pts, thr):
        return jit_below(_bargs(thr), pts)

    # expose a pre-bindable form so eval_in_chunks can use the stable cache
    def below_bound(thr):
        bargs = _bargs(thr)
        f = lambda p: jit_below(bargs, p)
        f.stable = (below_base, bargs)
        return f

    def below_packed_bound(thr):
        bargs = _bargs(thr)
        f = lambda p: below_packed_base(bargs, p)
        f.stable = (below_packed_base, bargs)
        return f

    def below_packed_q16_bound(thr, qlo, qstep):
        key = ("q16", float(thr), float(qlo), float(qstep))
        if key not in _thr_cache:
            _thr_cache[key] = (
                dvars, lat, jnp.float32(thr), jnp.float32(qlo), jnp.float32(qstep)
            )
        bargs = _thr_cache[key]
        f = lambda p: below_packed_q16_base(bargs, p)
        f.stable = (below_packed_q16_base, bargs)
        return f

    def two_tier_band():
        """Calibrated bf16 error band for THIS decoder+latent: 2× the max
        |folded-bf16 − f32| over a fixed 128k-point probe (the error scales
        with weight conditioning — a universal constant is unsound; the
        bench's 512×5 decoder measures 2.3e-3·max_dist, a weakly-fitted
        64-wide one 4.2e-2·max_dist). Cached per bound latent."""
        if "band" not in _thr_cache:
            probe = jax.random.uniform(
                jax.random.PRNGKey(0), (131072, 3), minval=-1.0, maxval=1.0
            )
            err = float(jit_bf16_err(args, probe))
            _thr_cache["band"] = max(2.0 * err, 1e-4 * float(max_dist))
        return _thr_cache["band"]

    def below2t_packed_q16_bound(thr, qlo, qstep, band):
        key = ("q16_2t", float(thr), float(qlo), float(qstep), float(band))
        if key not in _thr_cache:
            _thr_cache[key] = (
                dvars, lat, jnp.float32(thr), jnp.float32(qlo),
                jnp.float32(qstep), jnp.float32(band),
            )
        bargs = _thr_cache[key]
        f = lambda p: below2t_packed_q16_base(bargs, p)
        f.stable = (below2t_packed_q16_base, bargs)
        return f

    # Bias-field variants: `btbl_dev` is the per-block surface-bias floor
    # table ((nb³,) uint8, already on device — the caller uploads it once per
    # extraction); the filter compares udf(p) − bias(p) against thr. Scalar
    # args are cached like the unbiased bounds (each fresh jnp scalar costs a
    # tunnel round trip); the table slots in last, per call.
    def below_packed_q16_biased_bound(thr, qlo, qstep, bscale, bcell_inv, nb, btbl_dev):
        base, _ = biased_q16_bases_for(int(nb))
        key = ("q16b", float(thr), float(qlo), float(qstep), float(bscale),
               float(bcell_inv), int(nb))
        if key not in _thr_cache:
            _thr_cache[key] = (
                dvars, lat, jnp.float32(thr), jnp.float32(qlo),
                jnp.float32(qstep), jnp.float32(bscale), jnp.float32(bcell_inv),
            )
        bargs = _thr_cache[key] + (btbl_dev,)
        f = lambda p: base(bargs, p)
        f.stable = (base, bargs)
        return f

    def below2t_packed_q16_biased_bound(
        thr, qlo, qstep, band, bscale, bcell_inv, nb, btbl_dev
    ):
        _, base2t = biased_q16_bases_for(int(nb))
        key = ("q16b_2t", float(thr), float(qlo), float(qstep), float(band),
               float(bscale), float(bcell_inv), int(nb))
        if key not in _thr_cache:
            _thr_cache[key] = (
                dvars, lat, jnp.float32(thr), jnp.float32(qlo),
                jnp.float32(qstep), jnp.float32(band), jnp.float32(bscale),
                jnp.float32(bcell_inv),
            )
        bargs = _thr_cache[key] + (btbl_dev,)
        f = lambda p: base2t(bargs, p)
        f.stable = (base2t, bargs)
        return f

    # gradient eval addressed by flat grid ids: the int32 gid upload is 3x
    # smaller than f32 positions (h2d is throttled after the first d2h)
    def grad_i8_gid_bound(R, lo, spacing):
        gid_base = grad_i8_gid_base_for(R, lo, spacing)
        f = lambda g: gid_base(args, g)
        f.stable = (gid_base, args)
        f.by_gid = True
        return f

    udf_fn.below_fn = below_fn
    udf_fn.below_bound = below_bound
    udf_fn.below_packed_bound = below_packed_bound
    udf_fn.below_packed_q16_bound = below_packed_q16_bound
    udf_fn.below2t_packed_q16_bound = below2t_packed_q16_bound
    udf_fn.below_packed_q16_biased_bound = below_packed_q16_biased_bound
    udf_fn.below2t_packed_q16_biased_bound = below2t_packed_q16_biased_bound
    udf_fn.two_tier_band = two_tier_band
    udf_fn.grad_i8_gid_bound = grad_i8_gid_bound
    return udf_fn


@functools.lru_cache(maxsize=8)
def _decoder_eval_fns(decoder: CbnDecoder, max_dist: float):
    """Per-decoder traced callables: (udf, below, grad) in stable-args form.

    Quantized variants exist because the tunnel's d2h path runs at
    ~15-30 MB/s: uint16 UDF (step max_dist/65535 ≈ 1.5e-6 — far below any
    interpolation need) and int8 unit-gradient directions (marching consumes
    only dot-product signs and orientation)."""
    enc = CoordsEncoder()

    def udf_base(args, pts):
        variables, lat = args
        emb = enc.encode(pts[None])  # (1, P, 63)
        logits = decoder.apply(variables, emb, lat[None])
        return udf_from_logits(logits[0], max_dist)

    def udf_u16_base(args, pts):
        u = udf_base(args, pts)
        return jnp.round(u * (65535.0 / max_dist)).astype(jnp.uint16)

    def below_base(args, pts):
        variables, lat, thr = args
        return (udf_base((variables, lat), pts) <= thr).astype(jnp.uint8)

    def below_packed_base(args, pts):
        # 1 bit per point: the tunnel's d2h is the slow direction
        return jnp.packbits(below_base(args, pts))

    def below_packed_q16_base(args, qpts):
        # uint16-quantized points: after the pipeline's first d2h the tunnel
        # throttles h2d to ~30 MB/s, so the filter's multi-M-point upload is
        # halved by quantizing to the 2^16 coords grid (half-step 1.5e-5 —
        # <1% of the 1/512 threshold).
        variables, lat, thr, qlo, qstep = args
        pts = qpts.astype(jnp.float32) * qstep + qlo
        return jnp.packbits(below_base((variables, lat, thr), pts))

    def below2t_packed_q16_base(args, qpts):
        # Two-tier exact filter (VERDICT r2 #6): tier 1 evaluates the folded
        # bf16 decoder (1.36× the f32 path, scripts/bench_decoder_eval.py);
        # points within `band` of the threshold are UNSURE and re-checked in
        # f32 by the caller — outside the band the bf16 decision matches the
        # f32 decision whenever band bounds the bf16 error (band is
        # CALIBRATED per decoder+latent, see make_udf_fn.two_tier_band).
        # Returns (2, ceil(P/8)): packed below-mask and packed sure-mask.
        from ..ops.decoder_kernel import fold_decoder, folded_udf

        variables, lat, thr, qlo, qstep, band = args
        pts = qpts.astype(jnp.float32) * qstep + qlo
        folded = fold_decoder(variables, lat, max_dist)  # tiny: latent affines
        u = folded_udf(folded, pts)  # bf16 matmuls, f32 result
        return jnp.stack(
            [jnp.packbits(u <= thr), jnp.packbits(jnp.abs(u - thr) > band)]
        )

    # Bias-field-aware filter bases, keyed by nb (the block-grid resolution):
    # the surface-bias calibration is a per-block floor field (geometry.
    # estimate_surface_bias_field), so the filter must widen its threshold by
    # the LOCAL bias at each query point. The (nb³,) uint8 table + scales
    # ride as jit arguments (the caller uploads the table once per
    # extraction); per-nb closures keep shapes static per executable.
    biased_bases: dict = {}

    def _bias_at(pts, args_tail, nb):
        qlo, bscale, bcell_inv, btbl = args_tail
        bi = jnp.clip(((pts - qlo) * bcell_inv).astype(jnp.int32), 0, nb - 1)
        flat = (bi[:, 0] * nb + bi[:, 1]) * nb + bi[:, 2]
        return btbl[flat].astype(jnp.float32) * bscale

    def biased_q16_bases_for(nb):
        if nb not in biased_bases:

            def q16b_base(args, qpts, _nb=nb):
                variables, lat, thr, qlo, qstep, bscale, binv, btbl = args
                pts = qpts.astype(jnp.float32) * qstep + qlo
                u = udf_base((variables, lat), pts)
                b = _bias_at(pts, (qlo, bscale, binv, btbl), _nb)
                return jnp.packbits(u - b <= thr)

            def q16b2t_base(args, qpts, _nb=nb):
                # two-tier (folded bf16 + sure mask), bias-corrected — see
                # below2t_packed_q16_base for the tier semantics
                from ..ops.decoder_kernel import fold_decoder, folded_udf

                variables, lat, thr, qlo, qstep, band, bscale, binv, btbl = args
                pts = qpts.astype(jnp.float32) * qstep + qlo
                folded = fold_decoder(variables, lat, max_dist)
                u = folded_udf(folded, pts) - _bias_at(
                    pts, (qlo, bscale, binv, btbl), _nb
                )
                return jnp.stack(
                    [jnp.packbits(u <= thr), jnp.packbits(jnp.abs(u - thr) > band)]
                )

            biased_bases[nb] = (q16b_base, q16b2t_base)
        return biased_bases[nb]

    def bf16_err_base(args, pts):
        # calibration probe: max |folded-bf16 − f32 apply| over a point batch
        from ..ops.decoder_kernel import fold_decoder, folded_udf

        variables, lat = args
        folded = fold_decoder(variables, lat, max_dist)
        return jnp.max(jnp.abs(folded_udf(folded, pts) - udf_base(args, pts)))

    def grad_base(args, pts):
        primal, vjp_fn = jax.vjp(lambda p: udf_base(args, p), pts)
        # cotangent derived from the primal so it carries the same sharding/
        # varying-axis type under shard_map (a fresh jnp.ones does not)
        (g,) = vjp_fn(primal * 0 + 1)
        return g

    def grad_i8_base(args, pts):
        g = grad_base(args, pts)
        n = jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)
        return jnp.round(g / n * 127.0).astype(jnp.int8)

    # gid-addressed gradient bases keyed by (R, lo, spacing) — shared across
    # latent re-binds so the compiled executable is reused
    gid_bases: dict = {}

    def grad_i8_gid_base_for(R, lo, spacing):
        key = (int(R), float(lo), float(spacing))
        if key not in gid_bases:
            RR = int(R) * int(R)
            lo32 = np.float32(lo)
            sp32 = np.float32(spacing)

            def gid_base(a, gids, _R=int(R), _RR=RR, _lo=lo32, _sp=sp32):
                x = gids // _RR
                rem = gids % _RR
                y = rem // _R
                z = rem % _R
                pts = jnp.stack([x, y, z], axis=-1).astype(jnp.float32) * _sp + _lo
                return grad_i8_base(a, pts)

            gid_bases[key] = gid_base
        return gid_bases[key]

    jits = (jax.jit(udf_base), jax.jit(below_base), jax.jit(grad_base))
    return (
        udf_base, below_base, grad_base, jits, udf_u16_base, grad_i8_base,
        below_packed_base, below_packed_q16_base, grad_i8_gid_base_for,
        below2t_packed_q16_base, jax.jit(bf16_err_base), biased_q16_bases_for,
    )


def make_field_bias_at(bias_field: np.ndarray, lo: float, cell: float):
    """Host-side per-point lookup into the per-block surface-bias floor field
    (nearest containing block — the field is block-constant by construction)."""
    nb = bias_field.shape[0]

    def bias_at(pts: np.ndarray) -> np.ndarray:
        bi = np.clip(((pts - lo) * (1.0 / cell)).astype(np.int32), 0, nb - 1)
        return bias_field[bi[:, 0], bi[:, 1], bi[:, 2]]

    return bias_at


def filter_faces_by_udf(
    mesh: Mesh, udf_fn, threshold: float, chunk: int = 2**16, bias_at=None
) -> Mesh:
    """Drop faces with any edge endpoint/midpoint re-querying to UDF > threshold.

    Mirrors the reference's false-face filter (meshudf.py:356-379: edge
    endpoints + midpoints, th_dist = 1/N). bias_at: optional host callable
    (P,3)→(P,) giving the local surface-bias floor; when set, the comparison
    is udf(p) − bias_at(p) ≤ threshold via the f32 evaluator.
    """
    if len(mesh.faces) == 0:
        return mesh
    v, f = mesh.vertices, mesh.faces

    # Dedup shared vertices/edges so each point is decoded once (a face and
    # its neighbor share all of their edge tests). _unique_i64 routes to the
    # native radix sort for large meshes.
    from ..geometry.mesh_ops import _unique_i64

    ea_all = np.concatenate([f[:, 0], f[:, 1], f[:, 2]])
    eb_all = np.concatenate([f[:, 1], f[:, 2], f[:, 0]])
    lo_ = np.minimum(ea_all, eb_all)
    hi_ = np.maximum(ea_all, eb_all)
    NV = len(v) + 1
    keys = lo_ * NV + hi_
    uniq, inv = _unique_i64(keys)
    ea = (uniq // NV).astype(np.int64)
    eb = (uniq % NV).astype(np.int64)
    mids = 0.5 * (v[ea] + v[eb])
    pts = np.concatenate([v, mids], axis=0).astype(np.float32)

    below_bound = getattr(udf_fn, "below_bound", None)
    below_fn = getattr(udf_fn, "below_fn", None)
    if bias_at is not None:
        # per-point threshold widening needs the raw f32 values
        ok = eval_in_chunks(udf_fn, pts, chunk) - bias_at(pts) <= threshold
    elif below_bound is not None:
        ok = eval_in_chunks(below_bound(threshold), pts, chunk).astype(bool)
    elif below_fn is not None:
        ok = eval_in_chunks(lambda p: below_fn(p, threshold), pts, chunk).astype(bool)
    else:
        ok = eval_in_chunks(udf_fn, pts, chunk) <= threshold
    vert_ok = ok[: len(v)]
    mid_ok = ok[len(v):][inv].reshape(3, -1)
    keep = vert_ok[f].all(axis=1) & mid_ok.all(axis=0)
    return Mesh(v, f[keep])


@dataclass
class MeshExtractionConfig:
    resolution: int = 512
    coords_range: tuple = (-1.0, 1.0)
    max_dist: float = 0.1
    max_batch: int = 2**19
    filter_faces: bool = True
    # threshold = face_filter_mult / resolution (reference th_dist = 1/N,
    # meshudf.py:371; raise the mult for weakly-fitted decoders whose UDF
    # floor sits above a voxel)
    face_filter_mult: float = 1.0
    # surface-bias calibration (geometry.estimate_surface_bias_field): a
    # BCE-trained decoder's UDF bottoms out at a floor b(x) > 0 at the true
    # surface; "auto" estimates a per-block floor field from the fill's block
    # minima, subtracts it from the grid during the dequantize-scatter
    # (clamped ≥ 0), and widens the face-filter threshold by the LOCAL bias
    # at each query point. Default 0.0 = raw reference semantics
    # (/root/reference/meshudf/meshudf.py has no such mechanism) so bench/
    # parity numbers stay comparable; the generate/export CLIs opt into
    # "auto" (cli/_common.py --surface_bias). A float forces a known uniform
    # bias.
    surface_bias: float | str = 0.0
    do_stabilize: bool = True
    do_smooth_borders: bool = True
    # filter-point uploads quantized to the 2^16 coords grid (half-step
    # 1.5e-5 at range (-1,1) — <1% of the threshold); set False for the exact
    # f32 re-query the reference performs (meshudf.py:356-379)
    quantized_filter_points: bool = True
    # two-tier face filter: folded-bf16 mask + f32 re-check of the points
    # within the bf16 error band of the threshold — exact result, bf16
    # throughput on ~all points (VERDICT r2 #6). Band: None = calibrated per
    # decoder+latent (udf_fn.two_tier_band, 2× the max observed bf16 error on
    # a 128k probe); a float overrides in udf units. When the band reaches
    # the threshold the filter falls back to single-tier f32.
    two_tier_filter: bool = True
    two_tier_band: float | None = None
    # post cleanup (pymeshlab-equivalent, generate_uncond.py:117-122)
    final_laplacian_iters: int = 0
    min_component_faces: int = 0
    # optional jax.sharding.Mesh with a 'data' axis: the grid-query stream
    # (coarse/fine fill, gradients, face filter) is sharded across its devices
    mesh: object = None


def get_mesh_from_udf(
    udf_fn,
    grad_fn=None,
    cfg: MeshExtractionConfig = MeshExtractionConfig(),
    return_stats: bool = False,
):
    """UDF function → cleaned mesh (reference meshudf.py:307-514)."""
    import time

    from ..geometry import remove_unreferenced_vertices

    times = {}
    t0 = time.perf_counter()
    gf = GridFiller(
        cfg.resolution,
        cfg.coords_range,
        max_batch=cfg.max_batch,
        max_dist=cfg.max_dist,
        mesh=cfg.mesh,
        reuse_buffer=True,  # the grid never escapes this function
        surface_bias=cfg.surface_bias,
    )
    grid, stats = gf.fill(udf_fn, return_stats=True)
    times["grid_fill"] = time.perf_counter() - t0
    # Grid values already have the calibrated bias subtracted. Downstream
    # re-queries of the DECODER widen their threshold by the LOCAL bias at
    # each query point (surface_bias_field, per-block floor) when the
    # evaluator supports it; `surf_bias` (the field median) is the scalar
    # fallback for evaluators without per-point machinery.
    surf_bias = float(stats.get("surface_bias", 0.0) or 0.0)
    bias_field = stats.get("surface_bias_field")
    bias_tbl = bias_scale = bias_cell_inv = None
    if bias_field is not None:
        # uint8-quantize the (nb³) floor field for the on-device per-point
        # lookup (quantization error ≤ bmax/510 ≪ a voxel); upload ONCE here
        # so the filter's 2-3 dispatches reuse the committed device buffer
        bmax = float(bias_field.max())
        if bmax > 0:
            nb_f = bias_field.shape[0]
            bias_scale = bmax / 255.0
            spacing_f = (cfg.coords_range[1] - cfg.coords_range[0]) / (cfg.resolution - 1)
            # point → block index: idx = (p − lo)/spacing, block = idx/B
            bias_cell_inv = 1.0 / ((cfg.resolution // nb_f) * spacing_f)
            bias_tbl = jnp.asarray(
                np.rint(bias_field.reshape(-1) / bias_scale).astype(np.uint8)
            )
        else:
            bias_field = None
            surf_bias = 0.0
    # the filler's activity test guarantees every near-band node is inside a
    # listed block — marching pass 1 scans only those (dilated), not R³
    active_blocks = (
        (stats["ab"], stats["block"]) if stats.get("ab") is not None and len(stats["ab"]) else None
    )

    t0 = time.perf_counter()
    lo_, hi_ = cfg.coords_range
    if grad_fn is None:
        gid_bound = getattr(udf_fn, "grad_i8_gid_bound", None)
        if gid_bound is not None:
            # int32 flat-gid upload (3x smaller than f32 positions; h2d runs
            # throttled after the pipeline's first d2h) + int8 unit downloads
            voxel = (hi_ - lo_) / (cfg.resolution - 1)
            gid_fn = gid_bound(cfg.resolution, lo_, voxel)
            grad_fn = lambda gids: eval_in_chunks(
                gid_fn, np.ascontiguousarray(gids, np.int32), cfg.max_batch,
                mesh=cfg.mesh,
            )
            grad_fn.by_gid = True
            # async form: marching dispatches the eval before its host-side
            # searchsorted so the upload/compute overlap it
            grad_fn.async_call = lambda gids: eval_in_chunks_async(
                gid_fn, np.ascontiguousarray(gids, np.int32), cfg.max_batch,
                mesh=cfg.mesh,
            )
        else:
            grad_fn = (
                getattr(udf_fn, "grad_i8_fn", None)  # int8 units: 12× less d2h
                or getattr(udf_fn, "grad_fn", None)
                or make_grad_fn(udf_fn)
            )
    if getattr(grad_fn, "by_gid", False):
        grad_at = grad_fn
    else:
        # Gradients are evaluated lazily at exactly the grid nodes marching
        # touches — no dense (R³, 3) gradient grid is built or transferred.
        grad_at = lambda pts: eval_in_chunks(grad_fn, pts, cfg.max_batch, mesh=cfg.mesh)
        grad_at.by_gid = False
    # When the fused quantized filter will run, face_filter_prep_q16 builds
    # the mesh's unique-edge structure + pre-quantized query points in one
    # pass; finalize_mesh_pre later reuses that edge structure.
    from .. import native

    q16_bound = getattr(udf_fn, "below_packed_q16_bound", None)
    qstep = (hi_ - lo_) / 65535.0
    try:
        mesh = marching_tetrahedra_udf(
            grid, grad_at, cfg.coords_range, times=times, active_blocks=active_blocks
        )
    finally:
        # marching was the last reader of the dense grid — only now may the
        # buffer re-enter the reuse pool (a concurrent pipelined fill resets
        # pooled buffers in place)
        gf.release_buffer()
    times["marching"] = time.perf_counter() - t0
    stats["raw_faces"] = len(mesh.faces)

    # --- hard output guards ---
    # r4 lesson: bias-calibrated spike vertices escaped [-1,1] by 3 orders of
    # magnitude. The t-clamp makes every MT vertex a convex combination of
    # grid nodes, so this guard should never fire — it is the backstop that
    # turns any future regression into a visible stat instead of a corrupt
    # mesh. Also flag face counts that fill the near-band shell volumetrically
    # (layered phantom surfaces) rather than tracing one surface through it.
    voxel_g = (hi_ - lo_) / (cfg.resolution - 1)
    if len(mesh.faces):
        vlo, vhi = lo_ - 2 * voxel_g, hi_ + 2 * voxel_g
        bad = ((mesh.vertices < vlo) | (mesh.vertices > vhi)).any(axis=1)
        n_bad = int(bad.sum())
        stats["oob_vertices"] = n_bad
        if n_bad:
            import warnings

            warnings.warn(
                f"extraction produced {n_bad} out-of-domain vertices — dropped "
                f"(surface_bias={surf_bias:.4g}); this indicates a marching "
                "interpolation regression"
            )
            keepf = ~bad[mesh.faces].any(axis=1)
            mesh = remove_unreferenced_vertices(Mesh(mesh.vertices, mesh.faces[keepf]))
    stats["face_budget_ratio"] = round(
        len(mesh.faces) / max(stats.get("fine_points", 0), 1), 3
    )
    stats["face_explosion"] = stats["face_budget_ratio"] > 2.0

    fused = cfg.filter_faces and len(mesh.faces) > 0 and native.available()
    if fused:
        # Fused native path: the TPU evaluates the below-threshold mask at the
        # filter's query points (vertices + unique-edge midpoints), then one
        # C++ pass applies the keep filter and the whole cleanup chain (hole
        # fill, border smoothing, vertex merge).
        t0 = time.perf_counter()
        packed_bound = getattr(udf_fn, "below_packed_bound", None)
        below_bound = getattr(udf_fn, "below_bound", None)
        pre = q16_bound is not None and cfg.quantized_filter_points
        # per-point threshold widening by the LOCAL surface-bias floor (the
        # scalar fallback widens everywhere by the field median — it would
        # admit phantom faces in low-floor regions and drop true ones in
        # high-floor regions)
        per_point = (
            pre and bias_tbl is not None
            and getattr(udf_fn, "below_packed_q16_biased_bound", None) is not None
        )
        threshold = cfg.face_filter_mult / cfg.resolution + (
            0.0 if per_point else surf_bias
        )
        two_tier = (
            pre and cfg.two_tier_filter
            and getattr(udf_fn, "below2t_packed_q16_bound", None) is not None
        )
        if two_tier:
            band = (
                cfg.two_tier_band if cfg.two_tier_band is not None
                else udf_fn.two_tier_band()
            )
            # The filter's query points concentrate AT the predicted surface
            # (mesh vertices/edge midpoints), i.e. exactly where |udf − thr|
            # is small — so the unsure fraction grows with band/threshold
            # much faster than a uniform-points intuition suggests (measured
            # on the bench decoder at 512³: band/thr = 0.51 → 68% of 5.4M
            # queries unsure → tier 2 re-uploads+re-evaluates most of the
            # stream and the two-tier path is strictly SLOWER than one f32
            # pass). Only run two-tier when the band is a small fraction of
            # the threshold; otherwise single-pass f32 wins.
            if band >= 0.25 * threshold:
                two_tier = False
        if pre:
            # uint16 coords (half the upload) + packed-bit mask downloads
            # (quantization half-step 1.5e-5 ≈ 0.8% of the 1/512 threshold).
            # Overlap schedule: the vertex queries exist before the edge
            # structure, so their upload + decoder eval dispatches first and
            # runs while the C++ prep radix-sorts the edges; prep also hands
            # back ea/eb so the cleanup skips its second sort
            # (finalize_mesh_pre).
            if two_tier:
                if per_point:
                    bound = udf_fn.below2t_packed_q16_biased_bound(
                        threshold, lo_, qstep, band,
                        bias_scale, bias_cell_inv, bias_field.shape[0], bias_tbl,
                    )
                else:
                    bound = udf_fn.below2t_packed_q16_bound(threshold, lo_, qstep, band)
                rows = 2
            else:
                if per_point:
                    bound = udf_fn.below_packed_q16_biased_bound(
                        threshold, lo_, qstep,
                        bias_scale, bias_cell_inv, bias_field.shape[0], bias_tbl,
                    )
                else:
                    bound = q16_bound(threshold, lo_, qstep)
                rows = 0
            qverts = np.clip(
                np.rint((mesh.vertices - lo_) * (1.0 / qstep)), 0, 65535
            ).astype(np.uint16)
            verts_pending = eval_in_chunks_async(
                bound, qverts, cfg.max_batch, unpack_bits=not rows,
                unpack_rows=rows, mesh=cfg.mesh,
            )
            qmids, einv, ea, eb = native.face_filter_prep_q16(
                mesh.vertices, mesh.faces, lo_, 1.0 / qstep
            )
            times["ff_prep"] = round(time.perf_counter() - t0, 3)
            mids_pending = eval_in_chunks_async(
                bound, qmids, cfg.max_batch, unpack_bits=not rows,
                unpack_rows=rows, mesh=cfg.mesh,
            )
            if two_tier:
                # tier 1 (bf16): below + sure masks in one packed download
                t1 = time.perf_counter()
                vb = verts_pending()
                mb = mids_pending()
                times["ff_t1_fetch"] = round(time.perf_counter() - t1, 3)
                ok = np.concatenate([vb[0], mb[0]])
                sure = np.concatenate([vb[1], mb[1]])
                uns = np.nonzero(sure == 0)[0]
                stats["ff_unsure"] = int(len(uns))
                if len(uns):
                    # tier 2 (f32, exact): only the band points re-query
                    t1 = time.perf_counter()
                    qall = np.concatenate([qverts, qmids])
                    if per_point:
                        t2_bound = udf_fn.below_packed_q16_biased_bound(
                            threshold, lo_, qstep,
                            bias_scale, bias_cell_inv, bias_field.shape[0], bias_tbl,
                        )
                    else:
                        t2_bound = q16_bound(threshold, lo_, qstep)
                    ok[uns] = eval_in_chunks(
                        t2_bound, qall[uns],
                        cfg.max_batch, unpack_bits=True, mesh=cfg.mesh,
                    )
                    times["ff_t2"] = round(time.perf_counter() - t1, 3)
            else:
                ok = np.concatenate([verts_pending(), mids_pending()])
        else:
            pts, einv = native.face_filter_prep(mesh.vertices, mesh.faces)
            times["ff_prep"] = round(time.perf_counter() - t0, 3)
            if packed_bound is not None:
                ok = eval_in_chunks(
                    packed_bound(threshold), pts, cfg.max_batch,
                    unpack_bits=True, mesh=cfg.mesh,
                )
            elif below_bound is not None:
                ok = eval_in_chunks(
                    below_bound(threshold), pts, cfg.max_batch, mesh=cfg.mesh
                )
            else:
                ok = (
                    eval_in_chunks(udf_fn, pts, cfg.max_batch, mesh=cfg.mesh)
                    <= threshold
                ).astype(np.uint8)
        times["face_filter"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        if pre:
            # reuse the prep's edge structure: the filtered mesh's edge
            # counts come from a linear bincount, not a second radix sort
            v, f = native.finalize_mesh_pre(
                mesh.vertices, mesh.faces, ok, einv, ea, eb,
                fill_holes=cfg.do_stabilize,
                smooth_iters=20 if cfg.do_smooth_borders else 0,
                lam=0.3,
                merge_decimals=6,
            )
        else:
            v, f = native.finalize_mesh(
                mesh.vertices,
                mesh.faces,
                ok,
                einv,
                fill_holes=cfg.do_stabilize,
                smooth_iters=20 if cfg.do_smooth_borders else 0,
                lam=0.3,
                merge_decimals=6,
            )
        mesh = Mesh(v, f)
        if cfg.final_laplacian_iters:
            mesh = laplacian_smooth(mesh, iterations=cfg.final_laplacian_iters, lam=0.5)
        if cfg.min_component_faces:
            mesh = filter_small_components(mesh, cfg.min_component_faces)
        times["cleanup"] = time.perf_counter() - t0
    else:
        t0 = time.perf_counter()
        if cfg.filter_faces and len(mesh.faces):
            if bias_field is not None:
                nb_f = bias_field.shape[0]
                cell = (cfg.resolution // nb_f) * voxel_g
                mesh = filter_faces_by_udf(
                    mesh, udf_fn, cfg.face_filter_mult / cfg.resolution,
                    chunk=cfg.max_batch,
                    bias_at=make_field_bias_at(bias_field, lo_, cell),
                )
            else:
                mesh = filter_faces_by_udf(
                    mesh, udf_fn, cfg.face_filter_mult / cfg.resolution + surf_bias,
                    chunk=cfg.max_batch,
                )
            mesh = remove_unreferenced_vertices(mesh)
        times["face_filter"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        if cfg.do_stabilize:
            # MT output is duplicate-free by construction (unique edge keys)
            mesh = stabilize(mesh, assume_clean=True)
        if cfg.do_smooth_borders:
            mesh = smooth_borders(mesh, iterations=20, lam=0.3)
        if cfg.final_laplacian_iters:
            mesh = laplacian_smooth(mesh, iterations=cfg.final_laplacian_iters, lam=0.5)
        if cfg.min_component_faces:
            mesh = filter_small_components(mesh, cfg.min_component_faces)
        mesh = merge_duplicate_vertices(mesh)
        times["cleanup"] = time.perf_counter() - t0

    if return_stats:
        stats["final_faces"] = len(mesh.faces)
        stats["times"] = {k: round(v, 3) for k, v in times.items()}
        return mesh, stats
    return mesh


def get_watertight_mesh_from_udf(
    udf_fn,
    cfg: MeshExtractionConfig = MeshExtractionConfig(),
    iso: float = 0.01,
):
    """Watertight alternative: classic signed extraction at iso on the raw UDF
    + keep the largest-bbox component + renormalize to [-1,1]
    (reference sample/generate_image.py:150-171)."""
    from ..geometry import keep_largest_component

    gf = GridFiller(
        cfg.resolution, cfg.coords_range, max_batch=cfg.max_batch,
        max_dist=cfg.max_dist, mesh=cfg.mesh, reuse_buffer=True,
        surface_bias=cfg.surface_bias,  # iso then applies to the TRUE field
    )
    grid = gf.fill(udf_fn)
    try:
        mesh = marching_tetrahedra(grid, iso=iso, coords_range=cfg.coords_range)
    finally:
        gf.release_buffer()
    mesh = keep_largest_component(mesh, by_bbox=True)
    if len(mesh.vertices):
        v = mesh.vertices
        center = (v.max(0) + v.min(0)) / 2
        scale = np.abs(v - center).max()
        mesh = Mesh((v - center) / max(scale, 1e-9), mesh.faces)
    return mesh


def sample_latents(
    sched: Schedule,
    model_fn,
    num_samples: int,
    latent_len: int,
    rng,
    sampler: str = "ddpm",
    clip_denoised: bool = False,
    var_type=None,
) -> jnp.ndarray:
    """Diffusion-sample (B, L) latent codes (reference p_sample_loop call,
    sample/generate_uncond.py:72-85; shape (B, 1, L) there, (B, L, 1) here).

    clip_denoised defaults False like every reference generate script
    (generate_uncond.py:77, generate_cat.py:88) — DGCNN latents are not
    bounded to [-1,1], so the guided-diffusion library default of True would
    truncate trained latent codes.

    var_type: diffusion.VarType for the DDPM posterior variance (default
    FIXED_SMALL — the reference's sigma_small=True)."""
    from ..diffusion import ddim_sample_loop, plms_sample_loop

    kw = {"clip_denoised": clip_denoised}
    if var_type is not None:
        kw["var_type"] = var_type
    shape = (num_samples, latent_len, 1)
    if sampler == "ddpm":
        out = p_sample_loop(sched, model_fn, shape, rng, **kw)
    elif sampler == "ddim":
        out = ddim_sample_loop(sched, model_fn, shape, rng, **kw)
    elif sampler == "plms":
        out = plms_sample_loop(sched, model_fn, shape, rng, **kw)
    else:
        raise ValueError(f"unknown sampler: {sampler}")
    return out[..., 0]
