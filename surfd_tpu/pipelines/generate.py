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
    from ..geometry import make_grad_fn

    enc = coords_encoder or CoordsEncoder()

    @jax.jit
    def udf_fn_param(lat, pts):
        emb = enc.encode(pts[None])  # (1, P, 63)
        logits = decoder.apply(decoder_vars, emb, lat[None])
        return udf_from_logits(logits[0], max_dist)

    udf_fn = lambda pts: udf_fn_param(latent, pts)
    # Attach the matching gradient fn so repeated get_mesh_from_udf calls
    # reuse ONE jitted executable instead of re-deriving (and re-compiling)
    # the VJP every time.
    udf_fn.grad_fn = make_grad_fn(udf_fn)

    # Thresholded variant for the face filter: comparing on device and
    # shipping uint8 instead of float32 quarters the d2h bytes.
    @jax.jit
    def udf_below(lat, pts, thr):
        return (udf_fn_param(lat, pts) <= thr).astype(jnp.uint8)

    udf_fn.below_fn = lambda pts, thr: udf_below(latent, pts, jnp.float32(thr))
    return udf_fn


def filter_faces_by_udf(
    mesh: Mesh, udf_fn, threshold: float, chunk: int = 2**16
) -> Mesh:
    """Drop faces with any edge endpoint/midpoint re-querying to UDF > threshold.

    Mirrors the reference's false-face filter (meshudf.py:356-379: edge
    endpoints + midpoints, th_dist = 1/N).
    """
    if len(mesh.faces) == 0:
        return mesh
    v, f = mesh.vertices, mesh.faces
    corners = [v[f[:, i]] for i in range(3)]
    mids = [
        0.5 * (v[f[:, 0]] + v[f[:, 1]]),
        0.5 * (v[f[:, 1]] + v[f[:, 2]]),
        0.5 * (v[f[:, 2]] + v[f[:, 0]]),
    ]
    pts = np.concatenate(corners + mids, axis=0).astype(np.float32)
    below_fn = getattr(udf_fn, "below_fn", None)
    if below_fn is not None:
        ok = eval_in_chunks(lambda p: below_fn(p, threshold), pts, chunk).reshape(6, -1)
        keep = ok.all(axis=0)
    else:
        u = eval_in_chunks(udf_fn, pts, chunk).reshape(6, -1)
        keep = (u <= threshold).all(axis=0)
    return Mesh(v, f[keep])


@dataclass
class MeshExtractionConfig:
    resolution: int = 512
    coords_range: tuple = (-1.0, 1.0)
    max_dist: float = 0.1
    max_batch: int = 2**17
    filter_faces: bool = True
    do_stabilize: bool = True
    do_smooth_borders: bool = True
    # post cleanup (pymeshlab-equivalent, generate_uncond.py:117-122)
    final_laplacian_iters: int = 0
    min_component_faces: int = 0


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
    )
    grid, stats = gf.fill(udf_fn, return_stats=True)
    times["grid_fill"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    if grad_fn is None:
        grad_fn = getattr(udf_fn, "grad_fn", None) or make_grad_fn(udf_fn)
    grads = gf.fill_gradients(grad_fn, grid)
    times["gradients"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    mesh = marching_tetrahedra_udf(grid, grads, cfg.coords_range)
    times["marching"] = time.perf_counter() - t0
    stats["raw_faces"] = len(mesh.faces)

    t0 = time.perf_counter()
    if cfg.filter_faces and len(mesh.faces):
        mesh = filter_faces_by_udf(mesh, udf_fn, 1.0 / cfg.resolution, chunk=cfg.max_batch)
        mesh = remove_unreferenced_vertices(mesh)
    times["face_filter"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    if cfg.do_stabilize:
        mesh = stabilize(mesh)
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
        cfg.resolution, cfg.coords_range, max_batch=cfg.max_batch, max_dist=cfg.max_dist
    )
    grid = gf.fill(udf_fn)
    mesh = marching_tetrahedra(grid.astype(np.float64), iso=iso, coords_range=cfg.coords_range)
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
    clip_denoised: bool = True,
) -> jnp.ndarray:
    """Diffusion-sample (B, L) latent codes (reference p_sample_loop call,
    sample/generate_uncond.py:72-85; shape (B, 1, L) there, (B, L, 1) here)."""
    from ..diffusion import ddim_sample_loop, plms_sample_loop

    shape = (num_samples, latent_len, 1)
    if sampler == "ddpm":
        out = p_sample_loop(sched, model_fn, shape, rng, clip_denoised=clip_denoised)
    elif sampler == "ddim":
        out = ddim_sample_loop(sched, model_fn, shape, rng, clip_denoised=clip_denoised)
    elif sampler == "plms":
        out = plms_sample_loop(sched, model_fn, shape, rng, clip_denoised=clip_denoised)
    else:
        raise ValueError(f"unknown sampler: {sampler}")
    return out[..., 0]
