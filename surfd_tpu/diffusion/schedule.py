"""Diffusion noise schedules and precomputed process constants.

TPU-first re-design of the reference's `GaussianDiffusion.__init__` +
`get_named_beta_schedule` (see /root/reference/diffusion/gaussian_diffusion.py:23-181)
and `SpacedDiffusion` respacing (/root/reference/diffusion/respace.py:7-115).

All process constants are precomputed once in float64 numpy (matching the
reference's precision choice) and stored as a frozen pytree of float32 HOST
(numpy) arrays so the whole schedule can be closed over by jitted
samplers/losses, where the tracer embeds them as HLO literals. They must NOT
be pre-created device arrays: on the axon TPU tunnel, an executable holding
references to pre-existing device constants permanently throttles every
subsequent host→device transfer in the process (~30 MB/s vs ~1 GB/s).
Respacing is a pure transformation producing a new `Schedule` plus a
`timestep_map` that the model-apply wrapper uses to remap t — no subclassing,
no wrapped-model object.
"""

from __future__ import annotations

import math
from typing import Sequence, Set, Union

import jax.numpy as jnp
import numpy as np
from flax import struct


def named_beta_schedule(name: str, num_timesteps: int, scale_betas: float = 1.0) -> np.ndarray:
    """Named beta schedules ("linear", "cosine").

    Matches reference `get_named_beta_schedule`
    (/root/reference/diffusion/gaussian_diffusion.py:23-47).
    """
    if name == "linear":
        scale = scale_betas * 1000.0 / num_timesteps
        return np.linspace(scale * 1e-4, scale * 0.02, num_timesteps, dtype=np.float64)
    if name == "cosine":
        return betas_for_alpha_bar(
            num_timesteps,
            lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2,
        )
    raise NotImplementedError(f"unknown beta schedule: {name}")


def betas_for_alpha_bar(num_timesteps: int, alpha_bar, max_beta: float = 0.999) -> np.ndarray:
    """Discretize a continuous alpha-bar function into betas.

    Matches reference `betas_for_alpha_bar`
    (/root/reference/diffusion/gaussian_diffusion.py:50-67).
    """
    betas = []
    for i in range(num_timesteps):
        t1 = i / num_timesteps
        t2 = (i + 1) / num_timesteps
        betas.append(min(1.0 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas, dtype=np.float64)


@struct.dataclass
class Schedule:
    """Precomputed diffusion process constants (a frozen pytree).

    Mirrors the arrays computed in the reference `GaussianDiffusion.__init__`
    (/root/reference/diffusion/gaussian_diffusion.py:143-181). `timestep_map`
    maps respaced step index -> original step index (identity when unspaced),
    replacing the reference's `_WrappedModel` (respace.py:116-132).
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    alphas_cumprod_next: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    # FIXED_LARGE variance: beta_t with posterior_variance[1] at t=0.
    fixed_large_variance: jnp.ndarray
    fixed_large_log_variance: jnp.ndarray
    timestep_map: jnp.ndarray
    # Static metadata (not traced).
    num_timesteps: int = struct.field(pytree_node=False)
    original_num_steps: int = struct.field(pytree_node=False)
    rescale_timesteps: bool = struct.field(pytree_node=False, default=False)

    def model_timesteps(self, t: jnp.ndarray) -> jnp.ndarray:
        """Timesteps as seen by the denoiser: respacing remap + optional rescale.

        Replaces reference `_WrappedModel.__call__` (respace.py:123-132) and
        `_scale_timesteps` (gaussian_diffusion.py:388-391).
        """
        new_t = jnp.asarray(self.timestep_map)[t]
        if self.rescale_timesteps:
            return new_t.astype(jnp.float32) * (1000.0 / self.original_num_steps)
        return new_t


def make_schedule(
    betas: np.ndarray,
    rescale_timesteps: bool = False,
    timestep_map: np.ndarray | None = None,
    original_num_steps: int | None = None,
    dtype=jnp.float32,
) -> Schedule:
    """Build a `Schedule` from a 1-D beta array (float64 internally)."""
    betas = np.asarray(betas, dtype=np.float64)
    assert betas.ndim == 1 and (betas > 0).all() and (betas <= 1).all()
    T = betas.shape[0]

    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    alphas_cumprod_next = np.append(alphas_cumprod[1:], 0.0)

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    posterior_log_variance_clipped = np.log(
        np.append(posterior_variance[1], posterior_variance[1:])
    )
    fixed_large_variance = np.append(posterior_variance[1], betas[1:])

    if timestep_map is None:
        timestep_map = np.arange(T, dtype=np.int32)
    if original_num_steps is None:
        original_num_steps = T

    as_j = lambda a: np.asarray(a, dtype=dtype)  # host arrays — see module doc
    return Schedule(
        betas=as_j(betas),
        alphas_cumprod=as_j(alphas_cumprod),
        alphas_cumprod_prev=as_j(alphas_cumprod_prev),
        alphas_cumprod_next=as_j(alphas_cumprod_next),
        sqrt_alphas_cumprod=as_j(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=as_j(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=as_j(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=as_j(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=as_j(np.sqrt(1.0 / alphas_cumprod - 1.0)),
        posterior_variance=as_j(posterior_variance),
        posterior_log_variance_clipped=as_j(posterior_log_variance_clipped),
        posterior_mean_coef1=as_j(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        ),
        posterior_mean_coef2=as_j(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
        fixed_large_variance=as_j(fixed_large_variance),
        fixed_large_log_variance=as_j(np.log(fixed_large_variance)),
        timestep_map=np.asarray(timestep_map, dtype=np.int32),
        num_timesteps=T,
        original_num_steps=int(original_num_steps),
        rescale_timesteps=rescale_timesteps,
    )


def named_schedule(name: str, num_timesteps: int, scale_betas: float = 1.0, **kw) -> Schedule:
    return make_schedule(named_beta_schedule(name, num_timesteps, scale_betas), **kw)


def space_timesteps(num_timesteps: int, section_counts: Union[str, Sequence[int]]) -> Set[int]:
    """Select a subset of timesteps for respacing ("ddimN" or section counts).

    Matches reference `space_timesteps` (/root/reference/diffusion/respace.py:7-60).
    """
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired = int(section_counts[len("ddim"):])
            for stride in range(1, num_timesteps):
                if len(range(0, num_timesteps, stride)) == desired:
                    return set(range(0, num_timesteps, stride))
            raise ValueError(f"cannot create exactly {desired} steps with an integer stride")
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps = []
    for i, section_count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < section_count:
            raise ValueError(f"cannot divide section of {size} steps into {section_count}")
        frac_stride = 1 if section_count <= 1 else (size - 1) / (section_count - 1)
        cur = 0.0
        for _ in range(section_count):
            all_steps.append(start_idx + round(cur))
            cur += frac_stride
        start_idx += size
    return set(all_steps)


def spaced_schedule(
    base_betas: np.ndarray,
    use_timesteps,
    rescale_timesteps: bool = False,
    dtype=jnp.float32,
) -> Schedule:
    """Respaced schedule: re-derive betas over the retained timesteps.

    Matches reference `SpacedDiffusion.__init__` (respace.py:72-86): keeps the
    original alpha-bar values at the retained steps and records the index map.
    """
    base_betas = np.asarray(base_betas, dtype=np.float64)
    use = set(int(t) for t in use_timesteps)
    alphas_cumprod = np.cumprod(1.0 - base_betas)
    last = 1.0
    new_betas, tmap = [], []
    for i, ac in enumerate(alphas_cumprod):
        if i in use:
            new_betas.append(1.0 - ac / last)
            last = ac
            tmap.append(i)
    return make_schedule(
        np.array(new_betas),
        rescale_timesteps=rescale_timesteps,
        timestep_map=np.array(tmap, dtype=np.int32),
        original_num_steps=len(base_betas),
        dtype=dtype,
    )
