"""Diffusion noise schedules and precomputed coefficient tables.

Re-derivation of the guided-diffusion schedule math the reference embeds in
`Diffusion_Stage/models/gaussian_diffusion.py:228-272` (named beta schedules)
and `:328-379` (the float64 coefficient tables), reshaped for TPU use: all
tables are computed once on host in float64 and shipped to device as a single
float32 pytree (`DiffusionSchedule`) that samplers index with gathers inside
jitted code — no per-step host lookups.

Also adds DDIM timestep *respacing* (`space_timesteps` / `respaced_schedule`),
which the reference lacks entirely — it always runs the full 1000-step ladder
(`gaussian_diffusion.py:943`).  Respacing follows the standard guided-diffusion
recipe: keep a subsequence of timesteps and recompute betas so the cumulative
alphas match the kept steps.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np


def linear_beta_schedule(num_steps: int) -> np.ndarray:
    """Ho et al. linear schedule, scaled for any step count
    (reference `gaussian_diffusion.py:237-245`)."""
    scale = 1000.0 / num_steps
    return np.linspace(scale * 0.0001, scale * 0.02, num_steps, dtype=np.float64)


def cosine_beta_schedule(num_steps: int, max_beta: float = 0.999) -> np.ndarray:
    """Nichol & Dhariwal cosine schedule (reference `gaussian_diffusion.py:246-272`)."""

    def alpha_bar(t: float) -> float:
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

    betas = []
    for i in range(num_steps):
        t1 = i / num_steps
        t2 = (i + 1) / num_steps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas, dtype=np.float64)


def get_named_beta_schedule(name: str, num_steps: int) -> np.ndarray:
    if name == "linear":
        return linear_beta_schedule(num_steps)
    if name == "cosine":
        return cosine_beta_schedule(num_steps)
    raise ValueError(f"unknown beta schedule: {name!r}")


class DiffusionSchedule(NamedTuple):
    """All per-timestep coefficient tables, device-resident float32.

    Field-for-field the quantities of reference `gaussian_diffusion.py:328-379`,
    precomputed in float64 on host for accuracy then cast.
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
    # FIXED_LARGE variance table (`gaussian_diffusion.py:491-494`)
    fixed_large_variance: jnp.ndarray
    fixed_large_log_variance: jnp.ndarray
    # Original-ladder indices for respaced schedules (identity when unrespaced);
    # used to rescale timesteps fed to a model trained on the full ladder.
    timestep_map: jnp.ndarray

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])


def schedule_from_betas(
    betas: np.ndarray, timestep_map: Sequence[int] | None = None
) -> DiffusionSchedule:
    betas = np.asarray(betas, dtype=np.float64)
    assert betas.ndim == 1 and (betas > 0).all() and (betas <= 1).all()
    num_steps = betas.shape[0]

    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    # "linear" extended to few steps ends at beta=1 exactly (alpha_bar -> 0);
    # clamp so the reciprocal tables stay finite instead of poisoning jit
    # outputs with inf (the reference simply produces inf here).
    acp_safe = np.maximum(alphas_cumprod, 1e-12)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    alphas_cumprod_next = np.append(alphas_cumprod[1:], 0.0)

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    posterior_log_variance_clipped = np.log(
        np.append(posterior_variance[1], posterior_variance[1:])
    )
    fixed_large_variance = np.append(posterior_variance[1], betas[1:])

    if timestep_map is None:
        timestep_map = np.arange(num_steps, dtype=np.int64)

    def j(x):
        return jnp.asarray(x, dtype=jnp.float32)

    return DiffusionSchedule(
        betas=j(betas),
        alphas_cumprod=j(alphas_cumprod),
        alphas_cumprod_prev=j(alphas_cumprod_prev),
        alphas_cumprod_next=j(alphas_cumprod_next),
        sqrt_alphas_cumprod=j(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=j(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=j(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=j(np.sqrt(1.0 / acp_safe)),
        sqrt_recipm1_alphas_cumprod=j(np.sqrt(1.0 / acp_safe - 1)),
        posterior_variance=j(posterior_variance),
        posterior_log_variance_clipped=j(posterior_log_variance_clipped),
        posterior_mean_coef1=j(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        ),
        posterior_mean_coef2=j(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
        fixed_large_variance=j(fixed_large_variance),
        fixed_large_log_variance=j(np.log(fixed_large_variance)),
        timestep_map=jnp.asarray(np.asarray(timestep_map), dtype=jnp.int32),
    )


def make_schedule(name: str, num_steps: int) -> DiffusionSchedule:
    return schedule_from_betas(get_named_beta_schedule(name, num_steps))


def space_timesteps(num_timesteps: int, section_counts) -> list[int]:
    """Pick a subsequence of timesteps, guided-diffusion style.

    ``section_counts`` is either a list of per-section step counts, an int, or a
    string like ``"50"`` / ``"ddim50"`` (the ``ddimN`` form uses a fixed stride
    so the endpoints line up with DDIM's assumptions).
    """
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired = int(section_counts[len("ddim"):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired:
                    return list(range(0, num_timesteps, i))
            raise ValueError(f"cannot create exactly {desired} steps with integer stride")
        section_counts = [int(x) for x in section_counts.split(",")]
    elif isinstance(section_counts, int):
        section_counts = [section_counts]

    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps: list[int] = []
    for i, section_count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < section_count:
            raise ValueError(f"cannot divide section of {size} steps into {section_count}")
        frac_stride = 1 if section_count <= 1 else (size - 1) / (section_count - 1)
        cur_idx = 0.0
        taken = []
        for _ in range(section_count):
            taken.append(start_idx + round(cur_idx))
            cur_idx += frac_stride
        all_steps += taken
        start_idx += size
    return sorted(set(all_steps))


def respaced_schedule(
    name: str, num_steps: int, use_timesteps: Sequence[int]
) -> DiffusionSchedule:
    """Build a respaced schedule that evaluates only ``use_timesteps`` of the
    base ladder; ``timestep_map`` holds the original indices so the model (which
    was trained on the full ladder) sees original-scale timesteps."""
    base = get_named_beta_schedule(name, num_steps)
    alphas_cumprod = np.cumprod(1.0 - base)
    last_alpha_cumprod = 1.0
    new_betas, tmap = [], []
    use = set(int(t) for t in use_timesteps)
    for i, acp in enumerate(alphas_cumprod):
        if i in use:
            new_betas.append(1 - acp / last_alpha_cumprod)
            last_alpha_cumprod = acp
            tmap.append(i)
    return schedule_from_betas(np.array(new_betas), timestep_map=tmap)
