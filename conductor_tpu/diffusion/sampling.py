"""Diffusion samplers as single jitted `lax.scan` loops.

The reference drives sampling from Python, one host-dispatched denoiser call
per timestep for all 1000 steps (`Diffusion_Stage/models/gaussian_diffusion.py:
917-965` `ddim_sample_loop_progressive`, `:730-781` `p_sample_loop_progressive`)
— the dominant inference cost (`tools/visualization.py` call stack).  Here the
whole ladder is one `lax.scan` whose body is the jitted denoiser step: zero
host round-trips, donated carry buffer, and it composes with `pjit` so batched
generation shards across chips.

Per-step math matches the reference exactly: `ddim_step` is Eq. 12 of Song et
al. as written in `gaussian_diffusion.py:783-831`, `ancestral_step` is
`p_sample` (`:605-665`).  Timestep respacing (absent in the reference) comes
for free by passing a respaced `DiffusionSchedule`.

Inpainting: the reference supports `pre_seq` prefix inpainting and
`transl_req` keyframe constraints inside `p_sample` (`:634-646`).  Both are
special cases of masked known-value inpainting, exposed here as an optional
``known_mask``/``known_x0`` pair applied at every step.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from .gaussian import (
    MeanType,
    VarType,
    extract,
    p_mean_variance,
    predict_eps_from_xstart,
    q_sample,
)
from .schedule import DiffusionSchedule

ModelFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def ddim_step(
    sched: DiffusionSchedule,
    model_fn: ModelFn,
    x: jnp.ndarray,
    t: jnp.ndarray,
    rng: jax.Array,
    *,
    eta: float = 0.0,
    mean_type: MeanType = MeanType.START_X,
    var_type: VarType = VarType.FIXED_SMALL,
    clip_denoised: bool = False,
):
    """One DDIM update x_t -> x_{t-1} (`gaussian_diffusion.py:783-831`)."""
    nd = x.ndim
    out = p_mean_variance(
        sched, model_fn, x, t,
        mean_type=mean_type, var_type=var_type, clip_denoised=clip_denoised,
    )
    eps = predict_eps_from_xstart(sched, x, t, out.pred_xstart)
    alpha_bar = extract(sched.alphas_cumprod, t, nd)
    alpha_bar_prev = extract(sched.alphas_cumprod_prev, t, nd)
    sigma = (
        eta
        * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
        * jnp.sqrt(1 - alpha_bar / alpha_bar_prev)
    )
    mean_pred = (
        out.pred_xstart * jnp.sqrt(alpha_bar_prev)
        + jnp.sqrt(1 - alpha_bar_prev - sigma**2) * eps
    )
    nonzero = (t != 0).astype(x.dtype).reshape((-1,) + (1,) * (nd - 1))
    if eta == 0.0:
        sample = mean_pred  # deterministic path: skip the unused normal draw
    else:
        noise = jax.random.normal(rng, x.shape, dtype=x.dtype)
        sample = mean_pred + nonzero * sigma * noise
    return sample, out.pred_xstart


def ancestral_step(
    sched: DiffusionSchedule,
    model_fn: ModelFn,
    x: jnp.ndarray,
    t: jnp.ndarray,
    rng: jax.Array,
    *,
    mean_type: MeanType = MeanType.START_X,
    var_type: VarType = VarType.FIXED_SMALL,
    clip_denoised: bool = False,
):
    """One ancestral (DDPM) update (`gaussian_diffusion.py:605-665`)."""
    nd = x.ndim
    out = p_mean_variance(
        sched, model_fn, x, t,
        mean_type=mean_type, var_type=var_type, clip_denoised=clip_denoised,
    )
    noise = jax.random.normal(rng, x.shape, dtype=x.dtype)
    nonzero = (t != 0).astype(x.dtype).reshape((-1,) + (1,) * (nd - 1))
    sample = out.mean + nonzero * jnp.exp(0.5 * out.log_variance) * noise
    return sample, out.pred_xstart


def _sample_loop(
    step_fn,
    sched: DiffusionSchedule,
    model_fn: ModelFn,
    shape: tuple[int, ...],
    rng: jax.Array,
    *,
    noise: jnp.ndarray | None = None,
    known_mask: jnp.ndarray | None = None,
    known_x0: jnp.ndarray | None = None,
    return_trajectory: bool = False,
):
    num_steps = sched.num_timesteps
    init_rng, loop_rng = jax.random.split(rng)
    x = jax.random.normal(init_rng, shape) if noise is None else noise

    def body(x, t_scalar):
        t = jnp.full((shape[0],), t_scalar, dtype=jnp.int32)
        if known_mask is not None:
            # Masked inpainting: clamp known coordinates to q(x_t | known_x0)
            # before denoising (generalizes `pre_seq`/`transl_req`,
            # `gaussian_diffusion.py:634-646`).
            noise_k = jax.random.normal(jax.random.fold_in(loop_rng, t_scalar + num_steps), shape)
            x = jnp.where(known_mask, q_sample(sched, known_x0, t, noise_k), x)
        sample, pred_x0 = step_fn(
            sched, model_fn, x, t, jax.random.fold_in(loop_rng, t_scalar)
        )
        return sample, (sample if return_trajectory else None)

    timesteps = jnp.arange(num_steps - 1, -1, -1, dtype=jnp.int32)
    x, traj = jax.lax.scan(body, x, timesteps)
    if return_trajectory:
        return x, traj
    return x


def ddim_sample_loop(
    sched: DiffusionSchedule,
    model_fn: ModelFn,
    shape: tuple[int, ...],
    rng: jax.Array,
    *,
    eta: float = 0.0,
    mean_type: MeanType = MeanType.START_X,
    var_type: VarType = VarType.FIXED_SMALL,
    clip_denoised: bool = False,
    noise: jnp.ndarray | None = None,
    known_mask: jnp.ndarray | None = None,
    known_x0: jnp.ndarray | None = None,
    return_trajectory: bool = False,
):
    """Full DDIM ladder as one scan (replaces `ddim_sample_loop`,
    `gaussian_diffusion.py:871-914`).  `clip_denoised=False` is the trainer's
    setting (`trainers/ddpm_trainer.py:173,193`)."""
    step = partial(
        ddim_step, eta=eta, mean_type=mean_type, var_type=var_type,
        clip_denoised=clip_denoised,
    )
    return _sample_loop(
        step, sched, model_fn, shape, rng,
        noise=noise, known_mask=known_mask, known_x0=known_x0,
        return_trajectory=return_trajectory,
    )


def p_sample_loop(
    sched: DiffusionSchedule,
    model_fn: ModelFn,
    shape: tuple[int, ...],
    rng: jax.Array,
    *,
    mean_type: MeanType = MeanType.START_X,
    var_type: VarType = VarType.FIXED_SMALL,
    clip_denoised: bool = False,
    noise: jnp.ndarray | None = None,
    known_mask: jnp.ndarray | None = None,
    known_x0: jnp.ndarray | None = None,
    return_trajectory: bool = False,
):
    """Full ancestral ladder as one scan (replaces `p_sample_loop`,
    `gaussian_diffusion.py:667-727`)."""
    step = partial(
        ancestral_step, mean_type=mean_type, var_type=var_type,
        clip_denoised=clip_denoised,
    )
    return _sample_loop(
        step, sched, model_fn, shape, rng,
        noise=noise, known_mask=known_mask, known_x0=known_x0,
        return_trajectory=return_trajectory,
    )


def ddim_reverse_sample_loop(
    sched: DiffusionSchedule,
    model_fn: ModelFn,
    x0: jnp.ndarray,
    *,
    mean_type: MeanType = MeanType.START_X,
    var_type: VarType = VarType.FIXED_SMALL,
    clip_denoised: bool = False,
):
    """Deterministic DDIM encoding x_0 -> x_T (`gaussian_diffusion.py:833-869`),
    as one scan."""

    def body(x, t_scalar):
        t = jnp.full((x.shape[0],), t_scalar, dtype=jnp.int32)
        nd = x.ndim
        out = p_mean_variance(
            sched, model_fn, x, t,
            mean_type=mean_type, var_type=var_type, clip_denoised=clip_denoised,
        )
        eps = (
            extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x - out.pred_xstart
        ) / extract(sched.sqrt_recipm1_alphas_cumprod, t, nd)
        alpha_bar_next = extract(sched.alphas_cumprod_next, t, nd)
        mean_pred = (
            out.pred_xstart * jnp.sqrt(alpha_bar_next)
            + jnp.sqrt(1 - alpha_bar_next) * eps
        )
        return mean_pred, None

    timesteps = jnp.arange(sched.num_timesteps, dtype=jnp.int32)
    x, _ = jax.lax.scan(body, x0, timesteps)
    return x
