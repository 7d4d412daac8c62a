"""Functional Gaussian-diffusion math (q/p distributions, losses).

TPU-first re-design of the guided-diffusion engine the reference carries as a
1182-line class (`Diffusion_Stage/models/gaussian_diffusion.py:311-1181`): here
every operation is a pure function of a `DiffusionSchedule` pytree so the whole
thing composes with `jit`, `grad`, `vmap`, and `lax.scan`.  The model is a
plain callable ``model_fn(x, t) -> output`` with conditioning closed over,
replacing torch ``model_kwargs`` plumbing.

Numerical semantics (mean types, variance types, posterior coefficients,
x0/eps conversions, the velocity loss terms over hard-coded channel groups)
match the reference exactly; see per-function citations.
"""

from __future__ import annotations

import enum
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .schedule import DiffusionSchedule


class MeanType(enum.Enum):
    """What the denoiser predicts (`gaussian_diffusion.py:275-282`)."""

    PREVIOUS_X = "previous_x"
    START_X = "start_x"
    EPSILON = "epsilon"


class VarType(enum.Enum):
    """Reverse-process variance parameterization (`gaussian_diffusion.py:285-296`)."""

    LEARNED = "learned"
    FIXED_SMALL = "fixed_small"
    FIXED_LARGE = "fixed_large"
    LEARNED_RANGE = "learned_range"


class LossKind(enum.Enum):
    MSE = "mse"
    RESCALED_MSE = "rescaled_mse"
    KL = "kl"
    RESCALED_KL = "rescaled_kl"


ModelFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]

# Channel groups of the (T, 26) flattened pose used by the velocity losses
# (`gaussian_diffusion.py:1075-1077`).  Channel layout is joint-major pairs
# (x0,y0,x1,y1,...): head = joints 0-4 (+x of 5,6 per the reference's
# hard-coded [0..9]), elbow = joints 7-10, body = joints 5,6,11,12.
HEAD_CHANNELS = tuple(range(0, 10))
BODY_CHANNELS = (10, 11, 12, 13, 22, 23, 24, 25)
ELBOW_CHANNELS = tuple(range(14, 22))


def extract(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep coefficients and broadcast to an ndim-rank operand
    (replaces `_extract_into_tensor`, `gaussian_diffusion.py:1168-1181`)."""
    out = table[t]
    return out.reshape(out.shape + (1,) * (ndim - 1))


def q_mean_variance(sched: DiffusionSchedule, x_start: jnp.ndarray, t: jnp.ndarray):
    """q(x_t | x_0) moments (`gaussian_diffusion.py:381-396`)."""
    nd = x_start.ndim
    mean = extract(sched.sqrt_alphas_cumprod, t, nd) * x_start
    variance = extract(1.0 - sched.alphas_cumprod, t, nd)
    log_variance = extract(sched.log_one_minus_alphas_cumprod, t, nd)
    return mean, variance, log_variance


def q_sample(
    sched: DiffusionSchedule, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
) -> jnp.ndarray:
    """Sample q(x_t | x_0) (`gaussian_diffusion.py:398-416`)."""
    nd = x_start.ndim
    return (
        extract(sched.sqrt_alphas_cumprod, t, nd) * x_start
        + extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * noise
    )


def q_posterior_mean_variance(
    sched: DiffusionSchedule, x_start: jnp.ndarray, x_t: jnp.ndarray, t: jnp.ndarray
):
    """q(x_{t-1} | x_t, x_0) moments (`gaussian_diffusion.py:418-440`)."""
    nd = x_t.ndim
    mean = (
        extract(sched.posterior_mean_coef1, t, nd) * x_start
        + extract(sched.posterior_mean_coef2, t, nd) * x_t
    )
    variance = extract(sched.posterior_variance, t, nd)
    log_variance = extract(sched.posterior_log_variance_clipped, t, nd)
    return mean, variance, log_variance


def predict_xstart_from_eps(sched, x_t, t, eps):
    nd = x_t.ndim
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t
        - extract(sched.sqrt_recipm1_alphas_cumprod, t, nd) * eps
    )


def predict_eps_from_xstart(sched, x_t, t, pred_xstart):
    nd = x_t.ndim
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t - pred_xstart
    ) / extract(sched.sqrt_recipm1_alphas_cumprod, t, nd)


def predict_xstart_from_xprev(sched, x_t, t, xprev):
    nd = x_t.ndim
    return (
        extract(1.0 / sched.posterior_mean_coef1, t, nd) * xprev
        - extract(sched.posterior_mean_coef2 / sched.posterior_mean_coef1, t, nd) * x_t
    )


def model_timesteps(sched: DiffusionSchedule, t: jnp.ndarray) -> jnp.ndarray:
    """Map respaced-ladder indices to original-ladder timesteps for the model."""
    return sched.timestep_map[t]


class PMeanVariance(NamedTuple):
    mean: jnp.ndarray
    variance: jnp.ndarray
    log_variance: jnp.ndarray
    pred_xstart: jnp.ndarray


def p_mean_variance(
    sched: DiffusionSchedule,
    model_fn: ModelFn,
    x: jnp.ndarray,
    t: jnp.ndarray,
    *,
    mean_type: MeanType = MeanType.START_X,
    var_type: VarType = VarType.FIXED_SMALL,
    clip_denoised: bool = False,
    denoised_fn: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
) -> PMeanVariance:
    """p(x_{t-1} | x_t) moments plus the x0 prediction
    (`gaussian_diffusion.py:442-536`).

    ``t`` indexes the (possibly respaced) schedule; the model receives
    original-ladder timesteps via ``timestep_map``.
    """
    nd = x.ndim
    model_output = model_fn(x, model_timesteps(sched, t))

    if var_type in (VarType.LEARNED, VarType.LEARNED_RANGE):
        model_output, model_var_values = jnp.split(model_output, 2, axis=-1)
        if var_type == VarType.LEARNED:
            model_log_variance = model_var_values
            model_variance = jnp.exp(model_log_variance)
        else:
            min_log = extract(sched.posterior_log_variance_clipped, t, nd)
            max_log = extract(jnp.log(sched.betas), t, nd)
            frac = (model_var_values + 1) / 2
            model_log_variance = frac * max_log + (1 - frac) * min_log
            model_variance = jnp.exp(model_log_variance)
    elif var_type == VarType.FIXED_SMALL:
        model_variance = extract(sched.posterior_variance, t, nd)
        model_log_variance = extract(sched.posterior_log_variance_clipped, t, nd)
    elif var_type == VarType.FIXED_LARGE:
        model_variance = extract(sched.fixed_large_variance, t, nd)
        model_log_variance = extract(sched.fixed_large_log_variance, t, nd)
    else:
        raise NotImplementedError(var_type)

    def process_xstart(x0):
        if denoised_fn is not None:
            x0 = denoised_fn(x0)
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        return x0

    if mean_type == MeanType.PREVIOUS_X:
        pred_xstart = process_xstart(predict_xstart_from_xprev(sched, x, t, model_output))
        model_mean = model_output
    elif mean_type == MeanType.START_X:
        pred_xstart = process_xstart(model_output)
        model_mean, _, _ = q_posterior_mean_variance(sched, pred_xstart, x, t)
    elif mean_type == MeanType.EPSILON:
        pred_xstart = process_xstart(predict_xstart_from_eps(sched, x, t, model_output))
        model_mean, _, _ = q_posterior_mean_variance(sched, pred_xstart, x, t)
    else:
        raise NotImplementedError(mean_type)

    return PMeanVariance(model_mean, model_variance, model_log_variance, pred_xstart)


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL between two diagonal Gaussians (guided-diffusion `losses.py`)."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi) * (x + 0.044715 * x**3)))


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of a discretized Gaussian (guided-diffusion `losses.py`),
    used by the VLB terms (`gaussian_diffusion.py:989-995`)."""
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    log_probs = jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min, jnp.log(jnp.clip(cdf_delta, min=1e-12))),
    )
    return log_probs


def mean_flat(x: jnp.ndarray) -> jnp.ndarray:
    """Mean over all non-batch axes (`gaussian_diffusion.py:155-159`)."""
    return x.mean(axis=tuple(range(1, x.ndim)))


def vb_terms_bpd(
    sched: DiffusionSchedule,
    model_fn: ModelFn,
    x_start: jnp.ndarray,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    *,
    mean_type: MeanType = MeanType.START_X,
    var_type: VarType = VarType.FIXED_SMALL,
    clip_denoised: bool = True,
):
    """One VLB term in bits-per-dim (`gaussian_diffusion.py:967-1000`)."""
    true_mean, _, true_log_var = q_posterior_mean_variance(sched, x_start, x_t, t)
    out = p_mean_variance(
        sched, model_fn, x_t, t,
        mean_type=mean_type, var_type=var_type, clip_denoised=clip_denoised,
    )
    kl = mean_flat(normal_kl(true_mean, true_log_var, out.mean, out.log_variance)) / jnp.log(2.0)
    decoder_nll = -discretized_gaussian_log_likelihood(
        x_start, means=out.mean, log_scales=0.5 * out.log_variance
    )
    decoder_nll = mean_flat(decoder_nll) / jnp.log(2.0)
    output = jnp.where(t == 0, decoder_nll, kl)
    return output, out.pred_xstart


def training_losses(
    sched: DiffusionSchedule,
    model_fn: ModelFn,
    x_start: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
    *,
    mean_type: MeanType = MeanType.START_X,
    var_type: VarType = VarType.FIXED_SMALL,
    loss_kind: LossKind = LossKind.MSE,
) -> dict[str, jnp.ndarray]:
    """Training terms for every LossType branch
    (`gaussian_diffusion.py:1002-1090`).

    MSE family: ``x_start`` is (B, T, J, 2) or already-flat (B, T, 26);
    targets/preds are returned flat.  Velocity terms use the reference's
    hard-coded channel groups (`:1075-1083`).  Returns per-batch ``mse`` (B,),
    scalar velocity terms, and flat ``target`` / ``pred`` for external
    (masked/feature) losses.  With a LEARNED/LEARNED_RANGE variance the VLB
    term is returned as ``vb`` with the mean frozen (`:1037-1057`).

    KL family (`:1023-1033`): returns the per-batch VLB term as ``loss``
    (×num_timesteps for RESCALED_KL).
    """
    x_t = q_sample(sched, x_start, t, noise)

    if loss_kind in (LossKind.KL, LossKind.RESCALED_KL):
        out, _ = vb_terms_bpd(
            sched, model_fn, x_start, x_t, t,
            mean_type=mean_type, var_type=var_type, clip_denoised=False,
        )
        if loss_kind == LossKind.RESCALED_KL:
            out = out * sched.num_timesteps
        return {"loss": out}

    model_output = model_fn(x_t, model_timesteps(sched, t))

    terms_extra: dict[str, jnp.ndarray] = {}
    if var_type in (VarType.LEARNED, VarType.LEARNED_RANGE):
        # learn the variance via the VLB without letting it move the mean
        # prediction (`gaussian_diffusion.py:1044-1053`)
        model_output, model_var_values = jnp.split(model_output, 2, axis=-1)
        frozen = jnp.concatenate(
            [jax.lax.stop_gradient(model_output), model_var_values], axis=-1
        )
        vb, _ = vb_terms_bpd(
            sched, lambda *_: frozen, x_start, x_t, t,
            mean_type=mean_type, var_type=var_type, clip_denoised=False,
        )
        if loss_kind == LossKind.RESCALED_MSE:
            vb = vb * (sched.num_timesteps / 1000.0)  # (`:1054-1057`)
        terms_extra["vb"] = vb

    if mean_type == MeanType.PREVIOUS_X:
        target = q_posterior_mean_variance(sched, x_start, x_t, t)[0]
    elif mean_type == MeanType.START_X:
        target = x_start
    elif mean_type == MeanType.EPSILON:
        target = noise
    else:
        raise NotImplementedError(mean_type)

    if target.ndim == 4:  # (B, T, J, 2) -> (B, T, J*2)  (`:1067-1068`)
        target = target.reshape(target.shape[0], target.shape[1], -1)
    if model_output.ndim == 4:
        model_output = model_output.reshape(model_output.shape[0], model_output.shape[1], -1)

    body = jnp.asarray(BODY_CHANNELS)
    elbow = jnp.asarray(ELBOW_CHANNELS)
    head = jnp.asarray(HEAD_CHANNELS)

    def vel(x):
        return x[:, 1:] - x[:, :-1]

    terms = {
        "mse": mean_flat((target - model_output) ** 2),
        "velocity_body": mean_flat(vel(model_output[..., body]) ** 2).mean(),
        "velocity_elbow": mean_flat(vel(model_output[..., elbow]) ** 2).mean(),
        "velocity_head": mean_flat(vel(model_output[..., head]) ** 2).mean(),
        "velocity": mean_flat((vel(target) - vel(model_output)) ** 2).mean(),
        "target": target,
        "pred": model_output,
        **terms_extra,
    }
    return terms


def prior_bpd(sched: DiffusionSchedule, x_start: jnp.ndarray) -> jnp.ndarray:
    """Prior KL term of the VLB in bits-per-dim, per batch element
    (`gaussian_diffusion.py:1092-1108`)."""
    B = x_start.shape[0]
    t = jnp.full((B,), sched.num_timesteps - 1, jnp.int32)
    qt_mean, _, qt_log_var = q_mean_variance(sched, x_start, t)
    kl = normal_kl(qt_mean, qt_log_var, 0.0, 0.0)
    return mean_flat(kl) / jnp.log(2.0)


def calc_bpd_loop(
    sched: DiffusionSchedule,
    model_fn: ModelFn,
    x_start: jnp.ndarray,
    rng: jax.Array,
    *,
    mean_type: MeanType = MeanType.START_X,
    var_type: VarType = VarType.FIXED_SMALL,
    clip_denoised: bool = True,
) -> dict[str, jnp.ndarray]:
    """Full VLB in bits-per-dim (`gaussian_diffusion.py:1110-1165`).

    The reference's T-iteration Python loop (T host dispatches, one fresh
    noise draw each) becomes a single ``lax.scan`` over the time ladder —
    one compiled program.  Returns ``total_bpd``/``prior_bpd`` (B,) and
    ``vb``/``xstart_mse``/``mse`` (B, T) ordered t descending like the
    reference (index 0 = t of T-1).
    """
    B = x_start.shape[0]

    def step(carry_rng, t_scalar):
        rng_t, rng_next = jax.random.split(carry_rng)
        t = jnp.full((B,), t_scalar, jnp.int32)
        noise = jax.random.normal(rng_t, x_start.shape, x_start.dtype)
        x_t = q_sample(sched, x_start, t, noise)
        out, pred_xstart = vb_terms_bpd(
            sched, model_fn, x_start, x_t, t,
            mean_type=mean_type, var_type=var_type, clip_denoised=clip_denoised,
        )
        eps = predict_eps_from_xstart(sched, x_t, t, pred_xstart)
        return rng_next, (
            out,
            mean_flat((pred_xstart - x_start) ** 2),
            mean_flat((eps - noise) ** 2),
        )

    ts = jnp.arange(sched.num_timesteps - 1, -1, -1)
    _, (vb, xstart_mse, mse) = jax.lax.scan(step, rng, ts)

    pb = prior_bpd(sched, x_start)
    return {
        "total_bpd": vb.sum(axis=0) + pb,
        "prior_bpd": pb,
        "vb": vb.T,
        "xstart_mse": xstart_mse.T,
        "mse": mse.T,
    }
