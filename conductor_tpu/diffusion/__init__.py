"""Diffusion engine: schedules, Gaussian math, scan samplers, t-samplers."""

from .gaussian import (  # noqa: F401
    LossKind,
    MeanType,
    VarType,
    calc_bpd_loop,
    extract,
    mean_flat,
    normal_kl,
    p_mean_variance,
    predict_eps_from_xstart,
    predict_xstart_from_eps,
    predict_xstart_from_xprev,
    q_mean_variance,
    q_posterior_mean_variance,
    prior_bpd,
    q_sample,
    training_losses,
    vb_terms_bpd,
)
from .sampling import (  # noqa: F401
    ancestral_step,
    ddim_reverse_sample_loop,
    ddim_sample_loop,
    ddim_step,
    p_sample_loop,
)
from .schedule import (  # noqa: F401
    DiffusionSchedule,
    get_named_beta_schedule,
    make_schedule,
    respaced_schedule,
    schedule_from_betas,
    space_timesteps,
)
from . import timestep_samplers  # noqa: F401
