"""Timestep schedule samplers (uniform + loss-second-moment importance).

Functional re-design of `Diffusion_Stage/models/gaussian_diffusion.py:16-152`.
The reference's `LossAwareSampler.update_with_local_losses` synchronizes loss
history across ranks with explicit `dist.all_gather` calls (`:85-106`); here
the sampler state is an ordinary pytree carried in the train state, and under
pjit the per-batch timesteps/losses are *global* sharded arrays, so a single
jitted update keeps every host consistent — the collective is implicit in the
sharding (no NCCL plumbing).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SamplerState(NamedTuple):
    """Loss-history ring buffer per timestep (`LossSecondMomentResampler`,
    `gaussian_diffusion.py:122-152`)."""

    loss_history: jnp.ndarray  # (num_timesteps, history_per_term) f32
    loss_counts: jnp.ndarray   # (num_timesteps,) i32


def init_state(num_timesteps: int, history_per_term: int = 10) -> SamplerState:
    return SamplerState(
        loss_history=jnp.zeros((num_timesteps, history_per_term), jnp.float32),
        loss_counts=jnp.zeros((num_timesteps,), jnp.int32),
    )


def uniform_sample(rng: jax.Array, num_timesteps: int, batch: int):
    """UniformSampler (`gaussian_diffusion.py:65-71`): uniform t, unit weights."""
    t = jax.random.randint(rng, (batch,), 0, num_timesteps)
    return t, jnp.ones((batch,), jnp.float32)


def _weights(state: SamplerState, uniform_prob: float) -> jnp.ndarray:
    """Importance weights from loss second moments (`gaussian_diffusion.py:132-139`),
    falling back to uniform until every timestep has a full history."""
    history_per_term = state.loss_history.shape[1]
    warmed_up = jnp.all(state.loss_counts == history_per_term)
    w = jnp.sqrt(jnp.mean(state.loss_history**2, axis=-1))
    w = w / jnp.maximum(jnp.sum(w), 1e-12)
    w = w * (1 - uniform_prob) + uniform_prob / w.shape[0]
    uniform = jnp.full((w.shape[0],), 1.0 / w.shape[0], jnp.float32)
    return jnp.where(warmed_up, w, uniform)


def loss_aware_sample(
    state: SamplerState, rng: jax.Array, batch: int, uniform_prob: float = 0.001
):
    """Importance-sample t from the loss history; returns (t, 1/(T·p[t]))
    unbiasing weights (`ScheduleSampler.sample`, `gaussian_diffusion.py:47-62`)."""
    p = _weights(state, uniform_prob)
    t = jax.random.categorical(rng, jnp.log(p), shape=(batch,))
    weights = 1.0 / (p.shape[0] * p[t])
    return t, weights


def update_state(state: SamplerState, t: jnp.ndarray, losses: jnp.ndarray) -> SamplerState:
    """Append (t, loss) pairs to the per-timestep ring buffers
    (`update_with_all_losses`, `gaussian_diffusion.py:141-149`).

    Processed sequentially (batch entries may repeat a timestep), matching the
    reference's Python loop; batch sizes are small so the fori_loop is cheap.
    """
    history_per_term = state.loss_history.shape[1]

    def body(i, s):
        hist, counts = s
        ti = t[i]
        li = losses[i]
        full = counts[ti] == history_per_term
        row = hist[ti]
        shifted = jnp.concatenate([row[1:], li[None]])
        appended = jax.lax.dynamic_update_index_in_dim(
            row, li, jnp.minimum(counts[ti], history_per_term - 1), axis=0
        )
        new_row = jnp.where(full, shifted, appended)
        hist = hist.at[ti].set(new_row)
        counts = counts.at[ti].set(jnp.where(full, counts[ti], counts[ti] + 1))
        return hist, counts

    hist, counts = jax.lax.fori_loop(
        0, t.shape[0], body, (state.loss_history, state.loss_counts)
    )
    return SamplerState(hist, counts)
