"""Stage-1 GAN loss library (reference `Contrastive_Stage/utils/loss.py`).

All five WGAN-GP interpolation terms (`loss.py:65-125` — the default training
only uses 'real_fake', `M2SGAN_train.py:99-100`), plus the perceptual losses
over the frozen M2SNet motion-encoder feature stack.  Pure functions:
grad-through-critic is plain `jax.grad` (the torch original needs
double-backward `autograd.grad` plumbing).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

GP_TERMS = ("real", "fake", "real_fake", "real_motion", "fake_motion")


def gradient_penalty(
    d_fn: Callable[[jnp.ndarray], jnp.ndarray],
    real: jnp.ndarray,
    fake: jnp.ndarray,
    rng: jax.Array,
    terms: Sequence[str] = ("real_fake",),
) -> jnp.ndarray:
    """WGAN-GP penalty with the reference's interpolation menu
    (`loss.py:65-125`, center 0).

    - 'real' / 'fake': gradient norm at the data points (per-sample, norm
      over the time axis as in the torch `norm(2, dim=1)`);
    - 'real_motion' / 'fake_motion': motion/structure decomposition — the
      per-frame deviation of one distribution mixed with the temporal mean
      ("structure") of both;
    - 'real_fake': classic straight-line interpolation, whole-tensor norm.
    """

    def grad_at(x):
        return jax.grad(lambda z: d_fn(z).sum())(x)

    def per_sample_sq_norm(g):
        # torch `norm(2, dim=1)` over time, then squared mean over the rest
        return (jnp.sqrt((g**2).sum(axis=1)) ** 2).mean()

    loss = 0.0
    if "real" in terms:
        loss += per_sample_sq_norm(grad_at(real))
    if "fake" in terms:
        loss += per_sample_sq_norm(grad_at(fake))
    if "real_motion" in terms:
        rng, key = jax.random.split(rng)
        alpha = jax.random.uniform(key, ())
        real_motion = real - real.mean(axis=1, keepdims=True)
        real_structure = real.mean(axis=1, keepdims=True)
        fake_structure = fake.mean(axis=1, keepdims=True)
        x = alpha * real_motion + alpha * fake_structure + (1 - alpha) * real_structure
        loss += per_sample_sq_norm(grad_at(x))
    if "fake_motion" in terms:
        rng, key = jax.random.split(rng)
        alpha = jax.random.uniform(key, ())
        fake_motion = fake - fake.mean(axis=1, keepdims=True)
        real_structure = real.mean(axis=1, keepdims=True)
        fake_structure = fake.mean(axis=1, keepdims=True)
        x = alpha * fake_motion + alpha * fake_structure + (1 - alpha) * real_structure
        loss += per_sample_sq_norm(grad_at(x))
    if "real_fake" in terms:
        rng, key = jax.random.split(rng)
        alpha = jax.random.uniform(key, (real.shape[0], 1, 1, 1))
        interp = alpha * real + (1 - alpha) * fake
        g = grad_at(interp)
        # whole-tensor norm, center 0 -> sum of squared entries (`loss.py:114-123`)
        loss += (g**2).sum()
    return loss


def sync_loss(features_fn: Callable, fake: jnp.ndarray, real: jnp.ndarray) -> jnp.ndarray:
    """L1 on the LAST frozen motion-encoder feature (`loss.py:30-46`)."""
    ff = features_fn(fake)[-1]
    rf = jax.lax.stop_gradient(features_fn(real)[-1])
    return jnp.abs(ff - rf).mean()


def feature_matching_loss(
    features_fn: Callable, fake: jnp.ndarray, real: jnp.ndarray
) -> jnp.ndarray:
    """MSE over the FULL frozen feature stack (`loss.py:10-23`
    `FeatureMatchingLoss`)."""
    ff = features_fn(fake)
    rf = features_fn(real)
    loss = 0.0
    for f, r in zip(ff, rf):
        loss += ((f - jax.lax.stop_gradient(r)) ** 2).mean()
    return loss
