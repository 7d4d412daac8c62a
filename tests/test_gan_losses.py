"""Stage-1 GAN loss library: all GP interpolation terms + perceptual losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conductor_tpu.train.losses import (
    GP_TERMS,
    feature_matching_loss,
    gradient_penalty,
    sync_loss,
)


def quadratic_critic(x):
    # D(x) = sum(x^2)/2 per sample -> grad = x, known closed-form penalties
    return 0.5 * (x**2).sum(axis=(1, 2, 3))


@pytest.fixture
def data():
    rng = jax.random.PRNGKey(0)
    r1, r2, r3 = jax.random.split(rng, 3)
    real = jax.random.normal(r1, (4, 30, 13, 2))
    fake = jax.random.normal(r2, (4, 30, 13, 2))
    return real, fake, r3


@pytest.mark.parametrize("term", GP_TERMS)
def test_each_term_finite_positive(data, term):
    real, fake, rng = data
    gp = gradient_penalty(quadratic_critic, real, fake, rng, terms=(term,))
    assert np.isfinite(float(gp)) and float(gp) > 0


def test_real_fake_closed_form(data):
    real, fake, rng = data
    # grad of quadratic critic at interp is interp itself -> GP = sum(interp^2)
    alpha = jax.random.uniform(jax.random.split(rng)[1], (real.shape[0], 1, 1, 1))
    interp = alpha * real + (1 - alpha) * fake
    want = float((interp**2).sum())
    got = float(
        gradient_penalty(quadratic_critic, real, fake, rng, terms=("real_fake",))
    )
    assert got == pytest.approx(want, rel=1e-5)


def test_all_terms_sum(data):
    real, fake, rng = data
    total = float(gradient_penalty(quadratic_critic, real, fake, rng, terms=GP_TERMS))
    assert total > float(
        gradient_penalty(quadratic_critic, real, fake, rng, terms=("real_fake",))
    )


def test_gp_differentiable_for_critic_training(data):
    """The GP must be differentiable w.r.t. critic params (grad-of-grad)."""
    real, fake, rng = data
    w0 = jnp.ones(())

    def loss(w):
        return gradient_penalty(
            lambda x: (w * x**2).sum(axis=(1, 2, 3)), real, fake, rng,
            terms=("real_fake",),
        )

    g = jax.grad(loss)(w0)
    assert np.isfinite(float(g)) and float(g) != 0


def test_sync_and_feature_matching():
    feats = lambda m: [m * 2.0, m.sum(axis=-1)]
    fake = jnp.ones((2, 10, 4))
    real = jnp.zeros((2, 10, 4))
    assert float(sync_loss(feats, fake, real)) == pytest.approx(4.0)
    # MSE over both features: (2-0)^2 and (4-0)^2
    assert float(feature_matching_loss(feats, fake, real)) == pytest.approx(4.0 + 16.0)


def test_sync_stops_real_gradient():
    feats = lambda m: [m]
    fake = jnp.ones((1, 2, 2))
    real = jnp.ones((1, 2, 2)) * 3

    g_fake = jax.grad(lambda f: sync_loss(feats, f, real))(fake)
    g_real = jax.grad(lambda r: sync_loss(feats, fake, r))(real)
    assert float(jnp.abs(g_fake).sum()) > 0
    assert float(jnp.abs(g_real).sum()) == 0
