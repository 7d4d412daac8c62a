"""Parity tests: fused Pallas linear attention vs the XLA einsum formulation.

On CPU the kernel runs in Pallas interpret mode (same code path, interpreted),
which is the standard JAX fake-backend pattern for TPU kernels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conductor_tpu.ops import (
    fused_linear_attention,
    linear_attention,
    qk_softmax,
    temporal_linear_attention,
)


def _xla(q, k, v, h, mask):
    if mask is not None:
        v = v * mask
    b, _, d = q.shape
    qs, ks = qk_softmax(q, k, h, mask)
    return linear_attention(qs, ks, v.reshape(b, -1, h, d // h))


@pytest.mark.parametrize("tq,tk,d,h", [(64, 64, 128, 8), (60, 20, 128, 8), (33, 17, 64, 4)])
def test_fused_matches_xla_no_mask(tq, tk, d, h):
    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (2, tq, d))
    k = jax.random.normal(kk, (2, tk, d))
    v = jax.random.normal(kv, (2, tk, d))
    got = fused_linear_attention(q, k, v, h)
    want = _xla(q, k, v, h, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_matches_xla_with_mask():
    rng = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(rng, 3)
    b, t, d, h = 2, 50, 128, 8
    q = jax.random.normal(kq, (b, t, d))
    k = jax.random.normal(kk, (b, t, d))
    v = jax.random.normal(kv, (b, t, d))
    length = jnp.array([50, 20])
    mask = (jnp.arange(t)[None, :] < length[:, None]).astype(jnp.float32)[..., None]
    got = fused_linear_attention(q, k, v, h, mask)
    want = _xla(q, k, v, h, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_dispatcher_impls_agree():
    rng = jax.random.PRNGKey(2)
    kq, kk, kv = jax.random.split(rng, 3)
    b, t, d, h = 1, 40, 128, 8
    q = jax.random.normal(kq, (b, t, d))
    k = jax.random.normal(kk, (b, t, d))
    v = jax.random.normal(kv, (b, t, d))
    mask = jnp.ones((b, t, 1))
    a = temporal_linear_attention(q, k, v, h, mask, impl="xla")
    p = temporal_linear_attention(q, k, v, h, mask, impl="pallas")
    np.testing.assert_allclose(np.asarray(a), np.asarray(p), atol=1e-5)


def test_fused_gradients_match_xla():
    rng = jax.random.PRNGKey(3)
    kq, kk, kv = jax.random.split(rng, 3)
    b, t, d, h = 1, 24, 128, 8
    q = jax.random.normal(kq, (b, t, d))
    k = jax.random.normal(kk, (b, t, d))
    v = jax.random.normal(kv, (b, t, d))

    def loss_fused(q, k, v):
        return jnp.sum(fused_linear_attention(q, k, v, h) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(_xla(q, k, v, h, None) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_fused_jits_inside_model_path():
    # the exact call pattern the denoiser layers use, under jit
    b, t, d, h = 2, 30, 128, 8
    rng = jax.random.PRNGKey(4)
    q = jax.random.normal(rng, (b, t, d))
    mask = jnp.ones((b, t, 1))

    @jax.jit
    def f(q):
        return temporal_linear_attention(q, q, q, h, mask, impl="pallas")

    out = f(q)
    assert out.shape == (b, t, d)
    assert bool(jnp.all(jnp.isfinite(out)))
