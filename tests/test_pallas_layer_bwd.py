"""Gradient parity of the fused training decoder layer.

A pure-jnp reference of the packed-weight layer (exactly the math of
`ops/pallas_layer._layer_kernel`) is differentiated with `jax.grad`; the
custom_vjp `fused_decoder_layer_train` must match every gradient —
dx, d_emb, d_kv_cross, d_mats, d_vecs, d_adaln_w, d_adaln_b.

Interpret mode on CPU: the identical kernel code path as TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conductor_tpu.ops.pallas_layer_bwd import fused_decoder_layer_train

D, E, H = 128, 512, 8
HEAD = D // H


def ref_layer(x, emb, kvc, mats, vecs, aw, ab):
    """Plain-jnp forward identical to `_layer_kernel` (f32, t_valid = T)."""
    f32 = jnp.float32
    seg = (
        (jnp.arange(D)[:, None] // HEAD) == (jnp.arange(D)[None, :] // HEAD)
    ).astype(f32)

    def ln(h, g, b):
        mu = h.mean(-1, keepdims=True)
        var = ((h - mu) ** 2).mean(-1, keepdims=True)
        return (h - mu) * jax.lax.rsqrt(var + 1e-5) * g + b

    def seg_softmax(q):
        qe = jnp.exp(q - q.max(-1, keepdims=True))
        return qe / (qe @ seg)

    def styl(y, scale, shift, g, b, w, bias):
        h = ln(y, g, b) * (1 + scale) + shift
        return jax.nn.silu(h) @ w + bias

    def one(xb, embb, kvcb):
        mod = embb @ aw + ab
        xn = ln(xb, vecs[0], vecs[1])
        q = xn @ mats[0] + vecs[2]
        k = xn @ mats[1] + vecs[3]
        v = xn @ mats[2] + vecs[4]
        qs = seg_softmax(q)
        ke = jnp.exp(k - k.max(0, keepdims=True))
        ks = ke / ke.sum(0, keepdims=True)
        kv = (ks.T @ v) * seg
        xb = xb + styl(qs @ kv, mod[:, :D], mod[:, D:2*D],
                       vecs[5], vecs[6], mats[3], vecs[7])
        xn2 = ln(xb, vecs[8], vecs[9])
        qc = seg_softmax(xn2 @ mats[4] + vecs[10])
        xb = xb + styl(qc @ kvcb, mod[:, 2*D:3*D], mod[:, 3*D:4*D],
                       vecs[11], vecs[12], mats[5], vecs[13])
        h1 = jax.nn.gelu(xb @ mats[6] + vecs[14])
        xb = xb + styl(h1 @ mats[7] + vecs[15], mod[:, 4*D:5*D],
                       mod[:, 5*D:6*D], vecs[16], vecs[17], mats[8], vecs[18])
        return xb

    return jax.vmap(one)(x, emb, kvc)


def make_inputs(rng, B=2, T=24):
    ks = jax.random.split(rng, 8)
    n = lambda i, shape, s=1.0: jax.random.normal(ks[i], shape) * s
    x = n(0, (B, T, D))
    emb = n(1, (B, T, E), 0.5)
    kvc = n(2, (B, D, D), 0.1)
    mats = n(3, (9, D, D), 0.08)
    vecs = n(4, (24, D), 0.3)
    # LN / styl gains near 1
    vecs = vecs.at[0].add(1.0).at[5].add(1.0).at[8].add(1.0)
    vecs = vecs.at[11].add(1.0).at[16].add(1.0)
    aw = n(5, (E, 6 * D), 0.02)
    ab = n(6, (6 * D,), 0.05)
    return x, emb, kvc, mats, vecs, aw, ab


def test_forward_matches_reference():
    args = make_inputs(jax.random.PRNGKey(0))
    want = ref_layer(*args)
    got = fused_decoder_layer_train(*args, H, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_gradients_match_reference():
    args = make_inputs(jax.random.PRNGKey(1))
    dy = jax.random.normal(jax.random.PRNGKey(2), args[0].shape)

    def loss_ref(*a):
        return (ref_layer(*a) * dy).sum()

    def loss_fused(*a):
        return (fused_decoder_layer_train(*a, H, jnp.float32) * dy).sum()

    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    g_fused = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    names = ["dx", "demb", "dkvc", "dmats", "dvecs", "daw", "dab"]
    for name, a, b in zip(names, g_ref, g_fused):
        scale = max(1.0, float(jnp.abs(a).max()))
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=3e-4 * scale, rtol=2e-3,
            err_msg=name,
        )


def test_gradients_nonuniform_T():
    """T not a multiple of 8 exercises the pad-row masking in the bwd."""
    args = make_inputs(jax.random.PRNGKey(3), B=1, T=21)
    dy = jax.random.normal(jax.random.PRNGKey(4), args[0].shape)
    g_ref = jax.grad(lambda *a: (ref_layer(*a) * dy).sum(), argnums=(0, 3))(*args)
    g_fused = jax.grad(
        lambda *a: (fused_decoder_layer_train(*a, H, jnp.float32) * dy).sum(),
        argnums=(0, 3),
    )(*args)
    for a, b in zip(g_ref, g_fused):
        scale = max(1.0, float(jnp.abs(a).max()))
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=3e-4 * scale, rtol=2e-3
        )
