"""Fused frozen ST-GCN kernel: value + input-gradient parity with the flax
`MotionEncoderSTGCN` in eval mode (interpret mode on CPU — the TPU code
path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conductor_tpu.models.graph import build_adjacency
from conductor_tpu.models.stgcn import MotionEncoderSTGCN
from conductor_tpu.ops.pallas_stgcn import fused_frozen_stgcn, pack_frozen_stgcn


@pytest.fixture(scope="module")
def setup():
    rng = jax.random.PRNGKey(0)
    enc = MotionEncoderSTGCN()
    motion = jax.random.uniform(rng, (2, 21, 13, 2))
    variables = enc.init(rng, motion)
    # randomize BN stats so the affine folding is actually exercised
    stats = jax.tree_util.tree_map(
        lambda a: a + jax.random.uniform(jax.random.PRNGKey(1), a.shape) * 0.3
        + 0.05,
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}
    A = build_adjacency("ConductorMotionX", "uniform")
    pack = pack_frozen_stgcn(variables, A, mxu_dtype=jnp.float32)
    return enc, variables, pack, motion


def test_forward_matches_flax(setup):
    enc, variables, pack, motion = setup
    want = enc.apply(variables, motion)
    got = fused_frozen_stgcn(motion, pack, jnp.float32)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-3
    )


def test_input_gradient_matches_flax(setup):
    enc, variables, pack, motion = setup
    dy = jax.random.normal(jax.random.PRNGKey(2), (2, 21, 64))

    g_ref = jax.grad(
        lambda m: (enc.apply(variables, m) * dy).sum()
    )(motion)
    g_fused = jax.grad(
        lambda m: (fused_frozen_stgcn(m, pack, jnp.float32) * dy).sum()
    )(motion)
    scale = float(jnp.abs(g_ref).max())
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref),
        atol=3e-4 * max(scale, 1.0), rtol=2e-3,
    )


def test_row_padding_independence(setup):
    """T not a multiple of 8: pad rows must not leak into real rows."""
    enc, variables, pack, motion = setup
    want = enc.apply(variables, motion[:, :17])
    got = fused_frozen_stgcn(motion[:, :17], pack, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-3
    )
