"""Pallas max-pool kernel + conv-kernel pool epilogue: exact parity with
`flax.linen.max_pool` (interpret mode on CPU — same code path as TPU).

The three cases are the music encoder's pool stages
(reference `Contrastive_Stage/models/MusicEncoder.py:30-53`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from conductor_tpu.ops.pallas_conv import fused_conv_block
from conductor_tpu.ops.pallas_pool import fused_max_pool

POOLS = [
    # (C, F, T, window, strides, padding) — T shrunk from the real 5400/1800
    (16, 128, 180, (5, 5), (1, 2), ((2, 2), (2, 2))),
    (32, 64, 180, (5, 5), (3, 2), ((2, 2), (2, 2))),
    (32, 32, 60, (3, 3), (1, 2), ((1, 1), (1, 1))),
]


@pytest.mark.parametrize("c,f,t,window,strides,padding", POOLS)
def test_pool_matches_flax(c, f, t, window, strides, padding):
    rng = jax.random.PRNGKey(c + t)
    x = jax.random.normal(rng, (2, t, f, c))
    want = nn.max_pool(x, window, strides=strides, padding=padding)
    got = fused_max_pool(x, window, strides, padding)
    assert got.shape == want.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("c,f,t,window,strides,padding", POOLS)
def test_conv_pool_epilogue_matches_separate(c, f, t, window, strides, padding):
    """conv(pool=...) == conv() then max_pool, bit-exact (same conv kernel,
    pool in the epilogue)."""
    rng = jax.random.PRNGKey(7 * c + t)
    ks = jax.random.split(rng, 4)
    x = jax.random.normal(ks[0], (2, t, f, c))
    kernel = jax.random.normal(ks[1], (3, 3, c, c)) * 0.1
    scale = jax.random.normal(ks[2], (c,)) * 0.1 + 1.0
    bias = jax.random.normal(ks[3], (c,)) * 0.1

    y = fused_conv_block(x, kernel, scale, bias, res_mode=1, mxu_dtype=jnp.float32)
    want = nn.max_pool(y, window, strides=strides, padding=padding)
    got = fused_conv_block(
        x, kernel, scale, bias, res_mode=1, mxu_dtype=jnp.float32,
        pool=(window, strides, padding),
    )
    assert got.shape == want.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pool_odd_tile_sizes():
    """t_out that forces the tile-halving path, both strides."""
    rng = jax.random.PRNGKey(3)
    for c, f, t, window, strides, padding in [
        (16, 128, 90, (5, 5), (1, 2), ((2, 2), (2, 2))),
        (32, 64, 90, (5, 5), (3, 2), ((2, 2), (2, 2))),
    ]:
        x = jax.random.normal(rng, (1, t, f, c))
        want = nn.max_pool(x, window, strides=strides, padding=padding)
        got = fused_max_pool(x, window, strides, padding)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
