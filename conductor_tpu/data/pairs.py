"""Contrastive pair sampling for M2S learning (jit-friendly).

Rebuild of reference `Contrastive_Stage/utils/train_utils.py:14-89`
(PairBuilder) as a pure function: strategy is static, window starts are drawn
from a JAX key, and clips are cut with `dynamic_slice` so the whole thing
lives inside the jitted train step (the reference slices on host and pays a
H2D copy per pair, `train_utils.py:39-42`).

Difficulty levels (`train_utils.py:27-89`):
- easy: same window, partner drawn from a *different* batch item (batch flip);
- hard: same clip, two windows >= 10 s apart;
- super_hard: same clip, second window shifted by a small offset (the
  reference's code draws the offset from [0, 4.5) s although its comment says
  0.5-5 s — we replicate the code).

Starts are sampled on the 30 Hz motion grid and scaled x3 for mel, so the
music/motion crops are exactly aligned (the reference floors float seconds
into the two rates independently, which can misalign them by <1 frame).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MEL_HZ = 90
MOTION_HZ = 30
RATIO = MEL_HZ // MOTION_HZ

STRATEGIES = ("easy", "hard", "super_hard")


def _cut(music, motion, start30, clip_frames30):
    m = jax.lax.dynamic_slice_in_dim(music, start30 * RATIO, clip_frames30 * RATIO, axis=1)
    p = jax.lax.dynamic_slice_in_dim(motion, start30, clip_frames30, axis=1)
    return m, p


def build_pairs(
    rng: jax.Array,
    music: jnp.ndarray,     # (B, S*90, 128)
    motion: jnp.ndarray,    # (B, S*30, 13, 2)
    strategy: str,
    sample_length: int,     # S seconds
    clip_length: int,       # C seconds, C <= S/3
):
    """Returns (music_1, music_2, motion_1, motion_2), each a C-second crop."""
    assert strategy in STRATEGIES, strategy
    if clip_length > sample_length / 3:
        raise ValueError("clip_length must be <= sample_length/3")
    S, C = sample_length, clip_length
    c30 = C * MOTION_HZ
    k1, k2 = jax.random.split(rng)

    def sec30(key, lo_sec, hi_sec):
        """Uniform start on the 30 Hz grid within [lo_sec, hi_sec]."""
        lo, hi = jnp.int32(lo_sec * MOTION_HZ), jnp.int32(hi_sec * MOTION_HZ)
        return jax.random.randint(key, (), lo, jnp.maximum(hi, lo + 1))

    if strategy == "easy":
        start = sec30(k1, 0, S - C)
        m1, p1 = _cut(music, motion, start, c30)
        return m1, jnp.flip(m1, axis=0), p1, jnp.flip(p1, axis=0)

    if strategy == "hard":
        start_1 = sec30(k1, 0, S - C - 10)
        # start_2 in [start_1 + 10, S - C]
        hi = jnp.int32((S - C) * MOTION_HZ)
        start_2 = jax.random.randint(
            k2, (), start_1 + 10 * MOTION_HZ, jnp.maximum(hi, start_1 + 10 * MOTION_HZ + 1)
        )
        m1, p1 = _cut(music, motion, start_1, c30)
        m2, p2 = _cut(music, motion, start_2, c30)
        return m1, m2, p1, p2

    # super_hard: offset drawn from [0, 4.5) s (reference `train_utils.py:74-75`)
    start_1 = sec30(k1, 0, S - C - 5)
    offset = jax.random.randint(k2, (), 0, jnp.int32(4.5 * MOTION_HZ))
    start_2 = start_1 + offset
    m1, p1 = _cut(music, motion, start_1, c30)
    m2, p2 = _cut(music, motion, start_2, c30)
    return m1, m2, p1, p2
