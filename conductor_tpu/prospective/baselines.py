"""Prospective Cup starter models (reference `ProspectiveCup/*`).

The reference competition kit ships a constant-output stub
(`ProspectiveCup/models/plain_model.py:5-20`) and reports a CNN-LSTM
baseline in its README (`ProspectiveCup/README.md:88-94`) without source.
Both are provided here as flax modules with the kit's contract:

    generator(mel (B, 90*s, 128)) -> motion (B, 30*s, 13, 2)
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..models.music_encoder import MusicEncoder


class PlainGenerator(nn.Module):
    """Constant-output stub (`plain_model.py:5-20`): zeros, SDP = 0 %."""

    n_joints: int = 13
    joint_dim: int = 2

    @nn.compact
    def __call__(self, mel: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, t90, _ = mel.shape
        return jnp.zeros((b, t90 // 3, self.n_joints, self.joint_dim), mel.dtype)


class CNNLSTMGenerator(nn.Module):
    """The README's CNN-LSTM baseline, TPU-style: the shared MusicEncoder CNN
    front-end (90 Hz mel -> 30 Hz 64-d tokens) feeding a unidirectional LSTM
    (via `nn.RNN`, which lowers to an XLA-friendly scan) and a sigmoid pose
    head.  Expected scores ~= RDE 1.05 / SCE 2.75 / SDP 44 %
    (`ProspectiveCup/README.md:88-94`)."""

    n_joints: int = 13
    joint_dim: int = 2
    hidden: int = 128

    @nn.compact
    def __call__(self, mel: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, t90, _ = mel.shape
        feats = MusicEncoder(out_dim=64)(mel, train=train)  # (B, T30, 64)
        h = nn.RNN(nn.OptimizedLSTMCell(self.hidden))(feats)
        h = nn.Dense(self.hidden)(h)
        h = nn.relu(h)
        pose = nn.sigmoid(nn.Dense(self.n_joints * self.joint_dim)(h))
        return pose.reshape(b, t90 // 3, self.n_joints, self.joint_dim)
