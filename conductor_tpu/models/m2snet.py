"""M2SNet: music-motion synchronization network (stage 1).

Rebuild of reference `Contrastive_Stage/models/M2SNet.py:7-41`: the frozen-in-
stage-2 MusicEncoder and ST-GCN MotionEncoder, fused by a stack of pointwise
(1x1-conv ≡ per-frame Dense) layers predicting a per-frame sync probability.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .music_encoder import MusicEncoder
from .stgcn import MotionEncoderSTGCN


class M2SNet(nn.Module):
    """(mel (B,T90,128), motion (B,T30,13,2)) -> sync prob (B,T30,1)."""

    latent_dim: int = 64
    dtype: jnp.dtype = jnp.float32
    music_conv_impl: str = "lax"  # music-encoder Conv2dResBlock impl

    def setup(self):
        self.music_encoder = MusicEncoder(
            out_dim=self.latent_dim, dtype=self.dtype,
            conv_impl=self.music_conv_impl,
        )
        self.motion_encoder = MotionEncoderSTGCN(out_dim=self.latent_dim, dtype=self.dtype)
        # fuse_layer: Conv1d(128->64) ReLU, Conv1d(64->64) ReLU, Conv1d(64->1)
        # Sigmoid (`M2SNet.py:14-18`); pointwise convs are per-frame Denses.
        self.fuse1 = nn.Dense(self.latent_dim, dtype=self.dtype)
        self.fuse2 = nn.Dense(self.latent_dim, dtype=self.dtype)
        self.fuse3 = nn.Dense(1, dtype=self.dtype)

    def _fuse(self, hx: jnp.ndarray, hy: jnp.ndarray) -> jnp.ndarray:
        h = jnp.concatenate([hx, hy], axis=-1)
        h = nn.relu(self.fuse1(h))
        h = nn.relu(self.fuse2(h))
        return nn.sigmoid(self.fuse3(h))

    def __call__(self, mel: jnp.ndarray, motion: jnp.ndarray, train: bool = False):
        hx = self.music_encoder(mel, train)
        hy = self.motion_encoder(motion, train)
        return self._fuse(hx, hy)

    def encode(self, mel: jnp.ndarray, motion: jnp.ndarray, train: bool = False):
        """Both 64-d latent streams (used by eval and transfer)."""
        return self.music_encoder(mel, train), self.motion_encoder(motion, train)

    def fuse(self, hx: jnp.ndarray, hy: jnp.ndarray) -> jnp.ndarray:
        """Sync probability from precomputed latents — lets a trainer encode
        each distinct music/motion once and fuse all pair combinations
        (the reference re-encodes per pair, `M2SNet_train.py:88-91`)."""
        return self._fuse(hx, hy)

    def features(self, mel: jnp.ndarray, motion: jnp.ndarray, train: bool = False):
        """All intermediate feature maps of both encoders (`M2SNet.py:38-41`)."""
        return self.music_encoder.features(mel, train), self.motion_encoder.features(
            motion, train
        )
