"""Mel-spectrogram music encoder (2-D CNN, 90 Hz -> 30 Hz frame features).

TPU-native rebuild of reference `Contrastive_Stage/models/MusicEncoder.py:5-70`
(duplicated at `Diffusion_Stage/models/transformer.py:289-357`): three conv
stages with reflect-padded residual 3x3 convs and max-pools whose time strides
are (1, 3, 1) — downsampling 90 Hz mel frames to the 30 Hz motion rate while
squeezing 128 mel bins to 16 — followed by a 1x1 projection to 64-d per-frame
features.

Layout is NHWC (B, T, F, C) — TPU/XLA's native conv layout — instead of the
reference's NCHW.  The pre-projection flatten transposes to channel-major
(C, F) ordering so ported PyTorch checkpoints map weight-for-weight.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class Conv2dResBlock(nn.Module):
    """Reflect-padded 3x3 conv + BN + ReLU with a residual branch
    (`MusicEncoder.py:5-27`)."""

    features: int
    residual: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        y = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        y = nn.Conv(self.features, (3, 3), padding="VALID", dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        if not self.residual:
            return y
        if x.shape[-1] == self.features:
            res = x
        else:
            res = nn.Conv(self.features, (1, 1), dtype=self.dtype)(x)
            res = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(res)
        return y + res


def _max_pool(x, window, strides, padding):
    return nn.max_pool(x, window, strides=strides, padding=padding)


class MusicEncoder(nn.Module):
    """(B, T90, 128) mel -> (B, T30, 64) frame features (`MusicEncoder.py:30-53`)."""

    out_dim: int = 64
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.conv1 = [
            Conv2dResBlock(16, residual=False, dtype=self.dtype),
            Conv2dResBlock(16, dtype=self.dtype),
            Conv2dResBlock(16, dtype=self.dtype),
        ]
        self.conv2 = [
            Conv2dResBlock(32, dtype=self.dtype),
            Conv2dResBlock(32, dtype=self.dtype),
        ]
        self.conv3 = [
            Conv2dResBlock(32, dtype=self.dtype),
            Conv2dResBlock(32, dtype=self.dtype),
        ]
        self.proj = nn.Dense(self.out_dim, dtype=self.dtype)
        self.proj_bn = nn.BatchNorm(dtype=self.dtype)

    def _stages(self, mel: jnp.ndarray, train: bool):
        """Run the three conv stages; returns (h1, h2, h3_flat)."""
        x = mel[..., None]  # (B, T90, F128, 1)
        for blk in self.conv1:
            x = blk(x, train)
        h1 = _max_pool(x, (5, 5), (1, 2), ((2, 2), (2, 2)))      # (B, T90, 64, 16)
        x = h1
        for blk in self.conv2:
            x = blk(x, train)
        h2 = _max_pool(x, (5, 5), (3, 2), ((2, 2), (2, 2)))      # (B, T30, 32, 32)
        x = h2
        for blk in self.conv3:
            x = blk(x, train)
        h3 = _max_pool(x, (3, 3), (1, 2), ((1, 1), (1, 1)))      # (B, T30, 16, 32)
        B, T, F, C = h3.shape
        # channel-major flatten (C, F) matches the reference's NCHW
        # transpose+flatten (`MusicEncoder.py:51`), so torch checkpoints port.
        h3_flat = jnp.transpose(h3, (0, 1, 3, 2)).reshape(B, T, C * F)  # (B, T30, 512)
        return h1, h2, h3_flat

    def __call__(self, mel: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        _, _, h3_flat = self._stages(mel, train)
        h4 = self.proj_bn(self.proj(h3_flat), use_running_average=not train)
        return h4  # (B, T30, out_dim)

    def features(self, mel: jnp.ndarray, train: bool = False):
        """All intermediate maps, channel-last (B, T, C) — the reference's
        `features()` (`MusicEncoder.py:55-70`) used by TensorBoard logging and
        the GAN FeatureMatchingLoss."""
        h1, h2, h3_flat = self._stages(mel, train)
        h4 = self.proj_bn(self.proj(h3_flat), use_running_average=not train)
        flat = lambda h: h.reshape(h.shape[0], h.shape[1], -1)
        return [mel, flat(h1), flat(h2), h3_flat, h4]
