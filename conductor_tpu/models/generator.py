"""M2SGAN generator and WGAN critic (stage-1 adversarial baseline).

Rebuilds of reference `Contrastive_Stage/models/Generator.py:34-100` and
`models/Discriminator.py:5-41`:

- Generator: frozen-able MusicEncoder (B, T30, 64) in parallel with a noise
  path — (B, S, 8) one-vector-per-second noise upsampled x30 by a
  ConvTranspose stack (strides 1, 5, 3, 2) to (B, T30, 64) + BN — concatenated
  to (B, T30, 128) and decoded by a 6-layer dilated TCN + MLP + sigmoid into
  (B, T30, 13, 2) poses;
- Discriminator_1DCNN: 26-channel 1-D conv critic with VALID max-pools
  (time /12), per-frame MLP to a scalar, mean over time (no BN — WGAN-GP).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .music_encoder import MusicEncoder
from .tcn import DilatedTCN


class PoseDecoderTCN(nn.Module):
    """TCN + MLP head + sigmoid (`Generator.py:34-49`)."""

    output_size: int = 26
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = DilatedTCN(
            output_size=64, n_layers=6, n_channel=64, kernel_size=5,
            dtype=self.dtype,
        )(x, train)
        y = nn.relu(nn.Dense(64, dtype=self.dtype)(y))
        y = nn.relu(nn.Dense(64, dtype=self.dtype)(y))
        return nn.sigmoid(nn.Dense(self.output_size, dtype=self.dtype)(y))


class Generator(nn.Module):
    """(mel (B, S*90, 128), noise (B, S, 8)) -> motion (B, S*30, 13, 2)
    (`Generator.py:52-77`)."""

    n_joints: int = 13
    freeze_music_encoder: bool = True
    decoder_kind: str = "tcn"  # "tcn" | "bilstm" (`Generator.py:57-58`)
    dtype: jnp.dtype = jnp.float32
    music_conv_impl: str = "lax"  # music-encoder Conv2dResBlock impl

    def setup(self):
        self.music_encoder = MusicEncoder(
            dtype=self.dtype, conv_impl=self.music_conv_impl
        )
        if self.decoder_kind == "bilstm":
            self.decoder = PoseDecoderBiLSTM(self.n_joints * 2, dtype=self.dtype)
        else:
            self.decoder = PoseDecoderTCN(self.n_joints * 2, dtype=self.dtype)
        # noise upsampler x30 (strides 1*5*3*2), `Generator.py:59-64`; SAME
        # conv-transpose keeps L_out = L * stride exactly.
        self.up1 = nn.ConvTranspose(16, (3,), strides=(1,), padding="SAME", dtype=self.dtype)
        self.up2 = nn.ConvTranspose(16, (11,), strides=(5,), padding="SAME", dtype=self.dtype)
        self.up3 = nn.ConvTranspose(32, (5,), strides=(3,), padding="SAME", dtype=self.dtype)
        self.up4 = nn.ConvTranspose(64, (6,), strides=(2,), padding="SAME", dtype=self.dtype)
        self.noise_bn = nn.BatchNorm(dtype=self.dtype)

    def encode_music(self, mel: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """The music branch alone — when the encoder is frozen
        (`M2SGAN_train.py:61-64`) its output is step-invariant, so the GAN
        trainer hoists this single forward out of the fake/generator-loss
        pair of calls."""
        hx = self.music_encoder(mel, train=False if self.freeze_music_encoder else train)
        if self.freeze_music_encoder:
            hx = jax.lax.stop_gradient(hx)
        return hx

    def decode(self, hx: jnp.ndarray, noise: jnp.ndarray, train: bool = False):
        """Noise path + TCN decode given precomputed music features
        (B, T30, 64)."""
        h = nn.relu(self.up1(noise))
        h = nn.relu(self.up2(h))
        h = nn.relu(self.up3(h))
        h = nn.relu(self.up4(h))
        h = self.noise_bn(h, use_running_average=not train)
        y = self.decoder(jnp.concatenate([hx, h], axis=-1), train)
        B, T, _ = y.shape
        return y.reshape(B, T, self.n_joints, 2)

    def _hidden(self, mel: jnp.ndarray, noise: jnp.ndarray, train: bool) -> jnp.ndarray:
        hx = self.encode_music(mel, train)
        h = nn.relu(self.up1(noise))
        h = nn.relu(self.up2(h))
        h = nn.relu(self.up3(h))
        h = nn.relu(self.up4(h))
        h = self.noise_bn(h, use_running_average=not train)
        return jnp.concatenate([hx, h], axis=-1)  # (B, T30, 128)

    def __call__(self, mel: jnp.ndarray, noise: jnp.ndarray, train: bool = False):
        h = self._hidden(mel, noise, train)
        y = self.decoder(h, train)
        B, T, _ = y.shape
        return y.reshape(B, T, self.n_joints, 2)

    def features(self, mel: jnp.ndarray, noise: jnp.ndarray, train: bool = False):
        """The concatenated conditioning features (`Generator.py:79-86`)."""
        return self._hidden(mel, noise, train)


class PoseDecoderBiLSTM(nn.Module):
    """2-layer bidirectional LSTM decoder + MLP head + sigmoid
    (`Generator.py:7-31`): hidden 128 per direction, inter-layer dropout 0.5
    like torch's ``nn.LSTM(dropout=0.5)`` (applied between layers only).

    This is the published CVPR-baseline comparator, not a TPU hot path — the
    recurrent scan stays sequential by nature; the production generators are
    the TCN (parallel convs) and the diffusion transformer.
    """

    output_size: int = 26
    hidden: int = 128
    num_layers: int = 2
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for layer in range(self.num_layers):
            bidir = nn.Bidirectional(
                nn.RNN(nn.OptimizedLSTMCell(self.hidden)),
                nn.RNN(nn.OptimizedLSTMCell(self.hidden)),
            )
            x = bidir(x)  # (B, T, 2*hidden)
            if self.dropout > 0 and layer < self.num_layers - 1:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.relu(nn.Dense(64, dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(64, dtype=self.dtype)(x))
        return nn.sigmoid(nn.Dense(self.output_size, dtype=self.dtype)(x))


class GeneratorCVPRLSTM(nn.Module):
    """The CVPR'22 VirtualConductor LSTM baseline (`Generator.py:89-100`):
    a bare BiLSTM decoder over precomputed 20-d features; ``noise`` is
    accepted and ignored to keep the Generator call signature."""

    n_joints: int = 13
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, noise: jnp.ndarray | None = None,
        train: bool = False,
    ) -> jnp.ndarray:
        y = PoseDecoderBiLSTM(self.n_joints * 2, dtype=self.dtype)(x, train)
        B, T, _ = y.shape
        return y.reshape(B, T, self.n_joints, 2)


class Discriminator1DCNN(nn.Module):
    """WGAN critic (`Discriminator.py:5-41`): motion (B, T, 13, 2) -> (B, 1)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, motion: jnp.ndarray) -> jnp.ndarray:
        B, T = motion.shape[0], motion.shape[1]
        x = motion.reshape(B, T, -1)  # 26 channels
        for pool_stride in (3, 2, 2):
            x = nn.Conv(64, (5,), padding=((2, 2),), dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (5,), strides=(pool_stride,), padding="VALID")
        x = nn.relu(nn.Dense(32, dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(32, dtype=self.dtype)(x))
        x = nn.Dense(1, dtype=self.dtype)(x)
        return x.mean(axis=1)
