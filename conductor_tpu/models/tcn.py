"""Dilated temporal convolutional network (TCN) for the GAN pose decoder.

Rebuild of reference `Contrastive_Stage/models/TCN.py:7-98`.  The reference's
TemporalBlock reflect-pads by (k-1)·dilation on both sides then center-crops
the same amount (`Chomp1d`), which is exactly a SAME-size dilated conv with
reflect padding — implemented directly here (one pad + VALID conv instead of
pad-conv-crop).  Weight-normalized convs, BN, dropout, 3-wide avg-pool, and a
1x1 residual, dilation doubling per level.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def _reflect_pad_time(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")


class TemporalBlock(nn.Module):
    """Two weight-normed reflect-padded dilated convs + BN/ReLU/dropout +
    avg-pool + residual (`TCN.py:19-52`).  Channel-last (B, T, C)."""

    features: int
    kernel_size: int
    dilation: int
    dropout: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        pad = (self.kernel_size - 1) * self.dilation // 2
        y = x
        for i in range(2):
            y = _reflect_pad_time(y, pad)
            conv = nn.WeightNorm(
                nn.Conv(
                    self.features, (self.kernel_size,),
                    kernel_dilation=(self.dilation,), padding="VALID",
                    kernel_init=nn.initializers.normal(0.01), dtype=self.dtype,
                )
            )
            y = conv(y)
            y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
            y = nn.relu(y)
            if self.dropout > 0:
                y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.avg_pool(y, (3,), strides=(1,), padding=((1, 1),))
        if x.shape[-1] != self.features:
            x = nn.Conv(
                self.features, (1,),
                kernel_init=nn.initializers.normal(0.01), dtype=self.dtype,
            )(x)
        return nn.relu(y + x)


class DilatedTCN(nn.Module):
    """Stacked TemporalBlocks (dilation 2^i) + output Dense
    (`TCN.py:55-98` TemporalConvNet/TCN/DialtedCNN)."""

    output_size: int = 64
    n_layers: int = 6
    n_channel: int = 64
    kernel_size: int = 5
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i in range(self.n_layers):
            x = TemporalBlock(
                self.n_channel, self.kernel_size, 2**i,
                dropout=self.dropout, dtype=self.dtype,
            )(x, train)
        return nn.Dense(
            self.output_size, kernel_init=nn.initializers.normal(0.01),
            dtype=self.dtype,
        )(x)
