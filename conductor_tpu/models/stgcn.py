"""Spatial-temporal graph convolutional motion encoder (ST-GCN).

Rebuild of reference `Contrastive_Stage/models/ST_GCN/ST_GCN.py:13-226` and
`st_gcn_utils/tgcn.py:6-66` in flax/linen with TPU layout (B, T, V, C):

- graph conv unit: 1x1 conv to K·C channels then the adjacency contraction
  (reference `einsum('nkctv,kvw->nctw')`, here `'btvkc,kvw->btwc'`) — a pure
  MXU op over the static (K, V, V) adjacency;
- st_gcn block: GCN + (BN, ReLU, temporal k=3 conv, BN) + residual + ReLU,
  with a learnable per-block edge-importance mask on A;
- data BN over the flattened (V·C) input features;
- `mode='M2S'` (10 blocks, 32 ch, stride 1) feeds M2SNet and the FGD metric;
  `mode='AE'` (8 blocks, 16 ch, temporal strides 3 and 2) is the autoencoder
  variant.

`MotionEncoderSTGCN` = ST-GCN + 1x1 projection to 64-d per-frame latents
(reference `Contrastive_Stage/models/MotionEncoder.py:6-42`, re-declared in
`Diffusion_Stage/trainers/ddpm_trainer.py:27-63`) — the conditioning /
perceptual-metric backbone for stage 2.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .graph import build_adjacency


class GraphConv(nn.Module):
    """Graph conv unit (`tgcn.py:36-66`): pointwise conv to K·C, contract A.

    TPU formulation: the pointwise conv and the adjacency contraction are
    both linear, so they COMPOSE into one dense (V·Cin) -> (V·Cout) matmul —
    M[(v,c),(w,c')] = sum_k W[c,(k,c')]·A[k,v,w] — turning a tiny-N conv plus
    a V=13 einsum (13/128 lanes) into a single full-width MXU op.  Composing
    M costs K·V²·C·C' flops — noise next to the B·T-row matmul it enables.
    """

    features: int
    spatial_kernel: int  # K = A.shape[0]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, A: jnp.ndarray) -> jnp.ndarray:
        B, T, V, Cin = x.shape
        K, C = self.spatial_kernel, self.features
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (Cin, K * C)
        )
        bias = self.param("bias", nn.initializers.zeros, (K * C,))
        kmat = kernel.reshape(Cin, K, C)
        M = jnp.einsum("ckd,kvw->vcwd", kmat, A).reshape(V * Cin, V * C)
        b2 = jnp.einsum("kd,kvw->wd", bias.reshape(K, C), A).reshape(V * C)
        y = x.reshape(B, T, V * Cin).astype(self.dtype) @ M.astype(self.dtype)
        return (y + b2).reshape(B, T, V, C)


class TemporalConv(nn.Module):
    """kt x 1 temporal conv, per-joint, as shifted matmuls over joint-blocked
    lanes: joints are padded V -> ceil(V/G)*G with G = 128//C joints per
    128-lane block, and each time shift contracts with kron(eye(G), W[dt])
    (128x128).  Full MXU lanes at only G x the conv's flops — 4x fewer than
    the old whole-(V*C) block-diagonal form (which inflated 13x and padded
    416 -> 512 lanes on top)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, T, V, Cin = x.shape
        kt, C = self.kernel_size, self.features
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (kt, Cin, C)
        )
        bias = self.param("bias", nn.initializers.zeros, (C,))
        g = max(128 // max(Cin, C), 1)
        vp = -(-V // g) * g  # joints padded to a multiple of the block
        eye = jnp.eye(g, dtype=kernel.dtype)
        Wb = jnp.einsum("tcd,vw->tvcwd", kernel, eye).reshape(
            kt, g * Cin, g * C
        )

        pad = (kt - 1) // 2
        xf = jnp.pad(
            x, ((0, 0), (pad, pad), (0, vp - V), (0, 0))
        ).reshape(B, T + 2 * pad, vp // g, g * Cin).astype(self.dtype)
        t_out = (T - 1) // self.stride + 1
        y = 0.0
        for dt in range(kt):
            xs = xf[:, dt : dt + T : self.stride][:, :t_out]
            y = y + xs @ Wb[dt].astype(self.dtype)
        y = y.reshape(B, t_out, vp, C)[:, :, :V] + bias
        return y


class STGCNBlock(nn.Module):
    """GCN + temporal conv + residual (`ST_GCN.py:147-226`)."""

    features: int
    spatial_kernel: int
    temporal_kernel: int = 3
    stride: int = 1
    residual: bool = True
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, A: jnp.ndarray, train: bool) -> jnp.ndarray:
        in_ch = x.shape[-1]

        if not self.residual:
            res = 0.0
        elif in_ch == self.features and self.stride == 1:
            res = x
        else:
            res = nn.Conv(
                self.features, (1, 1), strides=(self.stride, 1), dtype=self.dtype
            )(x)
            res = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(res)

        y = GraphConv(self.features, self.spatial_kernel, dtype=self.dtype)(x, A)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = TemporalConv(
            self.features, self.temporal_kernel, self.stride, dtype=self.dtype
        )(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        if self.dropout > 0:
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return nn.relu(y + res)


# (features, stride, residual) per block for each mode (`ST_GCN.py:48-71`).
MODE_BLOCKS: dict[str, Sequence[tuple[int, int, bool]]] = {
    "M2S": [(32, 1, False)] + [(32, 1, True)] * 9,
    "AE": [
        (16, 1, False), (16, 1, True), (16, 3, True), (16, 1, True),
        (16, 1, True), (16, 2, True), (16, 1, True), (16, 1, True),
    ],
}


class STGCN(nn.Module):
    """Stacked st_gcn blocks with edge-importance weighting (`ST_GCN.py:33-118`).

    Input (B, T, V, C_in); output (B, T', V, C_out).
    """

    mode: str = "M2S"
    layout: str = "ConductorMotionX"
    strategy: str = "uniform"
    edge_importance: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        A = build_adjacency(self.layout, self.strategy)
        self.adjacency = jnp.asarray(A)
        K = A.shape[0]
        blocks = []
        for feats, stride, residual in MODE_BLOCKS[self.mode]:
            blocks.append(
                STGCNBlock(
                    features=feats,
                    spatial_kernel=K,
                    stride=stride,
                    residual=residual,
                    dtype=self.dtype,
                )
            )
        self.blocks = blocks
        if self.edge_importance:
            self.edge_weights = [
                self.param(f"edge_importance_{i}", nn.initializers.ones, A.shape)
                for i in range(len(blocks))
            ]
        else:
            self.edge_weights = [1.0] * len(blocks)
        self.data_bn = nn.BatchNorm(dtype=self.dtype)

    def _normalize(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        """data_bn over flattened (V·C) per frame (`ST_GCN.py:96-103`)."""
        B, T, V, C = x.shape
        y = x.reshape(B, T, V * C)
        y = self.data_bn(y, use_running_average=not train)
        return y.reshape(B, T, V, C)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = self._normalize(x, train)
        for blk, ew in zip(self.blocks, self.edge_weights):
            x = blk(x, self.adjacency * ew, train)
        return x

    def extract_feature(self, x: jnp.ndarray, train: bool = False):
        """Per-block feature maps, channel-last (B, T, V·C)
        (`ST_GCN.py:120-144`)."""
        x = self._normalize(x, train)
        flat = lambda h: jnp.transpose(h, (0, 1, 3, 2)).reshape(
            h.shape[0], h.shape[1], -1
        )
        feats = [flat(x)]
        for blk, ew in zip(self.blocks, self.edge_weights):
            x = blk(x, self.adjacency * ew, train)
            feats.append(flat(x))
        return feats


class MotionEncoderSTGCN(nn.Module):
    """(B, T, 13, 2) motion -> (B, T, 64) latents (`MotionEncoder.py:6-42`)."""

    out_dim: int = 64
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.st_gcn = STGCN(mode="M2S", dtype=self.dtype)
        self.fc = nn.Dense(self.out_dim, dtype=self.dtype)
        self.fc_bn = nn.BatchNorm(dtype=self.dtype)

    def _project(self, h: jnp.ndarray, train: bool) -> jnp.ndarray:
        B, T, V, C = h.shape
        # channel-major (C, V) flatten matches the reference's NCTV
        # transpose+flatten (`MotionEncoder.py:23-25`) for checkpoint porting.
        h = jnp.transpose(h, (0, 1, 3, 2)).reshape(B, T, C * V)
        return self.fc_bn(self.fc(h), use_running_average=not train)

    def __call__(self, motion: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = self.st_gcn(motion, train)
        return self._project(h, train)

    def features(self, motion: jnp.ndarray, train: bool = False):
        """Per-block maps + final 64-d output, the perceptual feature stack
        used by SyncLoss / FGD / the stage-2 feature loss
        (`MotionEncoder.py:29-42`)."""
        feats = self.st_gcn.extract_feature(motion, train)
        # Recover the final block output from its flattened (C, V) map instead
        # of a second full forward (the reference recomputes, `MotionEncoder.py:34-40`).
        B, T, VC = feats[-1].shape
        V = motion.shape[2]
        h = feats[-1].reshape(B, T, VC // V, V).transpose(0, 1, 3, 2)
        feats.append(self._project(h, train))
        return feats
