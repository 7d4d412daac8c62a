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
    (`MusicEncoder.py:5-27`).

    (A jnp halo-matmul conv impl existed here through round 2 and was
    measured strictly slower on v5e — the step is bound by lane-padded
    elementwise/pool/BN HBM traffic, not the conv matmuls; NOTES.md
    "M2SNet encoder profile".  Deleted; the fused Pallas *training* path
    selected by ``conv_impl`` is the honest fix.)"""

    features: int
    residual: bool = True
    dtype: jnp.dtype = jnp.float32
    conv_impl: str = "lax"  # "lax" (XLA convs)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        y = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        y = nn.Conv(
            self.features, (3, 3), padding="VALID", dtype=self.dtype,
            name="Conv_0",
        )(y)
        y = nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype, name="BatchNorm_0"
        )(y)
        y = nn.relu(y)
        if not self.residual:
            return y
        if x.shape[-1] == self.features:
            res = x
        else:
            res = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="Conv_1")(x)
            res = nn.BatchNorm(
                use_running_average=not train, dtype=self.dtype, name="BatchNorm_1"
            )(res)
        return y + res


def _max_pool(x, window, strides, padding):
    return nn.max_pool(x, window, strides=strides, padding=padding)


class MusicEncoder(nn.Module):
    """(B, T90, 128) mel -> (B, T30, 64) frame features (`MusicEncoder.py:30-53`)."""

    out_dim: int = 64
    dtype: jnp.dtype = jnp.float32
    conv_impl: str = "lax"

    def setup(self):
        mk = lambda feats, **kw: Conv2dResBlock(
            feats, dtype=self.dtype, conv_impl=self.conv_impl, **kw
        )
        self.conv1 = [mk(16, residual=False), mk(16), mk(16)]
        self.conv2 = [mk(32), mk(32)]
        self.conv3 = [mk(32), mk(32)]
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


class FusedMusicEncoder:
    """Inference-path MusicEncoder built on the fused Pallas conv kernel
    (`ops/pallas_conv.py`): one kernel per Conv2dResBlock with BN running
    stats and the residual branch folded in; max-pools and the final
    projection stay XLA.  Training keeps the flax module (batch statistics +
    backward).  Parity vs `MusicEncoder.__call__(train=False)` is pinned in
    `tests/test_pallas_conv.py`.

    ``variables``: the MusicEncoder subtree ({"params": ..., "batch_stats":
    ...}) — e.g. sliced out of a MotionTransformer checkpoint.
    """

    # (block name, res_mode): 0 none, 1 identity, 2 conv1x1+BN branch
    BLOCKS = [
        ("conv1_0", 0), ("conv1_1", 1), ("conv1_2", 1),
        ("conv2_0", 2), ("conv2_1", 1),
        ("conv3_0", 1), ("conv3_1", 1),
    ]
    # each stage's trailing max-pool, fused into the last conv block's
    # epilogue (`ops/pallas_conv.py` pool=): window, strides, padding
    POOLS = {
        "conv1_2": ((5, 5), (1, 2), ((2, 2), (2, 2))),
        "conv2_1": ((5, 5), (3, 2), ((2, 2), (2, 2))),
        "conv3_1": ((3, 3), (1, 2), ((1, 1), (1, 1))),
    }

    def __init__(self, variables, mxu_dtype=jnp.bfloat16):
        from ..ops.pallas_conv import fold_bn

        params = variables["params"]
        stats = variables["batch_stats"]
        self.mxu_dtype = mxu_dtype
        self.block_args = []
        for name, res_mode in self.BLOCKS:
            p, s = params[name], stats[name]
            scale, bias = fold_bn(
                p["Conv_0"]["bias"], s["BatchNorm_0"]["mean"],
                s["BatchNorm_0"]["var"], p["BatchNorm_0"]["scale"],
                p["BatchNorm_0"]["bias"],
            )
            kw = dict(
                kernel=p["Conv_0"]["kernel"], scale=scale, bias=bias,
                res_mode=res_mode, pool=self.POOLS.get(name),
            )
            if res_mode == 2:
                rs, rb = fold_bn(
                    p["Conv_1"]["bias"], s["BatchNorm_1"]["mean"],
                    s["BatchNorm_1"]["var"], p["BatchNorm_1"]["scale"],
                    p["BatchNorm_1"]["bias"],
                )
                kw.update(
                    res_kernel=p["Conv_1"]["kernel"][0, 0],
                    res_scale=rs, res_bias=rb,
                )
            self.block_args.append(kw)
        self.proj_w = params["proj"]["kernel"]
        ps, pb = fold_bn(
            params["proj"]["bias"], stats["proj_bn"]["mean"],
            stats["proj_bn"]["var"], params["proj_bn"]["scale"],
            params["proj_bn"]["bias"],
        )
        self.proj_scale, self.proj_bias = ps, pb

    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        from ..ops.pallas_conv import fused_conv_block

        # activations flow at mxu_dtype end-to-end (halves the HBM traffic
        # that dominates the full-resolution stages); projection back to f32
        x = mel.astype(self.mxu_dtype)[..., None]
        for kw in self.block_args:
            x = fused_conv_block(x, mxu_dtype=self.mxu_dtype, **kw)
        B, T, F, C = x.shape
        h = jnp.transpose(x, (0, 1, 3, 2)).reshape(B, T, C * F).astype(jnp.float32)
        return (h @ self.proj_w) * self.proj_scale + self.proj_bias
