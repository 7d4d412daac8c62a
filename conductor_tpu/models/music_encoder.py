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
import jax
import jax.numpy as jnp


class _PackedConv3x3(nn.Module):
    """3x3 reflect-padded conv on flat packed (B, T, F*C) activations via the
    trainable Pallas kernel (`ops/conv_train.py`).  Param tree (kernel/bias,
    shapes and initializers) matches `nn.Conv(features, (3, 3))` so
    checkpoints are interchangeable with the lax path."""

    features: int
    freq: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_flat: jnp.ndarray) -> jnp.ndarray:
        from ..ops.conv_train import conv3x3_train

        cin = x_flat.shape[-1] // self.freq
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, cin, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        y = conv3x3_train(x_flat.astype(self.dtype), kernel.astype(self.dtype))
        return y + jnp.tile(bias, self.freq).astype(self.dtype)


class _PackedConv1x1(nn.Module):
    """1x1 conv (the residual branch) as a lane-full block-diagonal matmul in
    the packed layout; param tree matches `nn.Conv(features, (1, 1))`."""

    features: int
    freq: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_flat: jnp.ndarray) -> jnp.ndarray:
        cin = x_flat.shape[-1] // self.freq
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 1, cin, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        g = max(128 // cin, 1)
        fb = self.freq // g
        b, t, _ = x_flat.shape
        w = jnp.einsum(
            "cd,vw->vcwd", kernel[0, 0].astype(self.dtype),
            jnp.eye(g, dtype=self.dtype),
        ).reshape(g * cin, g * self.features)
        # one flat 2D matmul (collapsed (B*T*FB, G*Cin)): a 4D einsum here
        # made XLA materialize the output at a transposed layout (~2.4 ms of
        # copies on the full-res stage)
        x2 = x_flat.astype(self.dtype).reshape(b * t * fb, g * cin)
        y = (x2 @ w).reshape(b, t, self.freq * self.features)
        return y + jnp.tile(bias, self.freq).astype(self.dtype)


class _PackedBatchNorm(nn.Module):
    """Per-channel BatchNorm on flat packed (B, T, F*C) activations: the
    batch-stat reduction runs over the lane-full flat array (then a tiny
    (F, C) fold), where XLA's NHWC reduction was 19 % of the M2SNet step
    (NOTES.md).  Variable tree (scale/bias params, mean/var batch_stats) and
    semantics (momentum 0.99, eps 1e-5, f32 stats) match `nn.BatchNorm`."""

    momentum: float = 0.99
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h_flat, f: int, use_running_average: bool):
        c = h_flat.shape[-1] // f
        scale = self.param("scale", nn.initializers.ones_init(), (c,))
        bias = self.param("bias", nn.initializers.zeros_init(), (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if use_running_average:
            mu, var = ra_mean.value, ra_var.value
        else:
            h32 = h_flat.astype(jnp.float32)
            s1 = h32.mean(axis=(0, 1)).reshape(f, c).mean(axis=0)
            s2 = (h32 * h32).mean(axis=(0, 1)).reshape(f, c).mean(axis=0)
            mu = s1
            var = s2 - s1 * s1
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mu
                ra_var.value = m * ra_var.value + (1 - m) * var
        inv = scale * jax.lax.rsqrt(var + self.epsilon)
        a = jnp.tile(inv, f).astype(self.dtype)
        b = jnp.tile(bias - mu * inv, f).astype(self.dtype)
        return h_flat.astype(self.dtype) * a + b


class Conv2dResBlock(nn.Module):
    """Reflect-padded 3x3 conv + BN + ReLU with a residual branch
    (`MusicEncoder.py:5-27`).

    ``conv_impl="pallas_train"`` runs the whole block on flat packed
    (B, T, F*C) activations: Pallas custom-VJP conv (`ops/conv_train.py`),
    XLA BN/ReLU/residual on lane-full arrays — the honest fix for the
    lane-padded NHWC traffic that dominated the M2SNet step (NOTES.md
    "M2SNet encoder profile"; a jnp halo-matmul impl and a masked-pool
    backward were both measured slower at the XLA level and deleted).
    The variable tree is identical across impls, so checkpoints and the
    torch importer work unchanged."""

    features: int
    residual: bool = True
    dtype: jnp.dtype = jnp.float32
    conv_impl: str = "lax"  # "lax" (XLA convs) | "pallas_train" (packed)
    freq: int = 0           # static F, required by the packed path

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        if self.conv_impl == "pallas_train":
            return self._packed(x, train)
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

    def _packed(self, x_flat: jnp.ndarray, train: bool) -> jnp.ndarray:
        """Packed-layout block: x_flat (B, T, F*Cin) -> (B, T, F*Cout)."""
        assert self.freq, "packed path needs the static freq attribute"
        f = self.freq
        cin = x_flat.shape[-1] // f
        y = _PackedConv3x3(
            self.features, freq=f, dtype=self.dtype, name="Conv_0"
        )(x_flat)
        y = _PackedBatchNorm(dtype=self.dtype, name="BatchNorm_0")(
            y, f, not train
        )
        y = nn.relu(y)
        if not self.residual:
            return y
        if cin == self.features:
            res = x_flat.astype(self.dtype)
        else:
            res = _PackedConv1x1(
                self.features, freq=f, dtype=self.dtype, name="Conv_1"
            )(x_flat)
            res = _PackedBatchNorm(dtype=self.dtype, name="BatchNorm_1")(
                res, f, not train
            )
        return y + res


def _max_pool(x, window, strides, padding):
    return nn.max_pool(x, window, strides=strides, padding=padding)


class MusicEncoder(nn.Module):
    """(B, T90, 128) mel -> (B, T30, 64) frame features (`MusicEncoder.py:30-53`)."""

    out_dim: int = 64
    dtype: jnp.dtype = jnp.float32
    conv_impl: str = "lax"

    def setup(self):
        mk = lambda feats, freq, **kw: Conv2dResBlock(
            feats, dtype=self.dtype, conv_impl=self.conv_impl, freq=freq, **kw
        )
        self.conv1 = [mk(16, 128, residual=False), mk(16, 128), mk(16, 128)]
        self.conv2 = [mk(32, 64), mk(32, 64)]
        self.conv3 = [mk(32, 32), mk(32, 32)]
        self.proj = nn.Dense(self.out_dim, dtype=self.dtype)
        self.proj_bn = nn.BatchNorm(dtype=self.dtype)

    def _stages(self, mel: jnp.ndarray, train: bool):
        """Run the three conv stages; returns (h1, h2, h3_flat).

        The packed path returns h1/h2 flat (B, T, F*C) — the same
        (freq-major, channel-minor) element order `features()` flattens the
        lax path's NHWC maps to, so consumers are impl-agnostic."""
        if self.conv_impl == "pallas_train":
            return self._stages_packed(mel, train)
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

    def _stages_packed(self, mel: jnp.ndarray, train: bool):
        """The three conv stages on flat packed (B, T, F*C) activations:
        every conv/pool is a Pallas kernel with a Pallas backward
        (`ops/conv_train.py`, `ops/pallas_pool.py`), every elementwise/BN op
        runs lane-full in XLA.  Same math as the lax path (parity pinned in
        `tests/test_conv_train.py`)."""
        from ..ops.pallas_pool import max_pool_train

        h = mel  # (B, T90, 128) == flat packed with F=128, C=1
        for blk in self.conv1:
            h = blk(h, train)
        h1 = max_pool_train(h, 128, 16, (5, 5), (1, 2), ((2, 2), (2, 2)))
        h = h1                                               # (B, T90, 64*16)
        for blk in self.conv2:
            h = blk(h, train)
        h2 = max_pool_train(h, 64, 32, (5, 5), (3, 2), ((2, 2), (2, 2)))
        h = h2                                               # (B, T30, 32*32)
        for blk in self.conv3:
            h = blk(h, train)
        h3 = max_pool_train(h, 32, 32, (3, 3), (1, 2), ((1, 1), (1, 1)))
        B, T = h3.shape[:2]                                  # (B, T30, 16*32)
        # channel-major flatten (C, F), as in the lax path
        h3_flat = h3.reshape(B, T, 16, 32).transpose(0, 1, 3, 2).reshape(B, T, 512)
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
