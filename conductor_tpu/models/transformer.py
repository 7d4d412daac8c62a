"""MotionTransformer: the diffusion denoiser (flagship model).

TPU-first rebuild of reference `Diffusion_Stage/models/transformer.py:360-497`:
a decoder-only transformer over (B, T, 26) noisy pose sequences with

- per-frame conditioning: ``emb = time_embed(t)[:, None] + xf_proj`` (B, T, 512),
  consumed by AdaLN-style ``StylizationBlock`` scale/shift after every
  sub-layer (`transformer.py:53-81,482`);
- linear temporal self/cross attention (O(T·d²), `:84-158`) as the default,
  quadratic attention as the ``no_eff`` fallback (`:198-287`) — both routed
  through `conductor_tpu.ops` so the Pallas kernel slots in transparently;
- a frozen stage-1 MusicEncoder providing 64-d music tokens, with
  training-time condition dropout (CFG-style Bernoulli frame zeroing,
  prob 0.1, `:447-459`);
- learned 1800-frame sequence embedding + sinusoidal timestep embedding
  (`:386,8-25`); zero-initialized output projection (`:443`).

The music path is *hoisted out* of the denoiser: `encode_music` runs once per
clip, the sampler scans only `__call__` — unlike the reference, which
re-encodes per training step and plumbs tensors through ``model_kwargs``.

Classifier-free guidance: the reference trains with condition dropout but
ships no guided sampler (SURVEY.md D6); `guided_denoiser` below completes the
pair.
"""

from __future__ import annotations

import math
from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import linear_attention, qk_softmax, quadratic_self_attention
from .music_encoder import MusicEncoder


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: float = 10000.0):
    """Sinusoidal timestep embedding, [cos | sin] ordering
    (`transformer.py:8-25` — note the reference puts cos first)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps[:, None].astype(jnp.float32) * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def generate_src_mask(T: int, length: jnp.ndarray) -> jnp.ndarray:
    """(B, T, 1) valid-frame mask from per-sample lengths
    (vectorizes `transformer.py:461-467`)."""
    return (jnp.arange(T)[None, :] < length[:, None]).astype(jnp.float32)[..., None]


class StylizationBlock(nn.Module):
    """AdaLN scale/shift from the per-frame conditioning embedding
    (`transformer.py:53-81`); output path is zero-initialized so every
    sub-layer starts as identity."""

    latent_dim: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray, emb: jnp.ndarray, train: bool) -> jnp.ndarray:
        e = nn.Dense(2 * self.latent_dim, dtype=self.dtype)(nn.silu(emb))
        scale, shift = jnp.split(e, 2, axis=-1)
        h = nn.LayerNorm(dtype=self.dtype)(h) * (1 + scale) + shift
        h = nn.silu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.Dense(
            self.latent_dim, kernel_init=nn.initializers.zeros, dtype=self.dtype
        )(h)


class LinearSelfAttention(nn.Module):
    """Efficient temporal self-attention (`transformer.py:84-123`)."""

    latent_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, src_mask, train: bool):
        xn = nn.LayerNorm(dtype=self.dtype)(x)
        q = nn.Dense(self.latent_dim, dtype=self.dtype)(xn)
        k = nn.Dense(self.latent_dim, dtype=self.dtype)(xn)
        v = nn.Dense(self.latent_dim, dtype=self.dtype)(xn) * src_mask
        q, k = qk_softmax(q, k, self.num_heads, src_mask)
        B, T, _ = x.shape
        H = self.num_heads
        y = linear_attention(q, k, v.reshape(B, T, H, -1))
        return x + StylizationBlock(self.latent_dim, self.dropout, self.dtype)(
            y, emb, train
        )


class LinearCrossAttention(nn.Module):
    """Efficient cross-attention over music tokens (`transformer.py:125-158`).
    No key mask — the reference applies none on the conditioning stream."""

    latent_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, xf, emb, train: bool):
        xn = nn.LayerNorm(dtype=self.dtype)(x)
        fn = nn.LayerNorm(dtype=self.dtype)(xf)
        q = nn.Dense(self.latent_dim, dtype=self.dtype)(xn)
        k = nn.Dense(self.latent_dim, dtype=self.dtype)(fn)
        v = nn.Dense(self.latent_dim, dtype=self.dtype)(fn)
        q, k = qk_softmax(q, k, self.num_heads, None)
        B, N, _ = xf.shape
        H = self.num_heads
        y = linear_attention(q, k, v.reshape(B, N, H, -1))
        return x + StylizationBlock(self.latent_dim, self.dropout, self.dtype)(
            y, emb, train
        )


class QuadraticSelfAttention(nn.Module):
    """`no_eff` O(T²) self-attention (`transformer.py:198-229`)."""

    latent_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, src_mask, train: bool):
        xn = nn.LayerNorm(dtype=self.dtype)(x)
        q = nn.Dense(self.latent_dim, dtype=self.dtype)(xn)
        k = nn.Dense(self.latent_dim, dtype=self.dtype)(xn)
        v = nn.Dense(self.latent_dim, dtype=self.dtype)(xn)
        y = quadratic_self_attention(q, k, v, self.num_heads, src_mask)
        return x + StylizationBlock(self.latent_dim, self.dropout, self.dtype)(
            y, emb, train
        )


class QuadraticCrossAttention(nn.Module):
    """`no_eff` O(T·N) cross-attention (`transformer.py:231-264`)."""

    latent_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, xf, emb, train: bool):
        xn = nn.LayerNorm(dtype=self.dtype)(x)
        fn = nn.LayerNorm(dtype=self.dtype)(xf)
        q = nn.Dense(self.latent_dim, dtype=self.dtype)(xn)
        k = nn.Dense(self.latent_dim, dtype=self.dtype)(fn)
        v = nn.Dense(self.latent_dim, dtype=self.dtype)(fn)
        y = quadratic_self_attention(q, k, v, self.num_heads, None)
        return x + StylizationBlock(self.latent_dim, self.dropout, self.dtype)(
            y, emb, train
        )


class FFN(nn.Module):
    """GELU FFN with zero-initialized second linear (`transformer.py:160-173`)."""

    latent_dim: int
    ffn_dim: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, train: bool):
        y = nn.Dense(self.ffn_dim, dtype=self.dtype)(x)
        y = nn.gelu(y)
        if self.dropout > 0:
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(
            self.latent_dim, kernel_init=nn.initializers.zeros, dtype=self.dtype
        )(y)
        return x + StylizationBlock(self.latent_dim, self.dropout, self.dtype)(
            y, emb, train
        )


class DecoderLayer(nn.Module):
    """self-attn -> cross-attn -> FFN (`transformer.py:175-196`)."""

    latent_dim: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.0
    efficient: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, xf, emb, src_mask, train: bool):
        kw = dict(
            latent_dim=self.latent_dim, num_heads=self.num_heads,
            dropout=self.dropout, dtype=self.dtype,
        )
        if self.efficient:
            x = LinearSelfAttention(**kw)(x, emb, src_mask, train)
            x = LinearCrossAttention(**kw)(x, xf, emb, train)
        else:
            x = QuadraticSelfAttention(**kw)(x, emb, src_mask, train)
            x = QuadraticCrossAttention(**kw)(x, xf, emb, train)
        return FFN(self.latent_dim, self.ffn_dim, self.dropout, self.dtype)(
            x, emb, train
        )


class MotionTransformer(nn.Module):
    """The denoiser (`transformer.py:360-497`).

    ``__call__(x, t, xf_proj, xf_out, src_mask)`` expects pre-encoded music
    (from :meth:`encode_music`), returns the x0 prediction (B, T, 26).
    """

    input_feats: int = 26
    num_frames: int = 1800
    latent_dim: int = 128
    ff_size: int = 64
    num_layers: int = 8
    num_heads: int = 8
    dropout: float = 0.0
    cond_mask_prob: float = 0.1
    music_latent_dim: int = 64
    music_width: int = 512
    efficient: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.music_encoder = MusicEncoder(out_dim=self.music_latent_dim, dtype=self.dtype)
        self.proj = nn.Dense(self.music_latent_dim, dtype=self.dtype)
        # The reference hard-codes Linear(64, 512) (`transformer.py:404`), which
        # equals time_embed_dim = 4*latent only at latent=128; the music tokens
        # are *added* to the time embedding (`:482`), so the width must track
        # time_embed_dim for any latent size.
        self.music_linear = nn.Dense(self.latent_dim * 4, dtype=self.dtype)
        self.joint_embed = nn.Dense(self.latent_dim, dtype=self.dtype)
        self.sequence_embedding = self.param(
            "sequence_embedding",
            nn.initializers.normal(stddev=1.0),
            (self.num_frames, self.latent_dim),
        )
        time_embed_dim = self.latent_dim * 4
        self.time_embed_1 = nn.Dense(time_embed_dim, dtype=self.dtype)
        self.time_embed_2 = nn.Dense(time_embed_dim, dtype=self.dtype)
        self.blocks = [
            DecoderLayer(
                latent_dim=self.latent_dim,
                num_heads=self.num_heads,
                ffn_dim=self.ff_size,
                dropout=self.dropout,
                efficient=self.efficient,
                dtype=self.dtype,
            )
            for _ in range(self.num_layers)
        ]
        self.out = nn.Dense(
            self.input_feats, kernel_init=nn.initializers.zeros, dtype=self.dtype
        )

    def encode_music(self, mel: jnp.ndarray, train: bool = False):
        """mel (B, T90, 128) -> (xf_proj, xf_out), both (B, T30, 64).

        The music encoder is frozen (reference loads + `.eval()`s it,
        `transformer.py:391-403`): gradients are stopped and BN uses running
        stats.  Training applies per-(b, t) Bernoulli condition dropout
        (`:451-456`) via the 'cond' rng collection.
        """
        x = jax.lax.stop_gradient(self.music_encoder(mel, train=False))
        if train and self.cond_mask_prob > 0:
            rng = self.make_rng("cond")
            keep = 1.0 - jax.random.bernoulli(
                rng, self.cond_mask_prob, x.shape[:2]
            ).astype(x.dtype)
            x = x * keep[..., None]
        return self.proj(x), x

    def init_with_music(self, mel: jnp.ndarray, x: jnp.ndarray, t: jnp.ndarray):
        """Initialization entry point touching every submodule (music encoder
        + denoiser); use as ``model.init(rngs, mel, x, t,
        method=model.init_with_music)``."""
        xf_proj, xf_out = self.encode_music(mel)
        return self(x, t, xf_proj, xf_out)

    def encode_null(self, batch: int, frames: int):
        """The null condition matching training-time dropout: zeroed encoder
        tokens pushed through `proj` (whose bias is nonzero) — for CFG."""
        x = jnp.zeros((batch, frames, self.music_latent_dim), dtype=self.dtype)
        return self.proj(x), x

    def __call__(
        self,
        x: jnp.ndarray,
        timesteps: jnp.ndarray,
        xf_proj: jnp.ndarray,
        xf_out: jnp.ndarray,
        src_mask: jnp.ndarray | None = None,
        train: bool = False,
    ) -> jnp.ndarray:
        B, T = x.shape[0], x.shape[1]
        if x.ndim == 4:  # (B, T, J, 2) -> (B, T, 26)  (`transformer.py:484-485`)
            x = x.reshape(B, T, -1)
        if src_mask is None:
            src_mask = jnp.ones((B, T, 1), dtype=x.dtype)

        xf_proj = self.music_linear(xf_proj)  # (B, T, 512)  (`:479-480`)
        xf_out = self.music_linear(xf_out)

        temb = timestep_embedding(timesteps, self.latent_dim)
        temb = self.time_embed_2(nn.silu(self.time_embed_1(temb)))
        emb = temb[:, None, :] + xf_proj  # per-frame conditioning (`:482`)

        h = self.joint_embed(x) + self.sequence_embedding[None, :T, :]
        for blk in self.blocks:
            h = blk(h, xf_out, emb, src_mask, train)
        return self.out(h)


def guided_denoiser(
    apply_fn: Callable,
    params,
    xf_proj: jnp.ndarray,
    xf_out: jnp.ndarray,
    src_mask: jnp.ndarray,
    guidance_scale: float = 1.0,
    null_cond: tuple[jnp.ndarray, jnp.ndarray] | None = None,
):
    """Build a `model_fn(x, t)` closure for the samplers, optionally with
    classifier-free guidance.  ``null_cond`` should come from
    `MotionTransformer.encode_null` (zero tokens through `proj`), matching the
    training-time condition-dropout null."""

    def cond_fn(x, t):
        return apply_fn(params, x, t, xf_proj, xf_out, src_mask)

    if guidance_scale == 1.0:
        return cond_fn

    if null_cond is None:
        null_cond = (jnp.zeros_like(xf_proj), jnp.zeros_like(xf_out))
    xf_proj_null, xf_out_null = null_cond

    def guided_fn(x, t):
        c = apply_fn(params, x, t, xf_proj, xf_out, src_mask)
        u = apply_fn(params, x, t, xf_proj_null, xf_out_null, src_mask)
        return u + guidance_scale * (c - u)

    return guided_fn
