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

from ..ops import quadratic_self_attention, temporal_linear_attention

# torch nn.LayerNorm eps — kept identical for checkpoint-import parity
# (`Diffusion_Stage/models/transformer.py:61,89` use the torch default 1e-5).
LN_EPS = 1e-5
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
    sub-layer starts as identity.

    TPU restructuring: the emb -> (scale, shift) projection is NOT here — all
    ``num_layers * 3`` of those projections are batched into ONE wide matmul
    per forward at the transformer top (`MotionTransformer.denoise`), since
    they share the same input.  24 separate (T, 512)x(512, 256) matmuls are
    launch-overhead-bound on the MXU; one (T, 512)x(512, 6144) is not.  This
    block receives its ``mod`` slice (B, T, 2*latent) ready-made.
    """

    latent_dim: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray, mod: jnp.ndarray, train: bool) -> jnp.ndarray:
        scale, shift = jnp.split(mod, 2, axis=-1)
        h = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)(h) * (1 + scale) + shift
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
    attention_impl: str = "xla"

    @nn.compact
    def __call__(self, x, mod, src_mask, train: bool):
        xn = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)(x)
        q = nn.Dense(self.latent_dim, dtype=self.dtype)(xn)
        k = nn.Dense(self.latent_dim, dtype=self.dtype)(xn)
        v = nn.Dense(self.latent_dim, dtype=self.dtype)(xn)
        y = temporal_linear_attention(
            q, k, v, self.num_heads, src_mask, impl=self.attention_impl
        )
        return x + StylizationBlock(self.latent_dim, self.dropout, self.dtype)(
            y, mod, train
        )


class LinearCrossAttention(nn.Module):
    """Efficient cross-attention over music tokens (`transformer.py:125-158`).
    No key mask — the reference applies none on the conditioning stream.

    TPU restructuring: the key/value path depends only on the music tokens,
    which are constant across all diffusion timesteps — so `kv_state` computes
    the time-softmaxed K^T V contraction (B, H, Dh, Dh) ONCE per clip, and the
    per-step `__call__` is just the query path against that tiny state.  This
    removes two (T, 512)x(512, 128) matmuls + a LayerNorm + the KV contraction
    from every one of the 1000 sampler steps.
    """

    latent_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "xla"

    def setup(self):
        self.norm_x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)
        self.norm_xf = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)
        self.query = nn.Dense(self.latent_dim, dtype=self.dtype)
        self.key = nn.Dense(self.latent_dim, dtype=self.dtype)
        self.value = nn.Dense(self.latent_dim, dtype=self.dtype)
        self.styl = StylizationBlock(self.latent_dim, self.dropout, self.dtype)

    def kv_state(self, xf: jnp.ndarray) -> jnp.ndarray:
        """Music tokens (B, N, W) -> step-invariant KV state (B, H, Dh, Dh)."""
        fn = self.norm_xf(xf)
        k = self.key(fn)
        v = self.value(fn)
        b, n, d = k.shape
        h = self.num_heads
        kh = jax.nn.softmax(
            k.reshape(b, n, h, d // h).astype(jnp.float32), axis=1
        )
        vh = v.reshape(b, n, h, d // h).astype(jnp.float32)
        return jnp.einsum("bnhd,bnhl->bhdl", kh, vh).astype(self.dtype)

    def __call__(self, x, kv, mod, train: bool):
        xn = self.norm_x(x)
        q = self.query(xn)
        b, t, d = q.shape
        h = self.num_heads
        qh = jax.nn.softmax(q.reshape(b, t, h, d // h), axis=-1)
        y = jnp.einsum("bnhd,bhdl->bnhl", qh, kv).reshape(b, t, d)
        return x + self.styl(y, mod, train)


class QuadraticSelfAttention(nn.Module):
    """`no_eff` O(T²) self-attention (`transformer.py:198-229`)."""

    latent_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mod, src_mask, train: bool):
        xn = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)(x)
        q = nn.Dense(self.latent_dim, dtype=self.dtype)(xn)
        k = nn.Dense(self.latent_dim, dtype=self.dtype)(xn)
        v = nn.Dense(self.latent_dim, dtype=self.dtype)(xn)
        y = quadratic_self_attention(q, k, v, self.num_heads, src_mask)
        return x + StylizationBlock(self.latent_dim, self.dropout, self.dtype)(
            y, mod, train
        )


class QuadraticCrossAttention(nn.Module):
    """`no_eff` O(T·N) cross-attention (`transformer.py:231-264`).  The K/V
    projections of the (step-invariant) music tokens are hoisted into
    `kv_state`, like the linear variant."""

    latent_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.norm_x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)
        self.norm_xf = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)
        self.query = nn.Dense(self.latent_dim, dtype=self.dtype)
        self.key = nn.Dense(self.latent_dim, dtype=self.dtype)
        self.value = nn.Dense(self.latent_dim, dtype=self.dtype)
        self.styl = StylizationBlock(self.latent_dim, self.dropout, self.dtype)

    def kv_state(self, xf: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        fn = self.norm_xf(xf)
        return self.key(fn), self.value(fn)

    def __call__(self, x, kv, mod, train: bool):
        k, v = kv
        q = self.query(self.norm_x(x))
        b, t, d = q.shape
        h = self.num_heads
        qh = q.reshape(b, t, h, d // h)
        kh = k.reshape(b, -1, h, d // h)
        vh = v.reshape(b, -1, h, d // h)
        scores = jnp.einsum("bnhd,bmhd->bnmh", qh, kh) / jnp.sqrt(d / h)
        weights = jax.nn.softmax(scores, axis=2)
        y = jnp.einsum("bnmh,bmhd->bnhd", weights, vh).reshape(b, t, d)
        return x + self.styl(y, mod, train)


class FFN(nn.Module):
    """GELU FFN with zero-initialized second linear (`transformer.py:160-173`)."""

    latent_dim: int
    ffn_dim: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mod, train: bool):
        y = nn.Dense(self.ffn_dim, dtype=self.dtype)(x)
        y = nn.gelu(y)
        if self.dropout > 0:
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(
            self.latent_dim, kernel_init=nn.initializers.zeros, dtype=self.dtype
        )(y)
        return x + StylizationBlock(self.latent_dim, self.dropout, self.dtype)(
            y, mod, train
        )


class DecoderLayer(nn.Module):
    """self-attn -> cross-attn -> FFN (`transformer.py:175-196`).

    ``mods`` carries the three pre-projected AdaLN (scale, shift) slices for
    this layer, shape (B, T, 3, 2*latent); ``cross`` is the step-invariant
    cross-attention state from :meth:`cross_state`.
    """

    latent_dim: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.0
    efficient: bool = True
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "xla"

    def setup(self):
        kw = dict(
            latent_dim=self.latent_dim, num_heads=self.num_heads,
            dropout=self.dropout, dtype=self.dtype,
        )
        if self.efficient:
            self.self_attn = LinearSelfAttention(
                **kw, attention_impl=self.attention_impl
            )
            self.cross_attn = LinearCrossAttention(
                **kw, attention_impl=self.attention_impl
            )
        else:
            self.self_attn = QuadraticSelfAttention(**kw)
            self.cross_attn = QuadraticCrossAttention(**kw)
        self.ffn = FFN(self.latent_dim, self.ffn_dim, self.dropout, self.dtype)

    def cross_state(self, xf: jnp.ndarray):
        return self.cross_attn.kv_state(xf)

    def __call__(self, x, cross, mods, src_mask, train: bool):
        x = self.self_attn(x, mods[:, :, 0], src_mask, train)
        x = self.cross_attn(x, cross, mods[:, :, 1], train)
        return self.ffn(x, mods[:, :, 2], train)


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
    attention_impl: str = "xla"  # "xla" | "pallas" (fused TPU kernel)
    adaln_mode: str = "sliced"   # "sliced" | "batched" — see setup()

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
        # All num_layers*3 AdaLN emb->(scale, shift) projections share ONE
        # weight (see StylizationBlock docstring).  Same init distribution as
        # the reference's per-block Linears (fan_in is the shared emb width
        # either way).  `adaln_mode` picks the application strategy:
        # "batched" = one wide matmul (best MXU utilization, materializes a
        # (B, T, L*6*latent) tensor); "sliced" = per-layer slice matmuls that
        # XLA fuses into each block's consumers (less HBM traffic).
        self.adaln_kernel = self.param(
            "adaln_kernel",
            nn.initializers.lecun_normal(),
            (time_embed_dim, self.num_layers * 3 * 2 * self.latent_dim),
        )
        self.adaln_bias = self.param(
            "adaln_bias",
            nn.initializers.zeros,
            (self.num_layers * 3 * 2 * self.latent_dim,),
        )
        self.blocks = [
            DecoderLayer(
                latent_dim=self.latent_dim,
                num_heads=self.num_heads,
                ffn_dim=self.ff_size,
                dropout=self.dropout,
                efficient=self.efficient,
                dtype=self.dtype,
                attention_impl=self.attention_impl,
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

    def cond_from_features(self, feats: jnp.ndarray, train: bool = False):
        """Precomputed frozen-encoder features (B, T30, C) -> (xf_proj,
        xf_out).  Identical to :meth:`encode_music` minus the encoder — the
        condition dropout and the trainable `proj` sit after the feature-cache
        boundary, so cached training is numerically identical."""
        x = jax.lax.stop_gradient(feats)
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

    def _adaln_mods(self, emb: jnp.ndarray):
        """Returns ``get_mod(i) -> (B, T, 3, 2*latent)``, the i-th layer's
        AdaLN (scale, shift) triple, from the shared projection weight."""
        B, T = emb.shape[0], emb.shape[1]
        emb_act = nn.silu(emb)
        w = self.adaln_kernel.astype(self.dtype)
        bias = self.adaln_bias.astype(self.dtype)
        span = 3 * 2 * self.latent_dim
        if self.adaln_mode == "batched":
            mods = (emb_act @ w + bias).reshape(
                B, T, self.num_layers, 3, 2 * self.latent_dim
            )
            return lambda i: mods[:, :, i]
        return lambda i: (
            emb_act @ w[:, i * span : (i + 1) * span]
            + bias[i * span : (i + 1) * span]
        ).reshape(B, T, 3, 2 * self.latent_dim)

    def precompute_cond(self, xf_proj: jnp.ndarray, xf_out: jnp.ndarray):
        """Everything about the conditioning that is constant across diffusion
        timesteps, computed once per clip: the music projection added to the
        time embedding, and each layer's cross-attention KV state.  The
        sampler scans :meth:`denoise` over this — the reference instead
        redoes all of it inside each of its 1000 per-step model calls."""
        xf_p = self.music_linear(xf_proj)
        xf_o = self.music_linear(xf_out)
        cross = tuple(blk.cross_state(xf_o) for blk in self.blocks)
        return {"emb_base": xf_p, "cross": cross}

    def time_embed_table(self, num_timesteps: int) -> jnp.ndarray:
        """All (num_timesteps, time_embed_dim) time embeddings in one batched
        MLP — the sampler gathers rows by t instead of re-running the MLP in
        every scan step."""
        temb = timestep_embedding(jnp.arange(num_timesteps), self.latent_dim)
        return self.time_embed_2(nn.silu(self.time_embed_1(temb)))

    def encode_null(self, batch: int, frames: int):
        """The null condition matching training-time dropout: zeroed encoder
        tokens pushed through `proj` (whose bias is nonzero) — for CFG."""
        x = jnp.zeros((batch, frames, self.music_latent_dim), dtype=self.dtype)
        return self.proj(x), x

    def denoise(
        self,
        x: jnp.ndarray,
        timesteps: jnp.ndarray,
        cond,
        src_mask: jnp.ndarray | None = None,
        train: bool = False,
    ) -> jnp.ndarray:
        """Per-step denoiser body — the sampler's scan target.  ``cond`` comes
        from :meth:`precompute_cond`."""
        B, T = x.shape[0], x.shape[1]
        if x.ndim == 4:  # (B, T, J, 2) -> (B, T, 26)  (`transformer.py:484-485`)
            x = x.reshape(B, T, -1)
        if src_mask is None:
            src_mask = jnp.ones((B, T, 1), dtype=x.dtype)

        if "temb_table" in cond:
            # sampling: the whole temb ladder was precomputed outside the
            # scan (`time_embed_table`) — one gather instead of an MLP/step
            temb = cond["temb_table"][timesteps]
        else:
            temb = timestep_embedding(timesteps, self.latent_dim)
            temb = self.time_embed_2(nn.silu(self.time_embed_1(temb)))
        emb = temb[:, None, :] + cond["emb_base"]  # per-frame cond (`:482`)

        get_mod = self._adaln_mods(emb)

        h = self.joint_embed(x) + self.sequence_embedding[None, :T, :].astype(
            self.dtype
        )
        for i, blk in enumerate(self.blocks):
            h = blk(h, cond["cross"][i], get_mod(i), src_mask, train)
        return self.out(h).astype(jnp.float32)

    def __call__(
        self,
        x: jnp.ndarray,
        timesteps: jnp.ndarray,
        xf_proj: jnp.ndarray,
        xf_out: jnp.ndarray,
        src_mask: jnp.ndarray | None = None,
        train: bool = False,
    ) -> jnp.ndarray:
        cond = self.precompute_cond(xf_proj, xf_out)
        return self.denoise(x, timesteps, cond, src_mask, train)


def guided_denoiser(
    denoise_fn: Callable,
    cond,
    src_mask: jnp.ndarray,
    guidance_scale: float = 1.0,
    null_cond=None,
):
    """Build a `model_fn(x, t)` closure for the samplers, optionally with
    classifier-free guidance.  ``denoise_fn(x, t, cond, src_mask)`` wraps
    `MotionTransformer.denoise`; ``cond`` / ``null_cond`` come from
    `precompute_cond` (the null from `encode_null` tokens, matching the
    training-time condition-dropout null)."""

    def cond_fn(x, t):
        return denoise_fn(x, t, cond, src_mask)

    if guidance_scale == 1.0:
        return cond_fn

    assert null_cond is not None, "CFG needs a precomputed null condition"

    def guided_fn(x, t):
        c = denoise_fn(x, t, cond, src_mask)
        u = denoise_fn(x, t, null_cond, src_mask)
        return u + guidance_scale * (c - u)

    return guided_fn
