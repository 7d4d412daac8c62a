"""Whole-DecoderLayer fused Pallas kernel for the sampling hot path.

One kernel invocation = one full denoiser layer on one batch element:

    AdaLN projection (emb_act @ W_adaln, the layer's 3 scale/shift pairs)
    -> LN -> QKV -> linear attention (block-diagonal MXU formulation,
       see `pallas_attention.py`) -> stylization -> residual
    -> LN -> Q -> cross-attention against the precomputed (step-invariant)
       block-diagonal KV state -> stylization -> residual
    -> FFN (GELU) -> stylization -> residual

Everything stays VMEM-resident between the ~11 matmuls; the XLA path writes
each sub-result to HBM.  Inference-only (the sampler needs no gradients;
training keeps the composable flax path).  Weights are packed outside into
three arrays per layer (8 DxD matrices, a vector bank, the AdaLN slice) by
`train/fused_denoiser.py`, which also owns the flax-param -> packed layout
mapping and the parity test against `MotionTransformer.denoise`.

Assumes the generation setting: full-clip src_mask of ones (the sampler's
case, `ddpm_trainer._generate_impl`); padded tail rows are masked from the
key time-softmax in-kernel.

Weight-bank layouts (see `train/fused_denoiser.pack_layer_weights`):
  mats (9, D, D):  0:Wq 1:Wk 2:Wv 3:W_styl_self 4:Wq_cross 5:W_styl_cross
                   6:W1_ffn (D x ff, out-cols zero-padded to D)
                   7:W2_ffn (ff x D, in-rows zero-padded to D)
                   8:W_styl_ffn
  vecs (24, D):    0:g_ln_self   1:b_ln_self   2:bq   3:bk   4:bv
                   5:g_styl_self 6:b_styl_self 7:b_styl_self_out
                   8:g_ln_cross  9:b_ln_cross  10:bq_cross
                   11:g_styl_cross 12:b_styl_cross 13:b_styl_cross_out
                   14:b1_ffn (zero-padded) 15:b2_ffn
                   16:g_styl_ffn 17:b_styl_ffn 18:b_styl_ffn_out
  adaln_w (E, 6D) and adaln_b (6D,): this layer's slice of the shared
  AdaLN projection.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _ln(x, g, b):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-6) * g + b


def _layer_kernel(
    x_ref, emb_ref, kvc_ref, mats_ref, vecs_ref, aw_ref, ab_ref, o_ref,
    *, t_valid: int, head_dim: int, mxu_dtype,
):
    x = x_ref[0].astype(F32)       # (Tp, D)
    kvc = kvc_ref[0].astype(F32)   # (D, D) block-diagonal cross KV
    tp, d = x.shape

    v_ = lambda i: vecs_ref[i].astype(F32)

    # MXU operands in mxu_dtype (bf16 doubles throughput), f32 accumulation.
    def md(a, b):
        return jnp.dot(
            a.astype(mxu_dtype), b.astype(mxu_dtype),
            preferred_element_type=F32,
        )

    def m_(i):
        return mats_ref[i]

    def seg_softmax_rows(q, seg):
        # feature softmax within each head segment of the lane dim (valid
        # under per-row max subtraction; see pallas_attention.py docstring)
        qe = jnp.exp(q - jnp.max(q, axis=1, keepdims=True))
        return qe / md(qe, seg)

    def styl(y, scale, shift, g, b, w, bias):
        h = _ln(y, g, b) * (1.0 + scale) + shift
        h = h * jax.nn.sigmoid(h)  # silu
        return md(h, w) + bias

    seg_i = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0) // head_dim
    seg_j = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1) // head_dim
    seg = (seg_i == seg_j).astype(F32)

    # this layer's AdaLN scale/shift triples: one (Tp, E) x (E, 6D) matmul
    mod = md(emb_ref[0], aw_ref[:]) + ab_ref[0].astype(F32)

    # ---------------------------------------------------- self attention
    xn = _ln(x, v_(0), v_(1))
    q = md(xn, m_(0)) + v_(2)
    k = md(xn, m_(1)) + v_(3)
    v = md(xn, m_(2)) + v_(4)

    row = jax.lax.broadcasted_iota(jnp.int32, (tp, d), 0)
    k = jnp.where(row < t_valid, k, -1e6)
    v = jnp.where(row < t_valid, v, 0.0)

    q_sm = seg_softmax_rows(q, seg)
    ke = jnp.exp(k - jnp.max(k, axis=0, keepdims=True))
    k_sm = ke / jnp.sum(ke, axis=0, keepdims=True)
    # the KV contraction stays f32: k_sm entries are O(1/T) and bf16's 8-bit
    # mantissa visibly degrades the time-softmax average
    kv = jax.lax.dot_general(
        k_sm, v, (((0,), (0,)), ((), ())), preferred_element_type=F32
    ) * seg
    y = md(q_sm, kv)
    x = x + styl(y, mod[:, 0:d], mod[:, d : 2 * d], v_(5), v_(6), m_(3), v_(7))

    # --------------------------------------------------- cross attention
    xn2 = _ln(x, v_(8), v_(9))
    qc = md(xn2, m_(4)) + v_(10)
    qc_sm = seg_softmax_rows(qc, seg)
    y2 = md(qc_sm, kvc)
    x = x + styl(
        y2, mod[:, 2 * d : 3 * d], mod[:, 3 * d : 4 * d],
        v_(11), v_(12), m_(5), v_(13),
    )

    # -------------------------------------------------------------- FFN
    h1 = jax.nn.gelu(md(x, m_(6)) + v_(14))
    y3 = md(h1, m_(7)) + v_(15)
    x = x + styl(
        y3, mod[:, 4 * d : 5 * d], mod[:, 5 * d : 6 * d],
        v_(16), v_(17), m_(8), v_(18),
    )
    o_ref[0] = x.astype(o_ref.dtype)


def fused_decoder_layer(
    x: jnp.ndarray,       # (B, T, D)
    emb_act: jnp.ndarray,  # (B, T, E) = silu(time emb + music proj)
    kv_cross: jnp.ndarray,  # (B, D, D) block-diagonal cross KV
    mats: jnp.ndarray,    # (9, D, D)
    vecs: jnp.ndarray,    # (24, D)
    adaln_w: jnp.ndarray,  # (E, 6D)
    adaln_b: jnp.ndarray,  # (6D,)
    num_heads: int,
    mxu_dtype: jnp.dtype = jnp.float32,
    t_valid: int | None = None,
) -> jnp.ndarray:
    """``t_valid`` lets a caller pass inputs already padded to a sublane
    multiple (rows >= t_valid are masked out of the time softmax and the
    pad/slice here become no-ops) — layer stacks pad ONCE instead of
    round-tripping ~15MB per layer through pad/slice copies."""
    b, t, d = x.shape
    e = emb_act.shape[-1]
    tp = _round_up(t, 8)
    xp = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))
    ep = jnp.pad(emb_act, ((0, 0), (0, tp - t), (0, 0)))

    out = pl.pallas_call(
        functools.partial(
            _layer_kernel, t_valid=t_valid or t, head_dim=d // num_heads,
            mxu_dtype=mxu_dtype,
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, tp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, e), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, d, d), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((24, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((e, 6 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, tp, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * tp * (e * 6 * d + 11 * d * d),
            bytes_accessed=4 * b * tp * (2 * d + e),
            transcendentals=3 * b * tp * d,
        ),
        interpret=jax.default_backend() != "tpu",
    )(xp, ep, kv_cross, mats, vecs, adaln_w, adaln_b.reshape(1, -1))
    return out[:, :t]
