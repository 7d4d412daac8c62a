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
    return (x - mu) * jax.lax.rsqrt(var + 1e-5) * g + b


def _layer_body(
    x, emb, kvc, m_, v_, aw, ab, *, t_valid: int, head_dim: int, mxu_dtype,
    vpu_dtype=F32, emb_scale=None, aw_scale=None,
):
    """One decoder layer on f32 values already in VMEM/registers.

    ``x`` (Tp, D) f32; ``emb`` (Tp, E) raw-dtype activations; ``kvc`` (D, D)
    f32 block-diagonal cross KV; ``m_(i)``/``v_(i)`` yield the i-th weight
    matrix (raw dtype) / vector row (f32); ``aw``/``ab`` this layer's AdaLN
    slice.  Shared by the per-layer kernel and the whole-stack kernel.

    ``vpu_dtype`` (opt-in bfloat16): run the transcendental-heavy elementwise
    chains — the query feature-softmax exps, the stylization silu, the FFN
    gelu — at bf16 (packed 2x VPU ops).  These are the serialized VPU work
    that bounds the sampling step (NOTES r1: ~18 GFLOP/step should take
    ~90 us on the MXU; measured ~190 us).  LayerNorm statistics, residuals,
    and the time-softmax normalization stay f32: LN at bf16 drifts ~1e-2 and
    the time softmax averages O(1/T) values below bf16 resolution.

    ``emb_scale``/``aw_scale`` (opt-in int8 AdaLN): when given, ``emb`` is
    int8 rows pre-quantized with per-row scales ``emb_scale`` (Tp, 1) and
    ``aw`` is int8 with per-column scales ``aw_scale`` (1, 6D); the
    modulation matmul — ~68% of the step FLOPs — runs on the MXU's int8
    path (2x bf16 on v5e) with int32 accumulation, dequantized in f32.
    """
    tp, d = x.shape
    vd = vpu_dtype

    # MXU operands in mxu_dtype (bf16 doubles throughput), f32 accumulation.
    def md(a, b):
        return jnp.dot(
            a.astype(mxu_dtype), b.astype(mxu_dtype),
            preferred_element_type=F32,
        )

    def seg_softmax_rows(q, seg):
        # feature softmax within each head segment of the lane dim (valid
        # under per-row max subtraction; see pallas_attention.py docstring)
        qe = jnp.exp((q - jnp.max(q, axis=1, keepdims=True)).astype(vd))
        return qe.astype(F32) / md(qe, seg)

    def styl(y, scale, shift, g, b, w, bias):
        h = (_ln(y, g, b) * (1.0 + scale) + shift).astype(vd)
        # silu via explicit exp: Mosaic's `logistic` lowering broadcasts an
        # f32 constant and fails verification on bf16 operands
        h = h / (1.0 + jnp.exp(-h))
        return md(h, w) + bias

    seg_i = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0) // head_dim
    seg_j = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1) // head_dim
    seg = (seg_i == seg_j).astype(F32)

    # this layer's AdaLN scale/shift triples: one (Tp, E) x (E, 6D) matmul
    if aw_scale is not None:
        acc = jax.lax.dot_general(
            emb, aw, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        mod = acc.astype(F32) * (emb_scale * aw_scale) + ab.astype(F32)
    else:
        mod = md(emb, aw) + ab.astype(F32)

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
    h1 = jax.nn.gelu((md(x, m_(6)) + v_(14)).astype(vd))
    y3 = md(h1, m_(7)) + v_(15)
    x = x + styl(
        y3, mod[:, 4 * d : 5 * d], mod[:, 5 * d : 6 * d],
        v_(16), v_(17), m_(8), v_(18),
    )
    return x


def _layer_kernel(
    x_ref, emb_ref, kvc_ref, mats_ref, vecs_ref, aw_ref, ab_ref, o_ref,
    *, t_valid: int, head_dim: int, mxu_dtype, vpu_dtype=F32,
):
    x = _layer_body(
        x_ref[0].astype(F32), emb_ref[0], kvc_ref[0].astype(F32),
        lambda i: mats_ref[i], lambda i: vecs_ref[i].astype(F32),
        aw_ref[:], ab_ref[0],
        t_valid=t_valid, head_dim=head_dim, mxu_dtype=mxu_dtype,
        vpu_dtype=vpu_dtype,
    )
    o_ref[0] = x.astype(o_ref.dtype)


def _stack_kernel(
    *refs,
    t_valid: int, head_dim: int, mxu_dtype, num_layers: int, vpu_dtype=F32,
    adaln_int8: bool = False,
):
    if adaln_int8:
        (x_ref, emb_ref, srow_ref, kvc_ref, mats_ref, vecs_ref, aw_ref,
         ascale_ref, ab_ref, o_ref, h_scr) = refs
    else:
        (x_ref, emb_ref, kvc_ref, mats_ref, vecs_ref, aw_ref, ab_ref,
         o_ref, h_scr) = refs
    layer = pl.program_id(1)

    @pl.when(layer == 0)
    def _():
        h_scr[...] = x_ref[0].astype(F32)

    x = _layer_body(
        h_scr[...], emb_ref[0], kvc_ref[0, 0].astype(F32),
        lambda i: mats_ref[0, i], lambda i: vecs_ref[0, i].astype(F32),
        aw_ref[0], ab_ref[0, 0],
        t_valid=t_valid, head_dim=head_dim, mxu_dtype=mxu_dtype,
        vpu_dtype=vpu_dtype,
        emb_scale=srow_ref[0].astype(F32) if adaln_int8 else None,
        aw_scale=ascale_ref[0] if adaln_int8 else None,
    )
    h_scr[...] = x

    @pl.when(layer == num_layers - 1)
    def _():
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
    vpu_dtype: jnp.dtype = jnp.float32,
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
            mxu_dtype=mxu_dtype, vpu_dtype=vpu_dtype,
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


def fused_decoder_stack(
    x: jnp.ndarray,        # (B, T, D)
    emb_act: jnp.ndarray,  # (B, T, E) = silu(time emb + music proj)
    kv_cross: jnp.ndarray,  # (L, B, D, D) per-layer block-diagonal cross KV
    mats: jnp.ndarray,     # (L, 9, D, D)
    vecs: jnp.ndarray,     # (L, 24, D)
    adaln_w: jnp.ndarray,  # (L, E, 6D)
    adaln_b: jnp.ndarray,  # (L, 6D)
    num_heads: int,
    mxu_dtype: jnp.dtype = jnp.float32,
    vpu_dtype: jnp.dtype = jnp.float32,
    emb_scale: jnp.ndarray | None = None,   # (B, T, 1) f32 — int8 AdaLN mode
    adaln_w_scale: jnp.ndarray | None = None,  # (L, 1, 6D) f32 — int8 AdaLN mode
) -> jnp.ndarray:
    """All ``L`` decoder layers in ONE kernel: grid ``(B, L)`` with the
    residual stream held in an f32 VMEM scratch across the (sequential)
    layer axis.  Versus ``L`` separate `fused_decoder_layer` calls this
    removes the per-layer HBM round trip of the (T, D) stream and the
    per-layer refetch of ``emb_act`` (their block indices depend only on the
    batch coordinate, so Mosaic keeps them resident), and double-buffers
    layer ``l+1``'s weight DMA behind layer ``l``'s compute.  The f32 carry
    is numerically at least as close to the flax reference as the bf16 HBM
    carry it replaces.

    int8-AdaLN mode (``emb_scale``/``adaln_w_scale`` given): ``emb_act`` is
    int8 per-row-quantized activations and ``adaln_w`` int8 per-column-
    quantized weights; the modulation matmul runs on the MXU int8 path
    (see `_layer_body`).  Quantize once per step with `quantize_rows`."""
    num_layers, b = mats.shape[0], x.shape[0]
    t, d = x.shape[1], x.shape[2]
    e = emb_act.shape[-1]
    tp = _round_up(t, 8)
    xp = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))
    ep = jnp.pad(emb_act, ((0, 0), (0, tp - t), (0, 0)))
    adaln_int8 = adaln_w_scale is not None

    in_specs = [
        pl.BlockSpec((1, tp, d), lambda i, l: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tp, e), lambda i, l: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, d, d), lambda i, l: (l, i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 9, d, d), lambda i, l: (l, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 24, d), lambda i, l: (l, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, e, 6 * d), lambda i, l: (l, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 6 * d), lambda i, l: (l, 0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [xp, ep, kv_cross, mats, vecs, adaln_w, adaln_b[:, None, :]]
    if adaln_int8:
        sp = jnp.pad(emb_scale, ((0, 0), (0, tp - t), (0, 0)))
        in_specs.insert(2, pl.BlockSpec(
            (1, tp, 1), lambda i, l: (i, 0, 0), memory_space=pltpu.VMEM))
        operands.insert(2, sp)
        in_specs.insert(7, pl.BlockSpec(
            (1, 1, 6 * d), lambda i, l: (l, 0, 0), memory_space=pltpu.VMEM))
        operands.insert(7, adaln_w_scale)

    out = pl.pallas_call(
        functools.partial(
            _stack_kernel, t_valid=t, head_dim=d // num_heads,
            mxu_dtype=mxu_dtype, num_layers=num_layers, vpu_dtype=vpu_dtype,
            adaln_int8=adaln_int8,
        ),
        grid=(b, num_layers),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, tp, d), lambda i, l: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, tp, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((tp, d), F32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * num_layers * tp * (e * 6 * d + 11 * d * d),
            bytes_accessed=4 * b * tp * (2 * d + e)
            + 2 * num_layers * (9 * d * d + e * 6 * d),
            transcendentals=3 * b * num_layers * tp * d,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",
    )(*operands)
    return out[:, :t]


def quantize_rows(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-row int8 quantization over the last axis.

    Returns (q int8, scale f32 with a trailing singleton axis) such that
    ``q * scale ~= x``.  Used once per sampling step on the shared AdaLN
    activations (and at pack time on the AdaLN weights, per column via a
    transpose)."""
    scale = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-8) / 127.0
    q = jnp.round(x / scale).astype(jnp.int8)
    return q, scale.astype(F32)
