"""Whole-DecoderLayer fused TRAINING path: custom_vjp over the packed-weight
layer of `pallas_layer.py`.

Forward reuses `fused_decoder_layer` (one kernel per batch element, all ~11
matmuls VMEM-resident).  Backward is ONE kernel per layer that recomputes the
forward per sublayer (flash-attention-style: residuals are only the layer
inputs) and emits every gradient:

    dx, d_emb_act, d_kv_cross, d_mats (9,D,D), d_vecs (24,D),
    d_adaln_w (E,6D), d_adaln_b (6D)

Weight gradients accumulate across the sequential (B,) grid into revisited
output blocks (init at program_id 0).  Sublayers are re-derived and freed one
at a time — peak VMEM stays ~one sublayer's working set, not the whole
layer's activation stack.

Restrictions (the trainer falls back to the composable flax path otherwise):
efficient attention, dropout 0, and a full src_mask — the framework's
default training configuration (`TrainConfig.replicate_reference_mask` off).
Scan-padding rows beyond `t_valid` carry zero cotangents and are masked out
of the time softmax exactly as in the forward.

Gradient parity vs `jax.grad` of the same math in plain jnp is pinned in
`tests/test_pallas_layer_bwd.py` (interpret mode on CPU — the TPU code path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_layer import _round_up, fused_decoder_layer

F32 = jnp.float32


def _ln_fwd(x, g, b):
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    r = jax.lax.rsqrt(jnp.mean(xc * xc, axis=-1, keepdims=True) + 1e-5)
    xhat = xc * r
    return xhat * g + b, xhat, r


def _ln_bwd(dxn, xhat, r, g):
    """d/dx of LN given upstream dxn; also returns (dg, db) row-sums."""
    dg = jnp.sum(dxn * xhat, axis=0)
    db = jnp.sum(dxn, axis=0)
    dxh = dxn * g
    m1 = jnp.mean(dxh, axis=-1, keepdims=True)
    m2 = jnp.mean(dxh * xhat, axis=-1, keepdims=True)
    return r * (dxh - m1 - xhat * m2), dg, db


def _silu_bwd(dh_out, h):
    s = jax.nn.sigmoid(h)
    return dh_out * s * (1.0 + h * (1.0 - s))


def _gelu_bwd(dz, z):
    # tanh-approx gelu (jax.nn.gelu default), exact derivative
    c = 0.7978845608028654  # sqrt(2/pi)
    u = c * (z + 0.044715 * z**3)
    t = jnp.tanh(u)
    du = c * (1.0 + 3 * 0.044715 * z * z)
    return dz * (0.5 * (1.0 + t) + 0.5 * z * (1.0 - t * t) * du)


def _layer_bwd_kernel(
    # inputs
    x_ref, emb_ref, kvc_ref, mats_ref, vecs_ref, aw_ref, ab_ref, dy_ref,
    # outputs
    dx_ref, demb_ref, dkvc_ref, dmats_ref, dvecs_ref, daw_ref, dab_ref,
    *, t_valid: int, head_dim: int, mxu_dtype,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dmats_ref[...] = jnp.zeros(dmats_ref.shape, dmats_ref.dtype)
        dvecs_ref[...] = jnp.zeros(dvecs_ref.shape, dvecs_ref.dtype)
        daw_ref[...] = jnp.zeros(daw_ref.shape, daw_ref.dtype)
        dab_ref[...] = jnp.zeros(dab_ref.shape, dab_ref.dtype)

    # inputs stay in their storage dtype — every consumer either feeds an
    # MXU operand (cast to mxu_dtype inside md/_dots) or casts f32 locally
    # (_ln_fwd, styl_bwd).  Persistent f32 copies cost ~0.5-2MB each of a
    # 16MB scoped-VMEM budget this kernel runs right at the edge of.
    x0 = x_ref[0]
    emb = emb_ref[0]
    kvc = kvc_ref[0]
    dy = dy_ref[0]
    tp, d = x0.shape

    v_ = lambda i_: vecs_ref[i_].astype(F32)
    m_ = lambda i_: mats_ref[i_]

    def md(a, b):
        return jnp.dot(
            a.astype(mxu_dtype), b.astype(mxu_dtype),
            preferred_element_type=F32,
        )

    seg_i = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0) // head_dim
    seg_j = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1) // head_dim
    seg = (seg_i == seg_j).astype(F32)
    # (Tp, 1) column masks broadcast against (Tp, D) operands — a (Tp, D)
    # materialization is ~0.5MB each of a tight scoped-VMEM budget
    row = jax.lax.broadcasted_iota(jnp.int32, (tp, 1), 0)
    valid = (row < t_valid).astype(F32)

    def mod_slice(k):
        """This sublayer's (scale, shift): emb @ aw[:, kD:(k+2)D] + ab."""
        w = aw_ref[:, k * d : (k + 2) * d]
        bias = ab_ref[0, k * d : (k + 2) * d].astype(F32)
        return md(emb, w) + bias

    def mod_bwd(k, dmod):
        """Accumulate d_aw/d_ab for slice k, return d_emb contribution."""
        daw_ref[:, k * d : (k + 2) * d] += jnp.dot(
            emb.astype(mxu_dtype).T, dmod.astype(mxu_dtype),
            preferred_element_type=F32,
        ).astype(daw_ref.dtype)
        dab_ref[0, k * d : (k + 2) * d] += jnp.sum(dmod, axis=0).astype(
            dab_ref.dtype
        )
        return jnp.dot(
            dmod.astype(mxu_dtype), aw_ref[:, k * d : (k + 2) * d].astype(mxu_dtype).T,
            preferred_element_type=F32,
        )

    def styl_fwd(y, mod, gi, bi, wi, boi):
        """Stylization block forward (no stash — bwd recomputes from y)."""
        scale, shift = mod[:, :d], mod[:, d:]
        ln_y, _, _ = _ln_fwd(y, v_(gi), v_(bi))
        h = ln_y * (1.0 + scale) + shift
        hs = h * jax.nn.sigmoid(h)
        return md(hs, m_(wi)) + v_(boi)

    def styl_bwd(do, y, mod, gi, bi, wi, boi):
        """Recompute the block from (y, mod), return (dy, dmod (Tp,2D));
        accumulates weight grads."""
        do = do.astype(F32)
        scale, shift = mod[:, :d], mod[:, d:]
        ln_y, xhat, r = _ln_fwd(y, v_(gi), v_(bi))
        h = ln_y * (1.0 + scale) + shift
        hs = h * jax.nn.sigmoid(h)
        dvecs_ref[boi] += jnp.sum(do, axis=0).astype(dvecs_ref.dtype)
        dmats_ref[wi] += jnp.dot(
            hs.astype(mxu_dtype).T, do.astype(mxu_dtype),
            preferred_element_type=F32,
        ).astype(dmats_ref.dtype)
        dhs = jnp.dot(
            do.astype(mxu_dtype), m_(wi).astype(mxu_dtype).T,
            preferred_element_type=F32,
        )
        dh = _silu_bwd(dhs, h)
        dscale = dh * ln_y
        dshift = dh
        dln = dh * (1.0 + scale)
        dy_, dg, db = _ln_bwd(dln, xhat, r, v_(gi))
        dvecs_ref[gi] += dg.astype(dvecs_ref.dtype)
        dvecs_ref[bi] += db.astype(dvecs_ref.dtype)
        return dy_, jnp.concatenate([dscale, dshift], axis=-1)

    def dense_bwd(dq, xn, wi, bqi):
        """Grad through q = xn @ W + b; returns dxn contribution."""
        dmats_ref[wi] += jnp.dot(
            xn.astype(mxu_dtype).T, dq.astype(mxu_dtype),
            preferred_element_type=F32,
        ).astype(dmats_ref.dtype)
        dvecs_ref[bqi] += jnp.sum(dq, axis=0).astype(dvecs_ref.dtype)
        return jnp.dot(
            dq.astype(mxu_dtype), m_(wi).astype(mxu_dtype).T,
            preferred_element_type=F32,
        )

    def seg_softmax(q):
        qe = jnp.exp(q - jnp.max(q, axis=1, keepdims=True))
        return qe / md(qe, seg)

    def seg_softmax_bwd(ds, s):
        dot = md(ds * s, seg)  # per-position segment sum of ds*s
        return s * ds - s * dot

    def self_attn_fwd(xb):
        """(y1 pre-styl, x1) without keeping internals."""
        xn, _, _ = _ln_fwd(xb, v_(0), v_(1))
        q = md(xn, m_(0)) + v_(2)
        k = md(xn, m_(1)) + v_(3)
        v = (md(xn, m_(2)) + v_(4)) * valid
        k = jnp.where(row < t_valid, k, -1e6)
        qs = seg_softmax(q)
        ke = jnp.exp(k - jnp.max(k, axis=0, keepdims=True))
        ks = ke / jnp.sum(ke, axis=0, keepdims=True)
        kv = jax.lax.dot_general(
            ks, v, (((0,), (0,)), ((), ())), preferred_element_type=F32
        ) * seg
        return md(qs, kv)

    # --------- forward chain: sublayer inputs only (x1, x2) ---------------
    x1 = x0 + styl_fwd(self_attn_fwd(x0), mod_slice(0), 5, 6, 3, 7)

    xn2_f, _, _ = _ln_fwd(x1, v_(8), v_(9))
    qcs_f = seg_softmax(md(xn2_f, m_(4)) + v_(10))
    x2 = x1 + styl_fwd(md(qcs_f, kvc), mod_slice(2), 11, 12, 5, 13)

    # ------------- backward, one sublayer at a time (FFN first) -----------
    # FFN (recompute from x2)
    z = md(x2, m_(6)) + v_(14)
    h1 = jax.nn.gelu(z)
    y3 = md(h1, m_(7)) + v_(15)
    dy3, dmod2 = styl_bwd(dy, y3, mod_slice(4), 16, 17, 8, 18)
    # demb accumulates straight into the output block (bf16 in training):
    # a persistent (Tp, E) f32 accumulator is ~2MB of scoped VMEM
    demb_ref[0] = mod_bwd(4, dmod2).astype(demb_ref.dtype)
    dvecs_ref[15] += jnp.sum(dy3, axis=0).astype(dvecs_ref.dtype)
    dmats_ref[7] += jnp.dot(
        h1.astype(mxu_dtype).T, dy3.astype(mxu_dtype), preferred_element_type=F32
    ).astype(dmats_ref.dtype)
    dh1 = jnp.dot(
        dy3.astype(mxu_dtype), m_(7).astype(mxu_dtype).T, preferred_element_type=F32
    )
    dz = _gelu_bwd(dh1, z)
    dvecs_ref[14] += jnp.sum(dz, axis=0).astype(dvecs_ref.dtype)
    dmats_ref[6] += jnp.dot(
        x2.astype(mxu_dtype).T, dz.astype(mxu_dtype), preferred_element_type=F32
    ).astype(dmats_ref.dtype)
    dx2 = dy + jnp.dot(
        dz.astype(mxu_dtype), m_(6).astype(mxu_dtype).T, preferred_element_type=F32
    )

    # cross-attention (recompute from x1)
    xn2, xhat2, r2 = _ln_fwd(x1, v_(8), v_(9))
    qcs = seg_softmax(md(xn2, m_(4)) + v_(10))
    y2 = md(qcs, kvc)
    dy2, dmod1 = styl_bwd(dx2, y2, mod_slice(2), 11, 12, 5, 13)
    demb_ref[0] += mod_bwd(2, dmod1).astype(demb_ref.dtype)
    dkvc_ref[0] = jnp.dot(
        qcs.astype(mxu_dtype).T, dy2.astype(mxu_dtype), preferred_element_type=F32
    ).astype(dkvc_ref.dtype)
    dqcs = jnp.dot(
        dy2.astype(mxu_dtype), kvc.astype(mxu_dtype).T, preferred_element_type=F32
    )
    dqc = seg_softmax_bwd(dqcs, qcs)
    dxn2 = dense_bwd(dqc, xn2, 4, 10)
    dln2, dg2, db2 = _ln_bwd(dxn2, xhat2, r2, v_(8))
    dvecs_ref[8] += dg2.astype(dvecs_ref.dtype)
    dvecs_ref[9] += db2.astype(dvecs_ref.dtype)
    dx1 = dx2 + dln2

    # self-attention (recompute from x0)
    xn, xhat0, r0 = _ln_fwd(x0, v_(0), v_(1))
    q = md(xn, m_(0)) + v_(2)
    k = md(xn, m_(1)) + v_(3)
    v = (md(xn, m_(2)) + v_(4)) * valid
    k = jnp.where(row < t_valid, k, -1e6)
    qs = seg_softmax(q)
    ke = jnp.exp(k - jnp.max(k, axis=0, keepdims=True))
    ks = ke / jnp.sum(ke, axis=0, keepdims=True)
    kv = jax.lax.dot_general(
        ks, v, (((0,), (0,)), ((), ())), preferred_element_type=F32
    ) * seg
    dy1, dmod0 = styl_bwd(dx1, md(qs, kv), mod_slice(0), 5, 6, 3, 7)
    demb_ref[0] += mod_bwd(0, dmod0).astype(demb_ref.dtype)
    dqs = jnp.dot(
        dy1.astype(mxu_dtype), kv.astype(mxu_dtype).T, preferred_element_type=F32
    )
    dkv = jnp.dot(
        qs.astype(mxu_dtype).T, dy1.astype(mxu_dtype), preferred_element_type=F32
    ) * seg
    dks = jnp.dot(
        v.astype(mxu_dtype), dkv.astype(mxu_dtype).T, preferred_element_type=F32
    )
    dv = jnp.dot(
        ks.astype(mxu_dtype), dkv.astype(mxu_dtype), preferred_element_type=F32
    ) * valid
    # time-softmax backward (per column over rows); masked rows have ks=0
    dk = ks * (dks - jnp.sum(dks * ks, axis=0, keepdims=True))
    dk = dk * valid  # -1e6-masked rows are constants, no gradient
    dq = seg_softmax_bwd(dqs, qs)
    dxn = dense_bwd(dq, xn, 0, 2)
    dxn = dxn + dense_bwd(dk, xn, 1, 3)
    dxn = dxn + dense_bwd(dv, xn, 2, 4)
    dln0, dg0, db0 = _ln_bwd(dxn, xhat0, r0, v_(0))
    dvecs_ref[0] += dg0.astype(dvecs_ref.dtype)
    dvecs_ref[1] += db0.astype(dvecs_ref.dtype)
    dx0 = dx1 + dln0

    dx_ref[0] = dx0.astype(dx_ref.dtype)


def _bwd_pallas_call(x, emb_act, kv_cross, mats, vecs, adaln_w, adaln_b, dy,
                     *, t_valid, head_dim, mxu_dtype):
    b, tp, d = x.shape
    e = emb_act.shape[-1]
    kernel = functools.partial(
        _layer_bwd_kernel, t_valid=t_valid, head_dim=head_dim,
        mxu_dtype=mxu_dtype,
    )
    out_shapes = (
        jax.ShapeDtypeStruct((b, tp, d), x.dtype),          # dx
        jax.ShapeDtypeStruct((b, tp, e), emb_act.dtype),    # demb
        jax.ShapeDtypeStruct((b, d, d), kv_cross.dtype),    # dkvc
        jax.ShapeDtypeStruct((9, d, d), F32),               # dmats
        jax.ShapeDtypeStruct((24, d), F32),                 # dvecs
        jax.ShapeDtypeStruct((e, 6 * d), F32),              # daw
        jax.ShapeDtypeStruct((1, 6 * d), F32),              # dab
    )
    batch_spec = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i: (i,) + (0,) * len(shape), memory_space=pltpu.VMEM
    )
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            batch_spec((tp, d)),        # x
            batch_spec((tp, e)),        # emb
            batch_spec((d, d)),         # kvc
            const_spec((9, d, d)),      # mats
            const_spec((24, d)),        # vecs
            const_spec((e, 6 * d)),     # aw
            const_spec((1, 6 * d)),     # ab
            batch_spec((tp, d)),        # dy
        ],
        out_specs=(
            batch_spec((tp, d)),
            batch_spec((tp, e)),
            batch_spec((d, d)),
            const_spec((9, d, d)),
            const_spec((24, d)),
            const_spec((e, 6 * d)),
            const_spec((1, 6 * d)),
        ),
        out_shape=out_shapes,
        # whole-layer recompute peaks ~18MB of VMEM working set — above the
        # compiler's 16MB default scoped budget (v5e has 128MB); observed to
        # OOM context-dependently at the default
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(x, emb_act, kv_cross, mats, vecs, adaln_w, adaln_b, dy)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_decoder_layer_train(
    x, emb_act, kv_cross, mats, vecs, adaln_w, adaln_b,
    num_heads: int, mxu_dtype=jnp.bfloat16, t_valid: int | None = None,
):
    """Differentiable fused decoder layer (packed weights, full mask).

    Same forward as `fused_decoder_layer`; gradients via one fused backward
    kernel (see module docstring).  Pass inputs pre-padded to a sublane
    multiple with ``t_valid`` = the real row count so a layer STACK pads
    once instead of pad/slice round trips in all 2*num_layers kernels."""
    return fused_decoder_layer(
        x, emb_act, kv_cross, mats, vecs, adaln_b=adaln_b, adaln_w=adaln_w,
        num_heads=num_heads, mxu_dtype=mxu_dtype, t_valid=t_valid,
    )


def _train_fwd(x, emb_act, kv_cross, mats, vecs, adaln_w, adaln_b,
               num_heads, mxu_dtype, t_valid):
    out = fused_decoder_layer_train(
        x, emb_act, kv_cross, mats, vecs, adaln_w, adaln_b,
        num_heads, mxu_dtype, t_valid,
    )
    return out, (x, emb_act, kv_cross, mats, vecs, adaln_w, adaln_b)


def _train_bwd(num_heads, mxu_dtype, t_valid, res, dy):
    x, emb_act, kv_cross, mats, vecs, adaln_w, adaln_b = res
    b, t, d = x.shape
    tp = _round_up(t, 8)
    e = emb_act.shape[-1]
    xp = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))
    ep = jnp.pad(emb_act, ((0, 0), (0, tp - t), (0, 0)))
    dyp = jnp.pad(dy, ((0, 0), (0, tp - t), (0, 0)))
    dx, demb, dkvc, dmats, dvecs, daw, dab = _bwd_pallas_call(
        xp, ep, kv_cross, mats, vecs, adaln_w, adaln_b.reshape(1, -1), dyp,
        t_valid=t_valid or t, head_dim=d // num_heads, mxu_dtype=mxu_dtype,
    )
    return (
        dx[:, :t],
        demb[:, :t],
        dkvc.astype(kv_cross.dtype),
        dmats.astype(mats.dtype),
        dvecs.astype(vecs.dtype),
        daw.astype(adaln_w.dtype),
        dab.reshape(-1).astype(adaln_b.dtype),
    )


fused_decoder_layer_train.defvjp(_train_fwd, _train_bwd)
