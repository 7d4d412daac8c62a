"""Sampler glue kernels: the per-step work around the denoiser layers.

With the whole-layer kernels in place (`pallas_layer.py`), what remains of a
DDIM step is a string of small XLA fusions — joint embedding + sequence
embedding, silu of the conditioning embedding, the output projection, and the
DDIM update itself.  At ~10 kernel launches over (T, 128)-ish tensors, launch
overhead is a measurable slice of the 1000-step ladder.  Two kernels absorb
it:

- `sampler_prologue`: emb_act = silu(temb + emb_base) and
  h0 = x @ W_joint + (seq_emb + b_joint), in one pass;
- `sampler_epilogue`: x0 = h @ W_out + b_out and the eta=0 DDIM update
  x_{t-1} = alpha*x0 + beta*x_t, where (alpha, beta) fold the whole
  START_X/eps/ddim algebra into two per-step scalars (see
  `ddim_affine_tables`).

The pose dim (26) is zero-padded to the 128-lane width once for the whole
scan; padded lanes provably stay zero through both kernels (W_out's padded
columns are zero, and beta multiplies a zero lane).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..diffusion.schedule import DiffusionSchedule

F32 = jnp.float32


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def ddim_affine_tables(sched: DiffusionSchedule) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-step (alpha, beta) with x_{t-1} = alpha*x0_pred + beta*x_t.

    Derived from the eta=0 DDIM update under START_X / clip_denoised=False
    (`diffusion/sampling.py:ddim_step`):
        eps    = (sqrt_recip_ab * x_t - x0) / sqrt_recipm1_ab
        x_next = sqrt(ab_prev) * x0 + sqrt(1 - ab_prev) * eps
    """
    ab_prev = np.asarray(sched.alphas_cumprod_prev)
    sr = np.asarray(sched.sqrt_recip_alphas_cumprod)
    srm1 = np.asarray(sched.sqrt_recipm1_alphas_cumprod)
    coef = np.sqrt(np.maximum(1.0 - ab_prev, 0.0)) / srm1
    alpha = np.sqrt(ab_prev) - coef
    beta = coef * sr
    return jnp.asarray(alpha, F32), jnp.asarray(beta, F32)


def _prologue_kernel(x_ref, emb_ref_in, wj_ref, seqb_ref, h_ref, emb_ref,
                     *srow_ref, mxu_dtype, quantize_emb=False):
    x = x_ref[0]
    emb = emb_ref_in[0].astype(F32)
    emb_act = emb * jax.nn.sigmoid(emb)  # silu
    if quantize_emb:
        from .pallas_layer import quantize_rows

        # symmetric per-row int8; the int8 write is 4x smaller than the
        # f32 emb_act it replaces
        q, scale = quantize_rows(emb_act)
        emb_ref[0] = q
        srow_ref[0][0] = scale
    else:
        emb_ref[0] = emb_act.astype(emb_ref.dtype)
    h = jnp.dot(
        x.astype(mxu_dtype), wj_ref[:].astype(mxu_dtype),
        preferred_element_type=F32,
    )
    h_ref[0] = (h + seqb_ref[:].astype(F32)).astype(h_ref.dtype)


def sampler_prologue(
    x: jnp.ndarray,        # (B, T, P) padded pose
    emb: jnp.ndarray,      # (B, T, E) = temb[:, None] + emb_base (pre-silu)
    w_joint: jnp.ndarray,  # (P, D)
    seq_bias: jnp.ndarray,  # (T, D) = seq_emb + b_joint
    *,
    mxu_dtype=F32,
    emb_dtype=F32,
    quantize_emb=False,
):
    """Returns ``(h, emb_act)`` — or ``(h, emb_q int8, row_scale f32)`` when
    ``quantize_emb`` (the int8-AdaLN sampling mode, quantized once per step
    here so every layer of the stack kernel reads int8)."""
    b, t, p = x.shape
    e = emb.shape[-1]
    d = w_joint.shape[-1]
    tp = _round_up(t, 8)
    pad = lambda a: jnp.pad(a, ((0, 0), (0, tp - t), (0, 0)))
    out_specs = [
        pl.BlockSpec((1, tp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tp, e), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, tp, d), F32),
        jax.ShapeDtypeStruct((b, tp, e), jnp.int8 if quantize_emb else emb_dtype),
    ]
    if quantize_emb:
        out_specs.append(
            pl.BlockSpec((1, tp, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((b, tp, 1), F32))
    outs = pl.pallas_call(
        functools.partial(
            _prologue_kernel, mxu_dtype=mxu_dtype, quantize_emb=quantize_emb
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, tp, p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, e), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((p, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=jax.default_backend() != "tpu",
    )(pad(x), pad(emb), w_joint, jnp.pad(seq_bias, ((0, tp - t), (0, 0))))
    return tuple(o[:, :t] for o in outs)


def _epilogue_kernel(h_ref, xt_ref, wout_ref, bout_ref, ab_ref, o_ref,
                     *, mxu_dtype):
    x0 = (
        jnp.dot(
            h_ref[0].astype(mxu_dtype), wout_ref[:].astype(mxu_dtype),
            preferred_element_type=F32,
        )
        + bout_ref[:].astype(F32)
    )
    alpha = ab_ref[0, 0]
    beta = ab_ref[0, 1]
    o_ref[0] = (alpha * x0 + beta * xt_ref[0].astype(F32)).astype(o_ref.dtype)


def sampler_epilogue(
    h: jnp.ndarray,       # (B, T, D)
    x_t: jnp.ndarray,     # (B, T, P)
    w_out: jnp.ndarray,   # (D, P) padded columns zero
    b_out: jnp.ndarray,   # (P,) padded zero
    alpha: jnp.ndarray,   # () scalar
    beta: jnp.ndarray,    # () scalar
    *,
    mxu_dtype=F32,
):
    b, t, d = h.shape
    p = x_t.shape[-1]
    tp = _round_up(t, 8)
    pad = lambda a: jnp.pad(a, ((0, 0), (0, tp - t), (0, 0)))
    ab = jnp.stack([alpha, beta]).reshape(1, 2).astype(F32)
    out = pl.pallas_call(
        functools.partial(_epilogue_kernel, mxu_dtype=mxu_dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, tp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tp, p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, tp, p), x_t.dtype),
        interpret=jax.default_backend() != "tpu",
    )(pad(h), pad(x_t), w_out, b_out.reshape(1, -1), ab)
    return out[:, :t]
