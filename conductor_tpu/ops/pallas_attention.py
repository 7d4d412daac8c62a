"""Fused Pallas TPU kernel for the linear temporal attention hot path.

The reference computes efficient attention per head with (T, 16) x (16, 16)
einsums (`Diffusion_Stage/models/transformer.py:107-119`) — with head_dim=16
those matmuls light up 16 of the MXU's 128 lanes (12.5 % utilization) and the
six intermediate (T, D) tensors (two softmaxes, kv, y, ...) each round-trip
HBM under eager fusion boundaries.

This kernel reformulates the whole sub-computation as *full-width* D x D MXU
work in one VMEM-resident pass per batch element:

  1. q feature-softmax — per head segment of the lane dim.  Subtracting the
     per-row max (a constant within every segment) leaves each segment's
     softmax unchanged, so no per-segment max is needed; segment sums come
     from one matmul with a block-diagonal ones matrix (MXU, not a gather).
  2. k time-softmax — plain axis-0 reduction (VPU).
  3. kv = k^T v as a single (D, T) x (T, D) matmul, masked to the
     block-diagonal head structure (equivalent to the per-head restriction).
  4. y = q @ kv as a (T, D) x (D, D) matmul.

Numerics match `conductor_tpu.ops.linear_attention` (the XLA path) to float
tolerance; the additive ``-1e6`` key mask quirk (SURVEY.md §7.4) is applied by
the shared dispatcher before the kernel.  Backward pass: `jax.custom_vjp`
whose bwd differentiates the XLA formulation — training and sampling both run
through the fused forward.

All math is done in float32 inside the kernel regardless of input dtype
(bfloat16 inputs are upcast on-chip; softmax in bf16 loses beat alignment).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, t_k: int, head_dim: int):
    f32 = jnp.float32
    q = q_ref[0].astype(f32)  # (Tq_pad, D_pad)
    k = k_ref[0].astype(f32)  # (Tk_pad, D_pad)
    v = v_ref[0].astype(f32)
    tk_pad, d_pad = k.shape

    # Padded key rows must not contribute to the time softmax.
    row = jax.lax.broadcasted_iota(jnp.int32, (tk_pad, d_pad), 0)
    k = jnp.where(row < t_k, k, -1e6)

    # Block-diagonal head structure as a compile-time-constant (D, D) mask.
    seg_i = jax.lax.broadcasted_iota(jnp.int32, (d_pad, d_pad), 0) // head_dim
    seg_j = jax.lax.broadcasted_iota(jnp.int32, (d_pad, d_pad), 1) // head_dim
    seg = (seg_i == seg_j).astype(f32)

    # q: softmax over each head segment of the lane dim (see module docstring
    # for why the per-row max suffices).
    qe = jnp.exp(q - jnp.max(q, axis=1, keepdims=True))
    qsum = jnp.dot(qe, seg, preferred_element_type=f32)
    q_sm = qe / qsum

    # k: softmax over time, per (head, feature) lane.
    ke = jnp.exp(k - jnp.max(k, axis=0, keepdims=True))
    k_sm = ke / jnp.sum(ke, axis=0, keepdims=True)

    # kv = k^T v restricted to head blocks; y = q @ kv.
    kv = jax.lax.dot_general(
        k_sm, v, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )
    kv = kv * seg
    o_ref[0] = jnp.dot(q_sm, kv, preferred_element_type=f32).astype(o_ref.dtype)


def _pallas_forward(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    *,
    interpret: bool,
) -> jnp.ndarray:
    b, t_q, d = q.shape
    t_k = k.shape[1]
    head_dim = d // num_heads
    d_pad = _round_up(d, 128)
    tq_pad = _round_up(t_q, 8)
    tk_pad = _round_up(t_k, 8)

    qp = jnp.pad(q, ((0, 0), (0, tq_pad - t_q), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, tk_pad - t_k), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, tk_pad - t_k), (0, d_pad - d)))

    flops = 2 * b * d_pad * d_pad * (2 * tq_pad + tk_pad)
    out = pl.pallas_call(
        functools.partial(_attention_kernel, t_k=t_k, head_dim=head_dim),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, tq_pad, d_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, d_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, d_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tq_pad, d_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, tq_pad, d_pad), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * b * d_pad * (3 * tk_pad + 2 * tq_pad),
            transcendentals=b * d_pad * (tq_pad + tk_pad),
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :t_q, :d]


def _xla_forward(q, k, v, num_heads):
    """Reference XLA formulation — used for the backward pass and as the
    numerics oracle in tests.  Matches `ops.linear_attention` exactly."""
    b, t_q, d = q.shape
    h = num_heads
    qh = jax.nn.softmax(q.reshape(b, t_q, h, d // h), axis=-1)
    kh = jax.nn.softmax(k.reshape(b, -1, h, d // h), axis=1)
    kv = jnp.einsum("bnhd,bnhl->bhdl", kh, v.reshape(b, -1, h, d // h))
    y = jnp.einsum("bnhd,bhdl->bnhl", qh, kv)
    return y.reshape(b, t_q, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused(q, k, v, num_heads):
    interpret = jax.default_backend() != "tpu"
    return _pallas_forward(q, k, v, num_heads, interpret=interpret)


def _fused_fwd(q, k, v, num_heads):
    return _fused(q, k, v, num_heads), (q, k, v)


def _fused_bwd(num_heads, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b_, c: _xla_forward(a, b_, c, num_heads), q, k, v)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_linear_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    key_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Drop-in fused equivalent of ``qk_softmax`` + ``linear_attention``.

    q, k, v: (B, T, D) pre-softmax projections; ``key_mask`` (B, T, 1) is
    applied as the reference's additive ``-1e6`` on keys and multiplicatively
    on values (`transformer.py:104-107`).  Returns (B, Tq, D).
    """
    if key_mask is not None:
        k = k + (1.0 - key_mask) * -1000000.0
        v = v * key_mask
    return _fused(q, k, v, num_heads)
