"""Linear (kernelized) temporal attention — the long-sequence workhorse.

The reference handles T=1800-frame sequences not with context parallelism but
*algorithmically*, via efficient-attention (Shen et al.): softmax over the
feature dim for Q, softmax over time for K, contract K^T V (d x d) before Q —
O(T·d²·H) instead of O(T²·d) (`Diffusion_Stage/models/transformer.py:107-119`
self, `:150-156` cross).  On TPU this is two MXU-friendly einsums.

This module is the single source of that math for both the XLA path and the
fused Pallas kernel (`conductor_tpu/ops/pallas_attention.py`); numerics match
the reference exactly, including the additive ``-1e6`` key mask interacting
with the time-softmax (`transformer.py:107`) — see SURVEY.md §7.4 on why that
must be replicated for FGD parity.

Sequence-parallel note: the K^T V contraction is a sum over time, so sharding
T across a mesh axis needs only a single `psum` of the (H, D, D) partial —
done automatically by XLA when q/k/v are T-sharded under pjit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def qk_softmax(
    q: jnp.ndarray, k: jnp.ndarray, num_heads: int, key_mask: jnp.ndarray | None
):
    """Apply the reference's pre-attention softmaxes.

    q, k: (B, T, D) projections.  Returns (B, T, H, Dh) with q softmaxed over
    the head-feature dim and k softmaxed over time; ``key_mask`` (B, T, 1) is
    added as ``(1 - mask) * -1e6`` *before* the reshape, exactly as
    `transformer.py:107`.
    """
    B, T, D = q.shape
    H = num_heads
    if key_mask is not None:
        k = k + (1.0 - key_mask) * -1000000.0
    q = jax.nn.softmax(q.reshape(B, T, H, D // H), axis=-1)
    k = jax.nn.softmax(k.reshape(B, -1, H, D // H), axis=1)
    return q, k


def linear_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Core contraction: y = q @ (k^T v).

    q: (B, Tq, H, D) feature-softmaxed queries
    k: (B, Tk, H, D) time-softmaxed keys
    v: (B, Tk, H, D) values
    Returns (B, Tq, H*D).  Matches `transformer.py:117-119`.
    """
    B, Tq, H, D = q.shape
    kv = jnp.einsum("bnhd,bnhl->bhdl", k, v)  # (B, H, D, D) — one pass over time
    y = jnp.einsum("bnhd,bhdl->bnhl", q, kv)
    return y.reshape(B, Tq, H * D)


def temporal_linear_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    key_mask: jnp.ndarray | None,
    impl: str = "xla",
) -> jnp.ndarray:
    """Single entry point for linear attention used by the denoiser layers.

    q, k, v: (B, T, D) pre-softmax projections.  ``impl``:

    - ``"xla"``    — the einsum formulation below (always available);
    - ``"pallas"`` — the fused TPU kernel in `ops.pallas_attention`
      (interpret-mode on CPU, so tests/dryrun stay runnable everywhere).

    Both apply the reference's additive ``-1e6`` key mask and multiplicative
    value mask (`transformer.py:104-107`).
    """
    if impl == "pallas":
        from .pallas_attention import fused_linear_attention

        return fused_linear_attention(q, k, v, num_heads, key_mask)
    if key_mask is not None:
        v = v * key_mask
    b, _, d = q.shape
    qs, ks = qk_softmax(q, k, num_heads, key_mask)
    return linear_attention(qs, ks, v.reshape(b, -1, num_heads, d // num_heads))


def quadratic_self_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    src_mask: jnp.ndarray | None,
) -> jnp.ndarray:
    """O(T²) softmax attention, the reference's `--no_eff` fallback
    (`transformer.py:198-229`): scores scaled by sqrt(D/H), additive
    ``(1 - mask) * -1e5``, softmax over keys.

    Deliberate fix: the reference adds the mask on the QUERY axis
    (`transformer.py:224` — ``src_mask.unsqueeze(-1)`` broadcasts over keys),
    which is constant per softmax row and therefore a no-op; here the mask
    lands on KEY positions, actually excluding padded frames.  With a full
    mask (the sampler's case) the two coincide exactly."""
    B, T, D = q.shape
    H = num_heads
    qh = q.reshape(B, T, H, D // H)
    kh = k.reshape(B, -1, H, D // H)
    vh = v.reshape(B, -1, H, D // H)
    scores = jnp.einsum("bnhd,bmhd->bnmh", qh, kh) / jnp.sqrt(D / H)
    if src_mask is not None:
        scores = scores + (1.0 - src_mask[:, None, :, :]) * -100000.0
    weights = jax.nn.softmax(scores, axis=2)
    y = jnp.einsum("bnmh,bmhd->bnhd", weights, vh)
    return y.reshape(B, T, D)
