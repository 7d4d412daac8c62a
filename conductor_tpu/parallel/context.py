"""Context (sequence) parallelism for the linear-attention denoiser.

The reference handles T=1800 frames algorithmically (linear attention) and
has no context parallelism (SURVEY.md §2.3).  On TPU the natural CP analogue
falls out of the math: the only cross-frame interactions in the denoiser are
the key time-softmax (a global max + sum over T) and the K^T V contraction
(a sum over T) — so a T-sharded layout needs exactly one `pmax` and two
`psum`s per attention, all riding ICI.

Two ways to use it:

1. **GSPMD (zero-code)**: shard the batch over a ('data', 'seq') mesh with
   `shard_batch(batch, mesh, seq_dims=...)` and jit the normal train step —
   XLA derives the same collectives from the sharding annotations.  This is
   the production path (`__graft_entry__.dryrun_multichip` validates it).
2. **Explicit shard_map**: `cp_linear_attention` below, for composing with
   hand-written kernels (e.g. running the fused Pallas kernel per shard with
   the collectives outside it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def cp_linear_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    key_mask: jnp.ndarray | None = None,
    axis_name: str = "seq",
) -> jnp.ndarray:
    """Linear attention over a T-sharded sequence, called under `shard_map`.

    q, k, v: (B, T_local, D) — the local shard of the time axis.  Numerics
    match `ops.temporal_linear_attention` on the gathered sequence exactly:
    the key softmax is normalized over the GLOBAL time axis via pmax/psum,
    and the KV contraction is psum-reduced.  Output is the local (B, T_local,
    D) shard of y — q rows never leave their shard.
    """
    if key_mask is not None:
        k = k + (1.0 - key_mask) * -1000000.0
        v = v * key_mask
    b, t_local, d = q.shape
    h = num_heads
    dh = d // h

    kh = k.reshape(b, t_local, h, dh)
    vh = v.reshape(b, t_local, h, dh)

    # global time-softmax over k: max and sum cross shards
    kmax = lax.pmax(jnp.max(kh, axis=1, keepdims=True), axis_name)
    ke = jnp.exp(kh - kmax)
    ksum = lax.psum(jnp.sum(ke, axis=1, keepdims=True), axis_name)
    k_sm = ke / ksum

    # KV contraction: local partial + one psum of the tiny (B, H, Dh, Dh)
    kv = lax.psum(jnp.einsum("bnhd,bnhl->bhdl", k_sm, vh), axis_name)

    qh = jax.nn.softmax(q.reshape(b, t_local, h, dh), axis=-1)
    return jnp.einsum("bnhd,bhdl->bnhl", qh, kv).reshape(b, t_local, d)
