"""Fused Pallas max-pool for the music-encoder's three pool stages.

The reference pools with 5x5/3x3 windows and freq stride 2 after each conv
stage (`Contrastive_Stage/models/MusicEncoder.py:30-53`); XLA lowers these
`reduce_window`s without exploiting separability or the lane layout, and at
the encoder's full-resolution shapes they cost ~24 ms of the 49 ms fused
forward (batch 32, 60 s) — ~13x off the HBM speed-of-light for what is a
pure streaming max.

The kernel reuses the freq-blocked lane layout of `pallas_conv.py`: blocks
are (rows, FB, G*C) with G = 128 // C so the lane dimension is exactly full.

- time pooling is sublane slicing: stride 1 takes `wt` shifted row-slices
  and folds them with `maximum`; stride 3 (stage 2's 90->30 Hz pool) pads
  the row count to a multiple of 3 and reshapes the *leading* dim to
  (P+2, 3, ...) so each of the five window taps is a contiguous row slice.
  The T halo is pre-stacked by the caller as overlapping windows padded
  with -inf at the clip edges (`nn.max_pool` pads with -inf).
- freq pooling + stride-2 compression slices every tap straight out of the
  natively-tiled (..., 128) operand at C-lane granularity; only the two
  block-boundary columns come from FB-axis rolls, -inf masked at the
  spectrum edges.  Output columns per block halve to (G/2)*C lanes; the
  consumer's next-stage stacking reshape relayouts anyway.

`_time_pool` / `_freq_pool_compress` are shared with the conv kernel's
pool epilogue (`pallas_conv.py` fuses this pool into the last conv block
of each encoder stage).  Parity vs `flax.linen.max_pool` is pinned in
`tests/test_pallas_pool.py`; kernels run interpret-mode off-TPU (same code
path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _time_pool(xb: jnp.ndarray, p: int, wt: int, st: int) -> jnp.ndarray:
    """(rows, FB, N) -> (P, FB, N) max over the time window.

    Stride 1 expects rows >= p + wt - 1; stride 3 expects rows = 3*(p+2)
    (caller pads the tail with -inf)."""
    if st == 1:
        t = xb[0:p]
        for dt in range(1, wt):
            t = jnp.maximum(t, xb[dt : dt + p])
        return t
    z3 = xb.reshape(p + 2, 3, *xb.shape[1:])
    t = None
    for dt in range(wt):
        a, s = divmod(dt, 3)
        tap = z3[a : a + p, s]
        t = tap if t is None else jnp.maximum(t, tap)
    return t


def _freq_pool_compress(
    t: jnp.ndarray, g: int, c: int, wf: int, pf: int, neg: float
) -> jnp.ndarray:
    """(P, FB, G*C) -> (P, FB, (G/2)*C) max over the freq window with
    stride 2; -inf outside the spectrum."""
    p, fb, _ = t.shape
    blk = jax.lax.broadcasted_iota(jnp.int32, (p, fb, pf * c), 1)
    prev_cols = jnp.roll(t, 1, axis=1)[..., (g - pf) * c :]
    prev_cols = jnp.where(blk == 0, neg, prev_cols)
    next_cols = jnp.roll(t, -1, axis=1)[..., : pf * c]
    next_cols = jnp.where(blk == fb - 1, neg, next_cols)
    outs = []
    for k in range(g // 2):
        taps = []
        for df in range(wf):
            q = 2 * k - pf + df
            if q < 0:
                taps.append(prev_cols[..., (q + pf) * c : (q + pf + 1) * c])
            elif q >= g:
                taps.append(next_cols[..., (q - g) * c : (q - g + 1) * c])
            else:
                taps.append(t[..., q * c : (q + 1) * c])
        outs.append(functools.reduce(jnp.maximum, taps))
    return jnp.concatenate(outs, axis=-1)


def _pool_kernel(
    x_ref, halo_ref, o_ref, *, p: int, fb: int, g: int, c: int,
    wt: int, st: int, wf: int, pf: int, neg: float, front: int,
):
    xb = _assemble_rows(x_ref, halo_ref, front)
    t = _time_pool(xb, p, wt, st)
    o_ref[0] = _freq_pool_compress(t, g, c, wf, pf, neg)


def _assemble_rows(x_ref, halo_ref, front: int):
    """main (p*st rows) + halo (front rows above, rest below) -> the
    rows_blk window, concatenated in-register (see `_pool_split`)."""
    h = halo_ref[0, 0]
    return jnp.concatenate([h[:front], x_ref[0, 0], h[front:]], axis=0)


def pool_geometry(t: int, window, strides, padding, tile: int):
    """Shared with the conv epilogue: output length, tile P, block row count
    (stride-3 blocks are padded to 3*(P+2) rows for the reshape trick)."""
    wt, _ = window
    st, _ = strides
    (pt0, pt1), _ = padding
    t_out = (t + pt0 + pt1 - wt) // st + 1
    p = tile
    while t_out % p:
        p //= 2
    rows_in = p * st + wt - st
    rows_blk = rows_in if st == 1 else 3 * (p + 2)
    return t_out, p, rows_blk


def _pool_stack(x2, nt, p, st, rows_blk, pt0, neg):
    """(B, T, FB, G*C) -> (B, nt, rows_blk, FB, G*C) overlapping input tiles,
    -inf padded at the clip edges (shared by forward and backward — the
    backward differentiates this exact function to fold tile overlaps)."""
    b, t = x2.shape[:2]
    front = pt0
    back = (nt - 1) * p * st + rows_blk - (t + front)
    xp = jnp.pad(
        x2, ((0, 0), (front, max(back, 0)), (0, 0), (0, 0)),
        constant_values=neg,
    )
    return jnp.stack(
        [xp[:, j * p * st : j * p * st + rows_blk] for j in range(nt)], axis=1
    )


def _pool_split(x2, nt, p, st, rows_blk, pt0, neg):
    """(B, T, FB, L) -> (main (B, nt, p*st, FB, L) — a pure dimension-split
    reshape, no copy — and halo (B, nt, pt0+back, FB, L)).

    Replaces the materialized overlapping stack (`_pool_stack`): for the
    encoder's pool family nt*p*st == T exactly (wt = 2*pt0 + st for the
    stride-1 pools; T % 3 == 0 for the stride-3 stage), so the main tile is
    the activation itself and only pt0 front + back boundary rows per tile
    move.  halo rows [0:pt0] are global rows j*p*st - pt0 .. (previous
    tile's tail; -inf at the clip top), rows [pt0:] are rows (j+1)*p*st ..
    (next tile's head; -inf past the clip end)."""
    b, t = x2.shape[:2]
    pst = p * st
    assert nt * pst == t, (nt, p, st, t)
    back = rows_blk - pt0 - pst
    assert back >= 0, (rows_blk, pt0, pst)
    main = x2.reshape(b, nt, pst, *x2.shape[2:])
    neg_row = jnp.full_like(x2[:, :1], neg)
    front_h = jnp.concatenate(
        [jnp.broadcast_to(neg_row, (b, pt0, *x2.shape[2:]))[:, None],
         main[:, :-1, pst - pt0 :]], axis=1,
    )                                                   # (B, nt, pt0, FB, L)
    back_h = jnp.concatenate(
        [main[:, 1:, :back],
         jnp.broadcast_to(neg_row, (b, back, *x2.shape[2:]))[:, None]], axis=1,
    )                                                   # (B, nt, back, FB, L)
    return main, jnp.concatenate([front_h, back_h], axis=2)


def fused_max_pool(
    x: jnp.ndarray,          # (B, T, F, C)
    window: tuple[int, int],
    strides: tuple[int, int],
    padding: tuple[tuple[int, int], tuple[int, int]],
    *,
    tile: int = 150,
) -> jnp.ndarray:
    """`nn.max_pool(x, window, strides, padding)` for the encoder's pool
    family: freq stride 2 with symmetric padding, time stride in {1, 3},
    C in {16, 32} (lane blocking G = 128 // C must divide F)."""
    b, t, f, c = x.shape
    wt, wf = window
    st, sf = strides
    (pt0, pt1), (pf0, pf1) = padding
    assert sf == 2 and pf0 == pf1 and wf == 2 * pf0 + 1, (window, strides, padding)
    assert st in (1, 3) and pt0 == pt1 and wt >= st, (window, strides, padding)
    g = 128 // c
    assert f % g == 0 and g % 2 == 0, (f, g)
    fb = f // g
    t_out, p, rows_blk = pool_geometry(t, window, strides, padding, tile)
    nt = t_out // p

    neg = float(jnp.finfo(x.dtype).min)
    x2 = x.reshape(b, t, fb, g * c)
    main, halo = _pool_split(x2, nt, p, st, rows_blk, pt0, neg)
    hr = rows_blk - p * st

    out = pl.pallas_call(
        functools.partial(
            _pool_kernel, p=p, fb=fb, g=g, c=c,
            wt=wt, st=st, wf=wf, pf=pf0, neg=neg, front=pt0,
        ),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, 1, p * st, fb, g * c),
                         lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hr, fb, g * c),
                         lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, p, fb, (g // 2) * c), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, t_out, fb, (g // 2) * c), x.dtype),
        # f32 inputs (the GAN's reference-exact trainable encoder) double the
        # per-block temps vs the bf16 path and sit just over the 16M scoped
        # default at the stride-3 stage's 456-row tiles (measured: 16.11M)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(main, halo)
    return out.reshape(b, t_out, f // 2, c)


# --------------------------------------------------------------------------
# Trainable pool: custom VJP with an in-register first-max backward.
#
# XLA's maxpool gradient (`select_and_scatter`) was 31 % of the M2SNet step
# at the encoder's lane-padded NHWC shapes (NOTES.md "M2SNet encoder
# profile"; a mask-based XLA rewrite measured 2.2x SLOWER and was deleted).
# This kernel recomputes the window maxima from the same packed input tiles
# as the forward and routes each output cotangent to the FIRST window
# position attaining the max (window-scan order: freq taps ascending, then
# time taps ascending) — one winner per window, so the gradient is
# conservative (sum dx == sum dy) even on post-ReLU plateaus where
# compare-add schemes would multiply-count ties.  Tie ORDER differs from
# XLA's packed select-and-gather tiebreak; parity vs `nn.max_pool` gradients
# is pinned on untied inputs (`tests/test_conv_train.py`).


def _add_cols(buf, lo, v):
    """buf[..., lo:lo+w] += v as slice+concat (functional .at[].add lowers to
    scatter-add, which Mosaic does not implement inside kernels)."""
    hi = lo + v.shape[-1]
    parts = []
    if lo:
        parts.append(buf[..., :lo])
    parts.append(buf[..., lo:hi] + v)
    if hi < buf.shape[-1]:
        parts.append(buf[..., hi:])
    return jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]


def _add_rows(buf, lo, v):
    """buf[lo:lo+r] += v as slice+concat (axis 0), same Mosaic constraint."""
    hi = lo + v.shape[0]
    parts = []
    if lo:
        parts.append(buf[:lo])
    parts.append(buf[lo:hi] + v)
    if hi < buf.shape[0]:
        parts.append(buf[hi:])
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def _pool_bwd_kernel(
    x_ref, halo_ref, dy_ref, om_ref, oh_ref, *, p, fb, g, c, wt, st, wf, pf,
    neg, front,
):
    # recompute in f32: bf16 -> f32 casts are exact, so the winner detection
    # matches the bf16 forward bit-for-bit — and v5e's vector compare does
    # not support bf16 equality ("Target does not support this comparison")
    xb = _assemble_rows(x_ref, halo_ref, front).astype(jnp.float32)
    tpool = _time_pool(xb, p, wt, st)       # (P, FB, G*C)
    blk = jax.lax.broadcasted_iota(jnp.int32, (p, fb, pf * c), 1)
    prev_cols = jnp.where(
        blk == 0, neg, jnp.roll(tpool, 1, axis=1)[..., (g - pf) * c :]
    )
    next_cols = jnp.where(
        blk == fb - 1, neg, jnp.roll(tpool, -1, axis=1)[..., : pf * c]
    )

    # ---- freq routing: d wrt the time-pooled values.  Per-tap winner masks
    # are collected into a (kind, q) -> contribution map and the G input
    # columns are assembled with ONE concat — per-tap read-modify-write of
    # the full accumulator (the first version) rebuilt a full-width buffer
    # 20x per block at C-lane granularity.
    contrib: dict = {}
    for k in range(g // 2):
        taps = []
        for df in range(wf):
            q = 2 * k - pf + df
            if q < 0:
                taps.append(
                    ("prev", q + pf,
                     prev_cols[..., (q + pf) * c : (q + pf + 1) * c])
                )
            elif q >= g:
                taps.append(
                    ("next", q - g,
                     next_cols[..., (q - g) * c : (q - g + 1) * c])
                )
            else:
                taps.append(("main", q, tpool[..., q * c : (q + 1) * c]))
        yk = functools.reduce(jnp.maximum, [v for _, _, v in taps])
        dyk = dy_ref[0, :, :, k * c : (k + 1) * c].astype(jnp.float32)
        seen = jnp.zeros(yk.shape, jnp.bool_)
        for kind, q, v in taps:
            m = (v == yk) & ~seen
            seen = seen | (v == yk)
            piece = jnp.where(m, dyk, 0.0)
            key = (kind, q)
            contrib[key] = contrib[key] + piece if key in contrib else piece
    # cross-block fold: block i's prev-taps live in block i-1's last pf cols,
    # its next-taps in block i+1's first pf cols.  Wrap contributions are
    # exactly zero (those taps were -inf masked and can never win).
    cols = []
    for q in range(g):
        col = contrib.get(("main", q))
        if col is None:
            col = jnp.zeros((p, fb, c), jnp.float32)
        if q >= g - pf and ("prev", q - (g - pf)) in contrib:
            col = col + jnp.roll(contrib[("prev", q - (g - pf))], -1, axis=1)
        if q < pf and ("next", q) in contrib:
            col = col + jnp.roll(contrib[("next", q)], 1, axis=1)
        cols.append(col)
    dt = jnp.concatenate(cols, axis=-1)

    # ---- time routing: d wrt the input rows
    rows_blk = xb.shape[0]
    if st == 1:
        dx = jnp.zeros((rows_blk, fb, g * c), jnp.float32)
        seen = jnp.zeros((p, fb, g * c), jnp.bool_)
        for k in range(wt):
            tap = xb[k : k + p]
            m = (tap == tpool) & ~seen
            seen = seen | (tap == tpool)
            dx = _add_rows(dx, k, jnp.where(m, dt, 0.0))
    else:
        z3 = xb.reshape(p + 2, 3, fb, g * c)
        planes = [jnp.zeros((p + 2, fb, g * c), jnp.float32) for _ in range(3)]
        seen = jnp.zeros((p, fb, g * c), jnp.bool_)
        for k in range(wt):
            a, s = divmod(k, 3)
            tap = z3[a : a + p, s]
            m = (tap == tpool) & ~seen
            seen = seen | (tap == tpool)
            planes[s] = _add_rows(planes[s], a, jnp.where(m, dt, 0.0))
        dx = jnp.stack(planes, axis=1).reshape(rows_blk, fb, g * c)
    pst = p * st
    om_ref[0, 0] = dx[front : front + pst].astype(om_ref.dtype)
    oh_ref[0, 0] = jnp.concatenate(
        [dx[:front], dx[front + pst :]], axis=0
    ).astype(oh_ref.dtype)


@functools.lru_cache(maxsize=None)
def _make_pool_op(f, c, window, strides, padding, tile):
    wt, wf = window
    st, _ = strides
    (pt0, _), (pf0, _) = padding
    g = 128 // c
    fb = f // g

    @jax.custom_vjp
    def op(x_flat):
        b, t, _ = x_flat.shape
        return fused_max_pool(
            x_flat.reshape(b, t, f, c), window, strides, padding, tile=tile
        ).reshape(b, -1, (f // 2) * c)

    def fwd(x_flat):
        return op(x_flat), x_flat

    def bwd(x_flat, dy_flat):
        b, t, _ = x_flat.shape
        # the backward picks its own, smaller tiling (the f32 recompute +
        # routing temps are ~4x the forward's working set; 456-row stride-3
        # tiles blow the 16M scoped-vmem default)
        t_out, p, rows_blk = pool_geometry(
            t, window, strides, padding, min(tile, 75 if st == 1 else 50)
        )
        nt = t_out // p
        neg = float(jnp.finfo(x_flat.dtype).min)
        pst = p * st
        back = rows_blk - pt0 - pst

        main, halo = _pool_split(
            x_flat.reshape(b, t, fb, g * c), nt, p, st, rows_blk, pt0, neg
        )
        dy4 = dy_flat.reshape(b, t_out, fb, (g // 2) * c)
        dm, dh = pl.pallas_call(
            functools.partial(
                _pool_bwd_kernel, p=p, fb=fb, g=g, c=c,
                wt=wt, st=st, wf=wf, pf=pf0, neg=neg, front=pt0,
            ),
            grid=(b, nt),
            in_specs=[
                pl.BlockSpec((1, 1, pst, fb, g * c),
                             lambda i, j: (i, j, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, pt0 + back, fb, g * c),
                             lambda i, j: (i, j, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p, fb, (g // 2) * c),
                             lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, 1, pst, fb, g * c), lambda i, j: (i, j, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, pt0 + back, fb, g * c),
                    lambda i, j: (i, j, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, nt, pst, fb, g * c), dy_flat.dtype),
                jax.ShapeDtypeStruct(
                    (b, nt, pt0 + back, fb, g * c), dy_flat.dtype
                ),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
            interpret=jax.default_backend() != "tpu",
        )(main, halo, dy4)
        # fold the halo cotangents back onto their owning rows: tile j's
        # front rows live in tile j-1's tail, its back rows in tile j+1's
        # head (clip-edge halo rows were -inf pad — their grads are exactly
        # zero and are dropped).  Two shifted pads, no scatter.
        dm = (
            dm
            + jnp.pad(dh[:, 1:, :pt0],
                      ((0, 0), (0, 1), (pst - pt0, 0), (0, 0), (0, 0)))
            + jnp.pad(dh[:, :-1, pt0:],
                      ((0, 0), (1, 0), (0, pst - back), (0, 0), (0, 0)))
        )
        return (dm.reshape(b, t, f * c).astype(x_flat.dtype),)

    op.defvjp(fwd, bwd)
    return op


def max_pool_train(
    x_flat: jnp.ndarray, f: int, c: int, window, strides, padding,
    *, tile: int = 150,
) -> jnp.ndarray:
    """Trainable `fused_max_pool` on flat packed (B, T, F*C) activations:
    Pallas forward + first-max Pallas backward (see `_pool_bwd_kernel`)."""
    return _make_pool_op(
        f, c, tuple(window), tuple(strides),
        tuple(tuple(q) for q in padding), tile,
    )(x_flat)
