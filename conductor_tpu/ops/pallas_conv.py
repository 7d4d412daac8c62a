"""Fused Conv3x3(reflect) + BN(affine) + ReLU + residual kernel for the
music-encoder CNN (inference / frozen paths).

The encoder's conv stages run at full (T90, 128-mel) resolution with 1-32
channels (`Contrastive_Stage/models/MusicEncoder.py:5-53`): with C=16 output
channels an XLA conv uses 16/128 MXU lanes, and each of pad/conv/BN/relu/
residual round-trips ~700 MB activations through HBM — ~19 ms per 3x3 conv
at batch 32.  This kernel restructures the conv as FULL-WIDTH matmuls and
fuses the whole block:

- frequency is split into blocks of G with G*Cin = 128 lanes; a conv output
  block needs its G+2 input-column halo, so the kernel assembles
  z (T, F/G, (G+2)*Cin) in VMEM (reflect at the F edges) and contracts with
  Wbig (3, (G+2)*Cin, G*Cout) — W shifted-copied into the halo layout — one
  matmul per time-shift dt.  K=(G+2)Cin and N=G*Cout are both lane-filling;
  the 3.3x flop inflation buys ~8x lane utilization.
- the T halo (1 row each side, reflect at clip edges) is pre-stacked by the
  caller into overlapping (tile+2)-row windows — +2/tile memory for one
  cheap XLA copy; blocks are then 5-D so Mosaic's last-two-dim tiling
  constraints land on the aligned (F/G, G*C) axes and no in-kernel DMA or
  row-alignment logic is needed.
- BN running statistics and the conv bias fold into one affine (scale, bias)
  per output channel applied in the epilogue, followed by ReLU and the
  residual add (identity, or the reference's 1x1-conv+BN branch as a
  block-diagonal matmul).
- activations flow at bfloat16 end-to-end in `FusedMusicEncoder` (the
  full-resolution stages are HBM-bound): 114 ms -> 49 ms for a 32x60s batch,
  <2 % relative feature drift vs the flax module.

Training keeps the composable flax path (BatchNorm batch statistics need the
cross-batch reduction and backward); every frozen/inference use of the
encoder — stage-2 conditioning, feature-cache precompute, evaluation,
generation — can run this kernel.  Parity vs the flax module is pinned in
`tests/test_pallas_conv.py`.
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


def build_wbig(kernel: jnp.ndarray, g: int) -> jnp.ndarray:
    """Conv kernel (3, 3, Cin, Cout) -> Wbig (3, (G+2)*Cin, G*Cout) with
    Wbig[dt, (gg+dg)*Cin+ci, gg*Cout+co] = kernel[dt, dg, ci, co]."""
    kt, kf, cin, cout = kernel.shape
    assert kt == 3 and kf == 3
    w = jnp.zeros((3, (g + 2) * cin, g * cout), kernel.dtype)
    for gg in range(g):
        for dg in range(3):
            w = w.at[
                :, (gg + dg) * cin : (gg + dg + 1) * cin,
                gg * cout : (gg + 1) * cout,
            ].set(kernel[:, dg])
    return w


def fold_bn(conv_bias, bn_mean, bn_var, bn_scale, bn_bias, eps=1e-5):
    """(conv + bias) -> BN(running stats) as one affine: y*s + b."""
    s = bn_scale / jnp.sqrt(bn_var + eps)
    b = (conv_bias - bn_mean) * s + bn_bias
    return s, b


def _tile(vec: jnp.ndarray, g: int) -> jnp.ndarray:
    """(C,) per-channel vector -> (G*C,) lane vector."""
    return jnp.tile(vec, (g,))


def _halo_assemble(xb, *, fb, g, cin, edge, mxu_dtype):
    """(rows, FB, G*Cin) packed tile -> (rows, FB, (G+2)*Cin) with the conv's
    +-1 frequency halo columns; F-edge fill is ``edge`` ("reflect" for the
    encoder's reflect-pad convs, "zero" for the transposed-conv backward)."""
    tp = xb.shape[0]
    if fb == 1:
        if edge == "reflect":
            left = xb[:, :, cin : 2 * cin]
            right = xb[:, :, (g - 2) * cin : (g - 1) * cin]
        else:
            left = jnp.zeros_like(xb[:, :, :cin])
            right = jnp.zeros_like(xb[:, :, :cin])
    else:
        # edge blocks get the reflected/zero column (no scatter: masked select)
        blk = jax.lax.broadcasted_iota(jnp.int32, (tp, fb, cin), 1)
        left = jnp.roll(xb, 1, axis=1)[..., (g - 1) * cin :]
        left_edge = (
            xb[:, 0:1, cin : 2 * cin] if edge == "reflect"  # f=-1 -> f=1
            else jnp.zeros_like(left[:, 0:1])
        )
        left = jnp.where(blk == 0, left_edge, left)
        right = jnp.roll(xb, -1, axis=1)[..., :cin]
        right_edge = (
            xb[:, fb - 1 : fb, (g - 2) * cin : (g - 1) * cin]  # f=F -> f=F-2
            if edge == "reflect" else jnp.zeros_like(right[:, 0:1])
        )
        right = jnp.where(blk == fb - 1, right_edge, right)
    return jnp.concatenate([left, xb, right], axis=-1).astype(mxu_dtype)


def stack_time_tiles(x2, tile, nt, *, edge):
    """(B, T, L) -> (B, nt, tile+2, ...) overlapping tiles with the conv's
    +-1 time halo; clip-edge rows are reflected or zero."""
    b, t, _ = x2.shape
    if edge == "reflect":
        xp = jnp.concatenate([x2[:, 1:2], x2, x2[:, t - 2 : t - 1]], axis=1)
    else:
        zrow = jnp.zeros_like(x2[:, :1])
        xp = jnp.concatenate([zrow, x2, zrow], axis=1)
    return jnp.stack(
        [xp[:, j * tile : j * tile + tile + 2] for j in range(nt)], axis=1
    )


def _conv_kernel(
    xt_ref, wbig_ref, scale_ref, bias_ref, resw_ref, rs_ref, rb_ref,
    o_ref, *, tile: int, fb: int, g: int, cin: int, cout: int,
    res_mode: int, mxu_dtype, pool=None, t_valid: int = 0,
    relu: bool = True, edge: str = "reflect", fb_squeezed: bool = False,
):
    # --- T halo: every caller pre-stacks overlapping (tile+2)-row windows
    # (`stack_time_tiles`, or the pool path's wider windows) — one DMA per
    # block.  A zero-copy main + 2-row halo split was measured SLOWER here
    # (round-4 NOTES: 36.5 -> 39.3 ms M2SNet step) and deleted; the split
    # idea survives only where the stacked alternative is an overlapping
    # scatter-add (the pool backward keeps its own copy, `pallas_pool.py`
    # `_pool_split`).
    if fb_squeezed:
        # FB == 1 carried as a real array axis gives the operands a (1, 128)
        # trailing tile -> T(2,128) layout with half the sublanes padding
        # (and a squeeze-as-reduce on the output); the caller drops the axis
        # and the kernel re-expands it in-register for free.
        xb = xt_ref[0, 0].reshape(tile + 2, 1, g * cin)
    else:
        xb = xt_ref[0, 0]  # (tile+2, fb, g*cin)
    z = _halo_assemble(xb, fb=fb, g=g, cin=cin, edge=edge, mxu_dtype=mxu_dtype)

    # --- the three time-shift matmuls
    k = (g + 2) * cin
    n = g * cout
    acc = jnp.zeros((tile * fb, n), F32)
    for dt in range(3):
        zz = z[dt : dt + tile].reshape(tile * fb, k)
        acc = acc + jnp.dot(
            zz, wbig_ref[dt].astype(mxu_dtype), preferred_element_type=F32
        )

    # --- folded BN affine + ReLU
    y = acc * scale_ref[0].astype(F32) + bias_ref[0].astype(F32)
    if relu:
        y = jnp.maximum(y, 0.0)

    # --- residual
    if res_mode == 1:  # identity (Cin == Cout)
        y = y + xb[1 : tile + 1].reshape(tile * fb, n).astype(F32)
    elif res_mode == 2:  # 1x1 conv + BN branch, block-diagonal over freq
        r = jnp.dot(
            xb[1 : tile + 1].reshape(tile * fb, g * cin).astype(mxu_dtype),
            resw_ref[:].astype(mxu_dtype),
            preferred_element_type=F32,
        )
        y = y + r * rs_ref[0].astype(F32) + rb_ref[0].astype(F32)

    if pool is None:
        if fb_squeezed:
            o_ref[0] = y.reshape(tile, n).astype(o_ref.dtype)
        else:
            o_ref[0] = y.reshape(tile, fb, n).astype(o_ref.dtype)
        return

    # --- fused max-pool epilogue (the encoder pools right after the last
    # conv of each stage): mask conv rows outside the clip to -inf, pool
    # time (sublane slices) then freq+stride-2 (lane slices) in-register —
    # the separate reduce_window pass and its HBM round trip disappear.
    from .pallas_pool import _freq_pool_compress, _time_pool

    p_out, wt, st, pt, wf, pf = pool
    neg = float(jnp.finfo(F32).min)
    j = pl.program_id(1)
    row0 = j * p_out * st - pt
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile, 1, 1), 0) + row0
    y3 = jnp.where(
        (rows >= 0) & (rows < t_valid), y.reshape(tile, fb, n), neg
    )
    t = _time_pool(y3, p_out, wt, st)
    o_ref[0] = _freq_pool_compress(t, g, cout, wf, pf, neg).astype(o_ref.dtype)


def fused_conv_block(
    x: jnp.ndarray,            # (B, T, F, Cin)
    kernel: jnp.ndarray,       # (3, 3, Cin, Cout)
    scale: jnp.ndarray,        # (Cout,) folded BN scale (see fold_bn)
    bias: jnp.ndarray,         # (Cout,) folded BN bias
    *,
    res_mode: int = 0,         # 0: none, 1: identity, 2: 1x1 conv + BN branch
    res_kernel: jnp.ndarray | None = None,  # (Cin, Cout) for res_mode 2
    res_scale: jnp.ndarray | None = None,
    res_bias: jnp.ndarray | None = None,
    tile: int = 150,
    mxu_dtype=jnp.bfloat16,
    pool: tuple | None = None,  # (window, strides, padding) max-pool epilogue
    pool_tile: int | None = None,
    relu: bool = True,          # False: plain affine epilogue (bwd/transposed use)
    edge: str = "reflect",      # conv pad semantics: "reflect" | "zero"
) -> jnp.ndarray:
    """One Conv2dResBlock (`MusicEncoder.py:5-27`) as a single fused kernel.
    Requires G = 128 // Cin freq-blocking to divide F, and tile | T.

    With ``pool``, the encoder's follow-on max-pool (time window/stride/pad
    per `MusicEncoder.py:30-53`, freq stride 2) runs as an in-register
    epilogue and the kernel emits the pooled (B, T', F/2, Cout) directly."""
    b, t, f, cin = x.shape
    cout = kernel.shape[-1]
    g = max(128 // cin, 1)
    assert f % g == 0, (f, g)
    fbn = f // g
    while t % tile:
        tile //= 2  # always terminates: tile=1 divides
    wbig = build_wbig(kernel, g)

    scale_l = _tile(scale, g).reshape(1, -1)
    bias_l = _tile(bias, g).reshape(1, -1)
    if res_mode == 2:
        resw = jnp.einsum(
            "cd,vw->vcwd", res_kernel, jnp.eye(g, dtype=res_kernel.dtype)
        ).reshape(g * cin, g * cout)
        rs_l = _tile(res_scale, g).reshape(1, -1)
        rb_l = _tile(res_bias, g).reshape(1, -1)
    else:
        resw = jnp.zeros((g * cin, g * cout), x.dtype)
        rs_l = jnp.zeros((1, g * cout), F32)
        rb_l = jnp.zeros((1, g * cout), F32)

    # T halo: every path pre-stacks overlapping (tile+2)-row windows (the
    # pool path's windows overlap by more than +-1).  Blocks are 5-D so
    # the last-two-dim tiling constraints land on the aligned (FB, G*C)
    # axes.
    x2 = x.reshape(b, t, f * cin)
    n = g * cout
    pool_arg = None
    if pool is not None:
        from .pallas_pool import pool_geometry

        window, strides, padding = pool
        assert cin == cout, "pool epilogue expects Cin == Cout stages"
        wt, wf = window
        st = strides[0]
        pt, pf = padding[0][0], padding[1][0]
        t_out, p_out, rows_blk = pool_geometry(
            t, window, strides, padding, pool_tile or (150 if st == 1 else 75)
        )
        nt = t_out // p_out
        tile = rows_blk  # conv rows per block
        pool_arg = (p_out, wt, st, pt, wf, pf)
        # conv rows of block j start at global row j*p_out*st - pt; the ±1
        # conv halo makes the input window [j*p_out*st - pt - 1, +rows_blk+2)
        front = pt + 1
        back = (nt - 1) * p_out * st + rows_blk + 2 - (t + front)
        xp = jnp.pad(
            x2, ((0, 0), (front, max(back, 0)), (0, 0)), mode="reflect"
        )
        xtiles = jnp.stack(
            [xp[:, j * p_out * st : j * p_out * st + rows_blk + 2]
             for j in range(nt)], axis=1,
        ).reshape(b, nt, rows_blk + 2, fbn, g * cin)
        out_block = (1, p_out, fbn, (g // 2) * cout)
        out_shape = (b, t_out, fbn, (g // 2) * cout)
    elif fbn > 1:
        nt = t // tile
        xtiles = stack_time_tiles(x2, tile, nt, edge=edge).reshape(
            b, nt, tile + 2, fbn, g * cin
        )
        out_block = (1, tile, fbn, n)
        out_shape = (b, t, fbn, n)

    fb_squeezed = fbn == 1 and pool is None
    if fb_squeezed:
        # the 3D output block's second-minor dim is the time tile, which
        # Mosaic requires to be 8-divisible (or full): re-tile at 128 rows
        # over time padded to a 128 multiple; pad-row outputs are cropped.
        tile = 128
        t_pad = _round_up(t, tile)
        nt = t_pad // tile
        if edge == "reflect":
            xh = jnp.concatenate([x2[:, 1:2], x2, x2[:, t - 2 : t - 1]], axis=1)
        else:
            zrow = jnp.zeros_like(x2[:, :1])
            xh = jnp.concatenate([zrow, x2, zrow], axis=1)
        xh = jnp.pad(xh, ((0, 0), (0, t_pad - t), (0, 0)))
        xtiles = jnp.stack(
            [xh[:, j * tile : j * tile + tile + 2] for j in range(nt)], axis=1
        )
        out_block = (1, tile, n)
        out_shape = (b, t_pad, n)
        x_spec = pl.BlockSpec((1, 1, tile + 2, g * cin),
                              lambda i, j: (i, j, 0, 0),
                              memory_space=pltpu.VMEM)
        o_spec = pl.BlockSpec((1, tile, n), lambda i, j: (i, j, 0),
                              memory_space=pltpu.VMEM)
    else:
        x_spec = pl.BlockSpec((1, 1, xtiles.shape[2], fbn, g * cin),
                              lambda i, j: (i, j, 0, 0, 0),
                              memory_space=pltpu.VMEM)
        o_spec = pl.BlockSpec(out_block, lambda i, j: (i, j, 0, 0),
                              memory_space=pltpu.VMEM)

    kern_fn = functools.partial(
        _conv_kernel, tile=tile, fb=fbn, g=g, cin=cin,
        cout=cout, res_mode=res_mode, mxu_dtype=mxu_dtype,
        pool=pool_arg, t_valid=t, relu=relu, edge=edge,
        fb_squeezed=fb_squeezed,
    )
    operands = (xtiles, wbig, scale_l, bias_l, resw, rs_l, rb_l)
    in_specs = [x_spec]

    out = pl.pallas_call(
        kern_fn,
        grid=(b, nt),
        in_specs=in_specs + [
            pl.BlockSpec((3, (g + 2) * cin, n), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g * cin, n), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(*operands)
    if pool is not None:
        return out.reshape(b, out_shape[1], f // 2, cout)
    if fb_squeezed:
        out = out[:, :t]
    return out.reshape(b, t, f, cout)
