"""Trainable fused conv for the music-encoder stages: custom-VJP around the
packed Pallas conv kernel (`pallas_conv.py`).

Round-2 profiling (NOTES.md "M2SNet encoder profile") showed the M2SNet step
is dominated by the music encoder's full-resolution stages, where XLA's
C-minor NHWC layout lane-pads C=16/32 arrays 4-8x: maxpool backward and BN
batch-stat reductions alone were 50 % of the 170 ms step, and the convs
decompose into shifted-add fusions at the padded layout.  The fix is to keep
training activations in the lane-full packed layout (B, T, F*C) end-to-end:

- forward conv: the existing fused kernel (`fused_conv_block`, relu=False,
  identity affine) — frequency blocked into G = 128 // Cin columns so every
  matmul is lane-filling.
- backward d(input): the SAME kernel run as the transposed conv — the adjoint
  of a reflect-padded 3x3 conv is a zero-padded 3x3 conv of the cotangent
  with the flipped/transposed kernel, plus a rank-1 "fold" of the four
  extended border rows/columns back onto rows/cols 1 and T-2 / F-2 (the
  adjoint of reflect padding).  The folds touch two rows and two columns and
  run as tiny XLA einsums.
- backward d(kernel): dWbig[dt] = z[:, dt:dt+T]^T dy in the packed halo
  layout — three lane-full matmuls over the batch*time*freq-block axis —
  then folded from the (G+2)*Cin x G*Cout halo layout back to (3,3,Cin,Cout)
  with offset-eye contractions (the adjoint of `build_wbig`).

BatchNorm (batch statistics), ReLU and the residual adds intentionally stay
plain XLA in the flat packed layout (`models/music_encoder.py` packed path):
on (B, T, F*C) arrays every lane is live, so XLA's own fusions are already
at the HBM roofline there; only the ops that need halos (conv) or windows
(max-pool, `pallas_pool.max_pool_train`) need kernels.

Matmul precision follows the activation dtype (bf16 activations -> bf16 MXU,
f32 -> f32), so the f32 path is gradient-parity-testable against
`lax.conv_general_dilated` to float tolerance (`tests/test_conv_train.py`).
Reference semantics: `Contrastive_Stage/models/MusicEncoder.py:5-27`
(reflect-padded Conv2d(3,3) inside Conv2dResBlock).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_conv import _halo_assemble, fused_conv_block, stack_time_tiles

F32 = jnp.float32

# d(kernel) contraction backend: "pallas" (grid-accumulated in-VMEM kernel,
# the default) or "xla" (einsum over a materialized halo tensor — kept for
# parity tests and as the fallback should a future shape break the kernel).
# Switch with `set_dkernel_impl`; module-level because the choice is a
# backend detail, not model config.
_DKERNEL_IMPL = "pallas"


def set_dkernel_impl(impl: str) -> None:
    assert impl in ("pallas", "xla"), impl
    global _DKERNEL_IMPL
    _DKERNEL_IMPL = impl


def _dkernel_kernel(
    xt_ref, dy_ref, o_ref, *, tile: int, fb: int, g: int, cin: int,
    cout: int, mxu_dtype,
):
    """Grid-accumulated d(kernel) contraction: o (3, (G+2)*Cin, G*Cout) +=
    z[dt:dt+tile]^T dy per time tile, with the frequency halo assembled
    in-register from the same pre-stacked (tile+2)-row windows the forward
    consumes (one DMA per block — see the stacking-vs-split note in
    `pallas_conv.fused_conv_block`).  XLA's version of this contraction
    materialized BOTH operands in transposed (time-in-lanes) layouts —
    ~3 ms/step of copies plus 6 TF/s contraction fusions (round-4 profile,
    NOTES.md)."""
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    if fb == 1:
        # FB == 1 carried as a real axis would give (1, 128) trailing tiles
        # (see the forward's fb_squeezed note); re-expand in-register
        xb = xt_ref[0, 0].reshape(tile + 2, 1, g * cin)
        dy2 = dy_ref[0]  # (tile, n)
    else:
        xb = xt_ref[0, 0]  # (tile+2, fb, g*cin)
        dy2 = dy_ref[0]
    z = _halo_assemble(xb, fb=fb, g=g, cin=cin, edge="reflect",
                       mxu_dtype=mxu_dtype)
    k = (g + 2) * cin
    n = g * cout
    dyb = dy2.reshape(tile * fb, n).astype(mxu_dtype)
    for dt in range(3):
        zz = z[dt : dt + tile].reshape(tile * fb, k)
        # contract over the row axis: (K, rows) x (rows, N) on the MXU
        o_ref[dt] += jax.lax.dot_general(
            zz, dyb, (((0,), (0,)), ((), ())), preferred_element_type=F32
        )


def _dkernel_pallas(
    x_flat: jnp.ndarray, dy_flat: jnp.ndarray, cin: int, cout: int,
    *, tile: int = 150,
) -> jnp.ndarray:
    """dWbig (3, (G+2)*Cin, G*Cout) f32 for the reflect-padded packed conv:
    sum over (B, T, FB) of halo(x)[t+dt]^T dy[t]."""
    b, t, fc = x_flat.shape
    f = fc // cin
    g = max(128 // cin, 1)
    fbn = f // g
    n = g * cout
    while t % tile:
        tile //= 2
    nt = t // tile
    xtiles = stack_time_tiles(
        x_flat, tile, nt, edge="reflect"
    ).reshape(b, nt, tile + 2, fbn, g * cin)
    dy4 = dy_flat.reshape(b, t, fbn, n)
    return pl.pallas_call(
        functools.partial(
            _dkernel_kernel, tile=tile, fb=fbn, g=g, cin=cin, cout=cout,
            mxu_dtype=x_flat.dtype,
        ),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, 1, tile + 2, fbn, g * cin),
                         lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, fbn, n), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, (g + 2) * cin, n), lambda i, j: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, (g + 2) * cin, n), F32),
        interpret=jax.default_backend() != "tpu",
    )(xtiles, dy4)


def _conv_fwd_impl(x_flat: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """(B, T, F*Cin) flat packed -> (B, T, F*Cout); reflect-padded 3x3 conv
    (no bias/affine/relu — those live in XLA where lanes are already full)."""
    b, t, fc = x_flat.shape
    cin, cout = kernel.shape[2], kernel.shape[3]
    f = fc // cin
    y = fused_conv_block(
        x_flat.reshape(b, t, f, cin),
        kernel,
        jnp.ones((cout,), F32),
        jnp.zeros((cout,), F32),
        relu=False,
        mxu_dtype=x_flat.dtype,
    )
    return y.reshape(b, t, f * cout)


@jax.custom_vjp
def conv3x3_train(x_flat: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    return _conv_fwd_impl(x_flat, kernel)


def _conv_fwd(x_flat, kernel):
    return _conv_fwd_impl(x_flat, kernel), (x_flat, kernel)


def _freq_conv_row(row: jnp.ndarray, w3: jnp.ndarray) -> jnp.ndarray:
    """(B, F, Cout) x (3, Cout, Cin) -> (B, F, Cin): 3-tap zero-padded conv
    along frequency (one extended border row of the transposed conv)."""
    b, f, _ = row.shape
    rp = jnp.pad(row, ((0, 0), (1, 1), (0, 0)))
    return sum(
        jnp.einsum("bfc,cd->bfd", rp[:, k : k + f], w3[k],
                   preferred_element_type=F32)
        for k in range(3)
    )


def _time_conv_col(col: jnp.ndarray, w3: jnp.ndarray) -> jnp.ndarray:
    """(B, T, Cout) x (3, Cout, Cin) -> (B, T, Cin): 3-tap zero-padded conv
    along time (one extended border column of the transposed conv)."""
    b, t, _ = col.shape
    cp = jnp.pad(col, ((0, 0), (1, 1), (0, 0)))
    return sum(
        jnp.einsum("btc,cd->btd", cp[:, k : k + t], w3[k],
                   preferred_element_type=F32)
        for k in range(3)
    )


def _conv_bwd(res, dy_flat):
    x_flat, kernel = res
    b, t, fc = x_flat.shape
    cin, cout = kernel.shape[2], kernel.shape[3]
    f = fc // cin
    dtype = x_flat.dtype

    # ---- d(input): transposed conv.  Writing the forward on the reflect-
    # extended grid xe (indices -1..T x -1..F, xe[-1]=x[1], xe[T]=x[T-2], same
    # in freq), the adjoint is dxe[u,v] = sum_{a,b} dy[u+a-1, v+b-1] *
    # Wflip[a,b] with dy zero outside its range and Wflip = W[::-1, ::-1]
    # transposed in the channel axes; then reflect's adjoint folds the four
    # extended borders back: dx[1] += dxe[-1], dx[T-2] += dxe[T] (time),
    # dx[:,1] += dxe[:,-1], dx[:,F-2] += dxe[:,F] (freq), corners composing.
    wflip = kernel[::-1, ::-1].transpose(0, 1, 3, 2)  # (3,3,Cout,Cin)
    dx = _conv_fwd_zero_edge(dy_flat, wflip, f, cout, cin)

    # border slices taken from the FLAT layout (rows and the first/last
    # freq columns are contiguous there) — a (B,T,F,C) view would make XLA
    # materialize the whole cotangent in a transposed layout just to read
    # one strided column (measured ~1.5 ms/conv of pure copies)
    row0 = dy_flat[:, 0].reshape(b, f, cout)
    rowl = dy_flat[:, t - 1].reshape(b, f, cout)
    col0 = dy_flat[:, :, :cout]
    coll = dy_flat[:, :, (f - 1) * cout :]
    # extended border rows u=-1 / u=T (only a=2 / a=0 reach into dy)
    row_m1 = _freq_conv_row(row0, wflip[2])  # (B, F, Cin)
    row_t = _freq_conv_row(rowl, wflip[0])
    # extended border cols v=-1 / v=F (only b=2 / b=0 reach into dy)
    col_m1 = _time_conv_col(col0, wflip[:, 2])
    col_f = _time_conv_col(coll, wflip[:, 0])
    # corners (single-tap products), folded into the border-ROW vectors
    # before they touch dx: the corner targets dx[:, 1, cin:2cin] etc. are
    # exactly row_m1[:, 1] / row_t[:, f-2] positions, and folding there
    # keeps the expensive full-array updates at four instead of eight
    # (each fold add on dx is a separate latency-bound fusion — round-4
    # profile put the whole fold chain at ~1.5 ms/step)
    c_mm = jnp.einsum("bc,cd->bd", row0[:, 0], wflip[2, 2])
    c_mf = jnp.einsum("bc,cd->bd", row0[:, f - 1], wflip[2, 0])
    c_tm = jnp.einsum("bc,cd->bd", rowl[:, 0], wflip[0, 2])
    c_tf = jnp.einsum("bc,cd->bd", rowl[:, f - 1], wflip[0, 0])
    row_m1 = row_m1.at[:, 1].add(c_mm).at[:, f - 2].add(c_mf)
    row_t = row_t.at[:, 1].add(c_tm).at[:, f - 2].add(c_tf)

    dx = dx.astype(F32) if dtype != F32 else dx
    dx = dx.at[:, 1, :].add(row_m1.reshape(b, f * cin))
    dx = dx.at[:, t - 2, :].add(row_t.reshape(b, f * cin))
    dx = dx.at[:, :, cin : 2 * cin].add(col_m1)
    dx = dx.at[:, :, (f - 2) * cin : (f - 1) * cin].add(col_f)
    dx = dx.astype(dtype)

    # ---- d(kernel): three packed lane-full matmuls + offset-eye fold.
    g = max(128 // cin, 1)
    if _DKERNEL_IMPL == "pallas":
        dwbig = _dkernel_pallas(x_flat, dy_flat, cin, cout)
    else:
        fbn = f // g
        xpad = jnp.concatenate(  # reflect-extended time rows (matches forward)
            [x_flat[:, 1:2], x_flat, x_flat[:, t - 2 : t - 1]], axis=1
        )
        z = _halo_assemble(
            xpad.reshape(b * (t + 2), fbn, g * cin),
            fb=fbn, g=g, cin=cin, edge="reflect", mxu_dtype=dtype,
        ).reshape(b, t + 2, fbn, (g + 2) * cin)
        dyp = dy_flat.reshape(b, t, fbn, g * cout)
        dwbig = jnp.stack([
            jnp.einsum("btfk,btfn->kn", z[:, dt : dt + t], dyp,
                       preferred_element_type=F32)
            for dt in range(3)
        ])  # (3, (G+2)*Cin, G*Cout)
    r = dwbig.reshape(3, g + 2, cin, g, cout)
    # adjoint of build_wbig: dW[dt,dg,ci,co] = sum_gg dWbig[dt,(gg+dg)Cin+ci,
    # gg*Cout+co] — an offset-eye contraction per dg.
    eye = jnp.stack(
        [jnp.eye(g + 2, g, k=-dg, dtype=F32) for dg in range(3)]
    )  # (3, G+2, G)
    dw = jnp.einsum("taibj,dab->tdij", r, eye).astype(kernel.dtype)
    return dx, dw


def _conv_fwd_zero_edge(dy_flat, wflip, f, cout, cin):
    """Zero-padded 3x3 conv of the cotangent with the flipped kernel — the
    interior of the transposed conv, on the same Pallas kernel."""
    b, t, _ = dy_flat.shape
    y = fused_conv_block(
        dy_flat.reshape(b, t, f, cout),
        wflip,
        jnp.ones((cin,), F32),
        jnp.zeros((cin,), F32),
        relu=False,
        edge="zero",
        mxu_dtype=dy_flat.dtype,
    )
    return y.reshape(b, t, f * cin)


conv3x3_train.defvjp(_conv_fwd, _conv_bwd)
