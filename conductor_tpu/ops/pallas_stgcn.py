"""Whole-network fused Pallas kernel for the FROZEN ST-GCN motion encoder.

The stage-2 perceptual loss (reference `trainers/ddpm_trainer.py:228-246`,
weight 1e-6) and the M2SGAN SyncLoss run a frozen `MotionEncoderSTGCN` —
10 st_gcn blocks + projection — over (B, T, 13, 2) motion.  As composable
XLA ops that is ~60 HBM round trips of (B*T, 512) activations per forward
(GCN matmul, BN, relu, 3 temporal-conv shifts, BN, residual, relu per
block); profiling shows the chain costs ~15 ms of the ~36 ms train step.

Frozen means: BatchNorm runs on running stats (affine — folded into the
matmuls at pack time), and no weight gradients are needed — the backward
pass only propagates d(input), so both directions fit in single kernels:

- forward: one kernel per batch element; all 10 blocks + the (C,V)-major
  projection stay VMEM-resident.  Lane layout is joint-major (v*C + c),
  V padded 13 -> 16 so the temporal conv runs as 4-joint blocks of
  kron(eye(4), W[dt]) — full 128-lane matmuls with no cross-joint mixing.
  Pad lanes and pad rows are re-zeroed after every block so the zero-pad
  temporal-conv semantics at clip edges stay exact.
- backward: recomputes the forward (storing the 10 block inputs, ~19MB of
  the 64MB VMEM budget), then walks the blocks in reverse re-deriving the
  relu masks; all weights enter pre-transposed.

Packing (`pack_frozen_stgcn`) folds: data_bn -> block-0 GCN matmul;
edge-importance * adjacency + GraphConv weight -> one dense (V*Cin, V*C)
matmul per block (`models/stgcn.py` GraphConv composition); each BN's
running stats -> per-channel affine on the preceding matmul; fc + fc_bn +
the reference's channel-major (C, V) flatten -> one permuted (512, 128)
matmul.

Parity (values and d(input)) vs the flax module in eval mode is pinned in
`tests/test_pallas_stgcn.py`; interpret mode off-TPU."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
BN_EPS = 1e-5
V, VP, C, L = 13, 16, 32, 512  # joints, padded joints, channels, lanes
GROUPS = VP * C // 128         # 4-joint temporal-conv lane blocks


def _affine(scale, bias, mean, var):
    s = scale / jnp.sqrt(var + BN_EPS)
    return s, bias - mean * s


def _tile_joint(vec: jnp.ndarray) -> jnp.ndarray:
    """(C,) per-channel -> (L,) joint-major lanes, zero on pad joints."""
    out = jnp.tile(vec, (VP,))
    lane = jnp.arange(L)
    return jnp.where(lane < V * C, out, 0.0)


def pack_frozen_stgcn(variables, adjacency: jnp.ndarray, mxu_dtype=jnp.bfloat16):
    """MotionEncoderSTGCN variables -> packed weight dict (see module doc)."""
    p, s = variables["params"], variables["batch_stats"]
    g = p["st_gcn"]
    gs = s["st_gcn"]
    A = jnp.asarray(adjacency)  # (1, V, V)

    def gcn_mat(i, cin):
        blk, bst = g[f"blocks_{i}"], gs[f"blocks_{i}"]
        ew = g[f"edge_importance_{i}"]
        kmat = blk["GraphConv_0"]["kernel"].reshape(cin, 1, C)
        Ae = A * ew
        M = jnp.einsum("ckd,kvw->vcwd", kmat, Ae).reshape(V * cin, V * C)
        b = jnp.einsum("kd,kvw->wd", blk["GraphConv_0"]["bias"].reshape(1, C),
                       Ae).reshape(V * C)
        s1, t1 = _affine(blk["BatchNorm_0"]["scale"], blk["BatchNorm_0"]["bias"],
                         bst["BatchNorm_0"]["mean"], bst["BatchNorm_0"]["var"])
        s1t = jnp.tile(s1, (V,))
        Mf = jnp.zeros((cin * VP if cin != 2 else 128, L), F32)
        Mf = Mf.at[: V * cin, : V * C].set(M * s1t[None, :])
        bias1 = jnp.zeros((L,), F32).at[: V * C].set(b * s1t + jnp.tile(t1, (V,)))
        return Mf, bias1

    def tconv_mats(i):
        blk, bst = g[f"blocks_{i}"], gs[f"blocks_{i}"]
        W = blk["TemporalConv_0"]["kernel"]  # (3, C, C)
        s2, t2 = _affine(blk["BatchNorm_1"]["scale"], blk["BatchNorm_1"]["bias"],
                         bst["BatchNorm_1"]["mean"], bst["BatchNorm_1"]["var"])
        Wf = W * s2[None, None, :]
        eye4 = jnp.eye(4, dtype=F32)
        Wt = jnp.einsum("tcd,gh->tgchd", Wf, eye4).reshape(3, 128, 128)
        bias2 = _tile_joint(blk["TemporalConv_0"]["bias"] * s2 + t2)
        return Wt, bias2

    # block 0: fold data_bn into the GCN matmul (input lanes are raw motion)
    sd, td = _affine(g["data_bn"]["scale"], g["data_bn"]["bias"],
                     gs["data_bn"]["mean"], gs["data_bn"]["var"])
    M0, bias1_0 = gcn_mat(0, 2)
    # x_norm = x*sd + td:  x @ (sd*M0) + (td @ M0 + bias) — M0 rows = (v*2+c)
    bias1_0 = bias1_0 + td @ M0[: V * 2]
    M0 = M0.at[: V * 2].multiply(sd[:, None])

    mats, b1s, wts, b2s = [], [bias1_0], [], []
    Wt0, bias2_0 = tconv_mats(0)
    wts.append(Wt0)
    b2s.append(bias2_0)
    for i in range(1, 10):
        Mi, b1 = gcn_mat(i, C)
        mats.append(Mi)
        b1s.append(b1)
        Wti, b2 = tconv_mats(i)
        wts.append(Wti)
        b2s.append(b2)

    # fc + fc_bn + the (C, V)-major flatten permutation
    fck, fcb = p["fc"]["kernel"], p["fc"]["bias"]  # (416, 64), (64,)
    sf, tf = _affine(p["fc_bn"]["scale"], p["fc_bn"]["bias"],
                     s["fc_bn"]["mean"], s["fc_bn"]["var"])
    FC = jnp.zeros((L, 128), F32)
    rows = (jnp.arange(V * C) % C) * V + jnp.arange(V * C) // C  # (v*C+c)->(c*V+v)
    FC = FC.at[: V * C, :64].set(fck[rows] * sf[None, :])
    fcbias = jnp.zeros((128,), F32).at[:64].set(fcb * sf + tf)

    dt = mxu_dtype
    return dict(
        m0=M0.astype(dt), m=jnp.stack(mats).astype(dt),
        m0t=M0.T.astype(dt), mt=jnp.stack([m.T for m in mats]).astype(dt),
        wt=jnp.stack(wts).astype(dt),
        wtt=jnp.stack([jnp.transpose(w, (0, 2, 1)) for w in wts]).astype(dt),
        b1=jnp.stack(b1s), b2=jnp.stack(b2s),
        fc=FC.astype(dt), fct=FC.T.astype(dt), fcb=fcbias.reshape(1, -1),
    )


def _md(a, b, mxu_dtype):
    return jnp.dot(a.astype(mxu_dtype), b.astype(mxu_dtype),
                   preferred_element_type=F32)


def _tconv(g1, wt_i, tp, mxu_dtype, transpose=False):
    """(Tp, L) -> (Tp, L): per-joint k=3 temporal conv as 4-joint lane
    blocks; zero rows at the edges (the flax path pads with zeros)."""
    zp = jnp.concatenate(
        [jnp.zeros((1, L), F32), g1, jnp.zeros((1, L), F32)], axis=0
    )
    outs = []
    for grp in range(GROUPS):
        acc = None
        for dt in range(3):
            d = 2 - dt if transpose else dt
            part = _md(zp[d : d + tp, grp * 128 : (grp + 1) * 128],
                       wt_i[dt], mxu_dtype)
            acc = part if acc is None else acc + part
        outs.append(acc)
    return jnp.concatenate(outs, axis=-1)


def _fwd_chain(x, pack_refs, tp, t_valid, mxu_dtype, keep_inputs=False):
    """Shared forward: returns final h (and the per-block inputs if asked)."""
    m0, m, wt, b1, b2 = pack_refs
    rowmask = (jax.lax.broadcasted_iota(jnp.int32, (tp, 1), 0) < t_valid)
    inputs = [x] if keep_inputs else None
    h = None
    for i in range(10):
        src = x if i == 0 else h
        Mi = m0 if i == 0 else m[i - 1]
        g1 = jnp.maximum(_md(src, Mi, mxu_dtype) + b1[i].astype(F32), 0.0)
        y = _tconv(g1, wt[i], tp, mxu_dtype) + b2[i].astype(F32)
        if i > 0:
            y = y + h
        h = jnp.where(rowmask, jnp.maximum(y, 0.0), 0.0)
        if keep_inputs and i < 9:
            inputs.append(h)
    return (h, inputs) if keep_inputs else h


def _stgcn_fwd_kernel(x_ref, m0_ref, m_ref, wt_ref, b1_ref, b2_ref,
                      fc_ref, fcb_ref, o_ref, *, tp, t_valid, mxu_dtype):
    x = x_ref[0].astype(F32)
    h = _fwd_chain(x, (m0_ref[...], m_ref, wt_ref, b1_ref, b2_ref),
                   tp, t_valid, mxu_dtype)
    o_ref[0] = (_md(h, fc_ref[...], mxu_dtype) + fcb_ref[0].astype(F32)).astype(
        o_ref.dtype
    )


def _stgcn_bwd_kernel(x_ref, m0_ref, m_ref, wt_ref, b1_ref, b2_ref,
                      m0t_ref, mt_ref, wtt_ref, fct_ref, dy_ref, dx_ref,
                      *, tp, t_valid, mxu_dtype):
    x = x_ref[0].astype(F32)
    m0 = m0_ref[...]
    _, inputs = _fwd_chain(x, (m0, m_ref, wt_ref, b1_ref, b2_ref),
                           tp, t_valid, mxu_dtype, keep_inputs=True)
    rowmask = (jax.lax.broadcasted_iota(jnp.int32, (tp, 1), 0) < t_valid)

    dh = _md(dy_ref[0].astype(F32), fct_ref[...], mxu_dtype)
    for i in range(9, -1, -1):
        src = inputs[i]
        Mi = m0 if i == 0 else m_ref[i - 1]
        g1 = jnp.maximum(_md(src, Mi, mxu_dtype) + b1_ref[i].astype(F32), 0.0)
        out = inputs[i + 1] if i < 9 else None
        if out is None:
            # final block output mask: recompute it
            y = _tconv(g1, wt_ref[i], tp, mxu_dtype) + b2_ref[i].astype(F32)
            if i > 0:
                y = y + src
            out = jnp.where(rowmask, jnp.maximum(y, 0.0), 0.0)
        dh = jnp.where(out > 0.0, dh, 0.0)
        dres = dh if i > 0 else None
        dg1 = _tconv(dh, wtt_ref[i], tp, mxu_dtype, transpose=True)
        dg1 = jnp.where(g1 > 0.0, dg1, 0.0)
        MiT = m0t_ref[...] if i == 0 else mt_ref[i - 1]
        dh = _md(dg1, MiT, mxu_dtype)
        if dres is not None:
            dh = dh + dres
        dh = jnp.where(rowmask, dh, 0.0)
    dx_ref[0] = dh.astype(dx_ref.dtype)


def _specs(tp, batch_first, *shapes):
    out = []
    for shp in shapes:
        if batch_first:
            out.append(pl.BlockSpec(
                (1,) + shp, lambda i, n=len(shp): (i,) + (0,) * n,
                memory_space=pltpu.VMEM,
            ))
        else:
            out.append(pl.BlockSpec(
                shp, lambda i, n=len(shp): (0,) * n, memory_space=pltpu.VMEM
            ))
    return out


def _lanes(motion: jnp.ndarray) -> tuple[jnp.ndarray, int, int]:
    b, t = motion.shape[0], motion.shape[1]
    tp = -(-t // 8) * 8
    x = motion.reshape(b, t, V * 2)
    x = jnp.pad(x, ((0, 0), (0, tp - t), (0, 128 - V * 2)))
    return x, t, tp


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_frozen_stgcn(motion, pack, mxu_dtype=jnp.bfloat16):
    """(B, T, 13, 2) motion -> (B, T, 64) frozen-encoder latents.

    Equals `MotionEncoderSTGCN.apply(variables, motion)` (eval mode) with
    `pack = pack_frozen_stgcn(variables, adjacency)`; differentiable w.r.t.
    ``motion`` only (the encoder is frozen — `d(pack)` is zero)."""
    x, t, tp = _lanes(motion)
    b = x.shape[0]
    out = pl.pallas_call(
        functools.partial(_stgcn_fwd_kernel, tp=tp, t_valid=t,
                          mxu_dtype=mxu_dtype),
        grid=(b,),
        in_specs=(
            _specs(tp, True, (tp, 128))
            + _specs(tp, False, pack["m0"].shape, pack["m"].shape,
                     pack["wt"].shape, pack["b1"].shape, pack["b2"].shape,
                     pack["fc"].shape, pack["fcb"].shape)
        ),
        out_specs=_specs(tp, True, (tp, 128))[0],
        out_shape=jax.ShapeDtypeStruct((b, tp, 128), F32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(x, pack["m0"], pack["m"], pack["wt"], pack["b1"], pack["b2"],
      pack["fc"], pack["fcb"])
    return out[:, :t, :64]


def _stgcn_vjp_fwd(motion, pack, mxu_dtype):
    return fused_frozen_stgcn(motion, pack, mxu_dtype), (motion, pack)


def _stgcn_vjp_bwd(mxu_dtype, res, dy):
    motion, pack = res
    x, t, tp = _lanes(motion)
    b = x.shape[0]
    dyp = jnp.pad(dy.astype(F32), ((0, 0), (0, tp - t), (0, 128 - 64)))
    dx = pl.pallas_call(
        functools.partial(_stgcn_bwd_kernel, tp=tp, t_valid=t,
                          mxu_dtype=mxu_dtype),
        grid=(b,),
        in_specs=(
            _specs(tp, True, (tp, 128))
            + _specs(tp, False, pack["m0"].shape, pack["m"].shape,
                     pack["wt"].shape, pack["b1"].shape, pack["b2"].shape,
                     pack["m0t"].shape, pack["mt"].shape, pack["wtt"].shape,
                     pack["fct"].shape)
            + _specs(tp, True, (tp, 128))
        ),
        out_specs=_specs(tp, True, (tp, 128))[0],
        out_shape=jax.ShapeDtypeStruct((b, tp, 128), F32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(x, pack["m0"], pack["m"], pack["wt"], pack["b1"], pack["b2"],
      pack["m0t"], pack["mt"], pack["wtt"], pack["fct"], dyp)
    dmotion = dx[:, :t, : V * 2].reshape(motion.shape).astype(motion.dtype)
    dpack = jax.tree_util.tree_map(jnp.zeros_like, pack)
    return dmotion, dpack


fused_frozen_stgcn.defvjp(_stgcn_vjp_fwd, _stgcn_vjp_bwd)
