"""Packed-weight fused sampling path for the MotionTransformer.

Owns the mapping from the flax param tree to the packed per-layer weight
banks of `ops/pallas_layer.fused_decoder_stack` (all layers in ONE kernel,
residual stream VMEM-resident across layers), and a pure `denoise`
mirroring `MotionTransformer.denoise` built from those banks — used by
`DDPMTrainer.generate` when ``DenoiserConfig.layer_impl == "pallas_fused"``.
Parity with the flax path is pinned by `tests/test_fused_denoiser.py`.

Inference-only by design: the sampler takes no gradients, so the kernel
needs no VJP, and training keeps the composable flax modules.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import Config
from ..models.transformer import timestep_embedding
from ..ops.pallas_layer import fused_decoder_stack, quantize_rows


def _pad_to(x: jnp.ndarray, shape: tuple[int, ...]) -> jnp.ndarray:
    pads = [(0, s - d) for d, s in zip(x.shape, shape)]
    return jnp.pad(x, pads)


def pack_layer_weights(params, layer: int, cfg: Config):
    """One layer's flax params -> (mats (9,D,D), vecs (24,D), adaln_w,
    adaln_b).  jnp-native: runs under jit on traced params (the trainer
    constructs the fused path inside the jitted generate)."""
    d = cfg.denoiser.latent_dim
    blk = params[f"blocks_{layer}"]
    sa, ca, ff = blk["self_attn"], blk["cross_attn"], blk["ffn"]
    g = lambda p: jnp.asarray(p, jnp.float32)

    mats = jnp.stack(
        [
            g(sa["Dense_0"]["kernel"]),              # Wq
            g(sa["Dense_1"]["kernel"]),              # Wk
            g(sa["Dense_2"]["kernel"]),              # Wv
            g(sa["StylizationBlock_0"]["Dense_0"]["kernel"]),
            g(ca["query"]["kernel"]),                # Wq_cross
            g(ca["styl"]["Dense_0"]["kernel"]),
            _pad_to(g(ff["Dense_0"]["kernel"]), (d, d)),   # W1 (D, ff)->D
            _pad_to(g(ff["Dense_1"]["kernel"]), (d, d)),   # W2 (ff, D)->D
            g(ff["StylizationBlock_0"]["Dense_0"]["kernel"]),
        ]
    )
    rows = [
        g(sa["LayerNorm_0"]["scale"]), g(sa["LayerNorm_0"]["bias"]),
        g(sa["Dense_0"]["bias"]), g(sa["Dense_1"]["bias"]), g(sa["Dense_2"]["bias"]),
        g(sa["StylizationBlock_0"]["LayerNorm_0"]["scale"]),
        g(sa["StylizationBlock_0"]["LayerNorm_0"]["bias"]),
        g(sa["StylizationBlock_0"]["Dense_0"]["bias"]),
        g(ca["norm_x"]["scale"]), g(ca["norm_x"]["bias"]),
        g(ca["query"]["bias"]),
        g(ca["styl"]["LayerNorm_0"]["scale"]),
        g(ca["styl"]["LayerNorm_0"]["bias"]),
        g(ca["styl"]["Dense_0"]["bias"]),
        _pad_to(g(ff["Dense_0"]["bias"]), (d,)),
        g(ff["Dense_1"]["bias"]),
        g(ff["StylizationBlock_0"]["LayerNorm_0"]["scale"]),
        g(ff["StylizationBlock_0"]["LayerNorm_0"]["bias"]),
        g(ff["StylizationBlock_0"]["Dense_0"]["bias"]),
    ]
    vecs = jnp.zeros((24, d), jnp.float32)
    vecs = vecs.at[: len(rows)].set(jnp.stack(rows))

    span = 3 * 2 * d
    aw = g(params["adaln_kernel"])[:, layer * span : (layer + 1) * span]
    ab = g(params["adaln_bias"])[layer * span : (layer + 1) * span]
    return mats, vecs, aw, ab


def expand_block_diag(kv: jnp.ndarray) -> jnp.ndarray:
    """(B, H, Dh, Dh) cross-KV state -> (B, H*Dh, H*Dh) block diagonal.

    Built as one eye-masked broadcast (block (i, j) = kv[h] iff i == j == h)
    rather than H `.at[].set` updates: the functional updates lowered to a
    per-layer dynamic-update-slice chain in BOTH the training forward and
    its transpose — the round-4 stage-2 profile's latency-bound DUS tail."""
    b, h, dh, _ = kv.shape
    eye = jnp.eye(h, dtype=kv.dtype)
    return jnp.einsum("bhpq,hg->bhpgq", kv, eye).reshape(b, h * dh, h * dh)


class FusedDenoiser:
    """Callable denoiser built from packed weights + a precomputed cond."""

    # the packed-weight pytree (`export_pack`): everything `__init__` derives
    # from the (frozen) params — mel- and step-count-independent, so serving
    # callers hoist it out of the per-call jit (`DDPMTrainer._sampling_pack`)
    PACK_FIELDS = (
        "mats", "vecs", "adaln_w", "adaln_w_scale", "adaln_b",
        "w_joint", "b_joint", "seq_emb", "w_t1", "b_t1", "w_t2", "b_t2",
        "w_out", "b_out",
    )

    def __init__(self, params, cfg: Config, pack: dict | None = None):
        from ..config import resolve_auto

        cfg = resolve_auto(cfg)  # direct callers may pass "auto" impl knobs
        self.cfg = cfg
        d = cfg.denoiser
        self.num_heads = d.num_heads
        self.latent_dim = d.latent_dim
        self.mxu_dtype = jnp.dtype(d.compute_dtype)
        self.vpu_dtype = jnp.dtype(getattr(d, "sampler_vpu_dtype", "float32"))
        self.adaln_int8 = bool(getattr(d, "sampler_adaln_int8", False))
        if pack is not None:
            # prebuilt weight pack (export_pack of an equivalent config):
            # skips the stack/quantize graph entirely
            self.adaln_w_scale = None
            for k, v in pack.items():
                setattr(self, k, v)
            return
        # mats/adaln_w feed the MXU (cast inside the kernel anyway) — store
        # them at mxu_dtype to halve per-step HBM weight traffic at bf16.
        # vecs stay f32 (VPU adds).  All layers stacked along a leading axis
        # for the whole-stack kernel.
        banks = [pack_layer_weights(params, i, cfg) for i in range(d.num_layers)]
        self.mats = jnp.stack([b[0] for b in banks]).astype(self.mxu_dtype)
        self.vecs = jnp.stack([b[1] for b in banks])
        adaln_w = jnp.stack([b[2] for b in banks])
        if self.adaln_int8:
            # per-COLUMN symmetric int8 (quantize_rows over the E axis via
            # transpose): the AdaLN matmul contracts E, so each output
            # column dequantizes with one scale
            q, s = quantize_rows(adaln_w.transpose(0, 2, 1))
            self.adaln_w = q.transpose(0, 2, 1)               # (L, E, 6D) int8
            self.adaln_w_scale = s.transpose(0, 2, 1)         # (L, 1, 6D) f32
        else:
            self.adaln_w = adaln_w.astype(self.mxu_dtype)
            self.adaln_w_scale = None
        self.adaln_b = jnp.stack([b[3] for b in banks])
        p = params
        self.w_joint = jnp.asarray(p["joint_embed"]["kernel"])
        self.b_joint = jnp.asarray(p["joint_embed"]["bias"])
        self.seq_emb = jnp.asarray(p["sequence_embedding"])
        self.w_t1 = jnp.asarray(p["time_embed_1"]["kernel"])
        self.b_t1 = jnp.asarray(p["time_embed_1"]["bias"])
        self.w_t2 = jnp.asarray(p["time_embed_2"]["kernel"])
        self.b_t2 = jnp.asarray(p["time_embed_2"]["bias"])
        self.w_out = jnp.asarray(p["out"]["kernel"])
        self.b_out = jnp.asarray(p["out"]["bias"])

    def export_pack(self) -> dict:
        """The derived-weight pytree for `__init__(..., pack=)`; None-valued
        fields (adaln_w_scale without int8) are omitted."""
        return {
            k: getattr(self, k)
            for k in self.PACK_FIELDS
            if getattr(self, k) is not None
        }

    def prepare_cond(self, cond) -> dict:
        """`MotionTransformer.precompute_cond` output -> fused-path cond."""
        out = {
            "emb_base": cond["emb_base"],
            "kv_stack": jnp.stack(
                [expand_block_diag(kv) for kv in cond["cross"]]
            ).astype(self.mxu_dtype),
        }
        if "temb_table" in cond:
            out["temb_table"] = cond["temb_table"]
        return out

    def __call__(self, x: jnp.ndarray, t: jnp.ndarray, cond: dict) -> jnp.ndarray:
        B, T = x.shape[0], x.shape[1]
        if "temb_table" in cond:
            temb = cond["temb_table"][t]
        else:
            temb = timestep_embedding(t, self.latent_dim)
            temb = nn.silu(temb @ self.w_t1 + self.b_t1) @ self.w_t2 + self.b_t2
        # emb_act is read from HBM by all num_layers kernels — ship it at
        # mxu_dtype (it only ever feeds MXU operands), or int8 + row scales
        # in the int8-AdaLN mode.
        emb_act = nn.silu(temb[:, None, :] + cond["emb_base"])
        emb_scale = None
        if self.adaln_int8:
            emb_act, emb_scale = quantize_rows(emb_act)
        else:
            emb_act = emb_act.astype(self.mxu_dtype)

        h = x @ self.w_joint + self.b_joint + self.seq_emb[None, :T]
        h = fused_decoder_stack(
            h, emb_act, cond["kv_stack"], self.mats, self.vecs,
            self.adaln_w, self.adaln_b, self.num_heads,
            mxu_dtype=self.mxu_dtype, vpu_dtype=self.vpu_dtype,
            emb_scale=emb_scale, adaln_w_scale=self.adaln_w_scale,
        )
        return (h @ self.w_out + self.b_out).astype(jnp.float32)

    def ddim_sample(self, cond: dict, sched, shape, rng: jax.Array) -> jnp.ndarray:
        """Full eta=0 DDIM ladder with the sampler glue kernels
        (`ops/pallas_sampler.py`): the scan body is kernels end-to-end —
        prologue -> num_layers fused layers -> epilogue — plus two table
        gathers.  Matches `sampling.ddim_sample_loop` over :meth:`__call__`
        exactly (same rng stream; eta=0 draws no per-step noise)."""
        from ..ops.pallas_sampler import (
            ddim_affine_tables,
            sampler_epilogue,
            sampler_prologue,
        )

        B, T, C = shape
        D = self.latent_dim
        P = 128 if C <= 128 else ((C + 127) // 128) * 128
        w_joint = jnp.zeros((P, D), self.w_joint.dtype).at[:C].set(self.w_joint)
        w_out = jnp.zeros((D, P), self.w_out.dtype).at[:, :C].set(self.w_out)
        b_out = jnp.zeros((P,), self.b_out.dtype).at[:C].set(self.b_out)
        seq_bias = self.seq_emb[:T] + self.b_joint
        alpha_tab, beta_tab = ddim_affine_tables(sched)
        temb_table = cond["temb_table"]

        init_rng, _ = jax.random.split(rng)
        x = jnp.pad(
            jax.random.normal(init_rng, (B, T, C)), ((0, 0), (0, 0), (0, P - C))
        )

        def body(x, t):
            t_model = sched.timestep_map[t]
            emb = temb_table[t_model][None, None, :] + cond["emb_base"]
            outs = sampler_prologue(
                x, emb, w_joint, seq_bias,
                mxu_dtype=self.mxu_dtype, emb_dtype=self.mxu_dtype,
                quantize_emb=self.adaln_int8,
            )
            h, emb_act = outs[0], outs[1]
            emb_scale = outs[2] if self.adaln_int8 else None
            h = fused_decoder_stack(
                h, emb_act, cond["kv_stack"], self.mats, self.vecs,
                self.adaln_w, self.adaln_b, self.num_heads,
                mxu_dtype=self.mxu_dtype, vpu_dtype=self.vpu_dtype,
                emb_scale=emb_scale, adaln_w_scale=self.adaln_w_scale,
            )
            x = sampler_epilogue(
                h, x, w_out, b_out, alpha_tab[t], beta_tab[t],
                mxu_dtype=self.mxu_dtype,
            )
            return x, None

        timesteps = jnp.arange(sched.num_timesteps - 1, -1, -1, dtype=jnp.int32)
        x, _ = jax.lax.scan(body, x, timesteps)
        return x[:, :, :C]


def _ln(x, scale, bias, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def cross_kv_state(ca_params, xf_o: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """`LinearCrossAttention.kv_state` (transformer.py) in plain jnp from the
    flax param subtree — differentiable w.r.t. norm_xf/key/value params.
    Returns the (B, D, D) block-diagonal state the fused kernels consume."""
    fn = _ln(xf_o, ca_params["norm_xf"]["scale"], ca_params["norm_xf"]["bias"])
    k = fn @ ca_params["key"]["kernel"] + ca_params["key"]["bias"]
    v = fn @ ca_params["value"]["kernel"] + ca_params["value"]["bias"]
    b, n, d = k.shape
    h = num_heads
    kh = jax.nn.softmax(k.reshape(b, n, h, d // h).astype(jnp.float32), axis=1)
    vh = v.reshape(b, n, h, d // h).astype(jnp.float32)
    return expand_block_diag(jnp.einsum("bnhd,bnhl->bhdl", kh, vh))


def fused_train_denoise(
    params, cfg: Config, x: jnp.ndarray, t: jnp.ndarray,
    xf_proj: jnp.ndarray, xf_out: jnp.ndarray,
) -> jnp.ndarray:
    """Differentiable denoiser forward over the fused training layers
    (`ops/pallas_layer_bwd.fused_decoder_layer_train`): the whole-layer
    kernels with a hand-written backward kernel replace the composable flax
    decoder stack.  Mirrors `MotionTransformer.__call__` for the framework
    default configuration (efficient attention, dropout 0, full mask —
    `DDPMTrainer` gates on these).  Gradients flow into the SAME flax param
    tree through the packing (stack/pad/slice are linear).

    Step-level loss/grad parity with the flax path is pinned in
    `tests/test_fused_train_path.py`.
    """
    d = cfg.denoiser
    mxu_dtype = jnp.dtype(d.compute_dtype)
    p = params
    B, T = x.shape[0], x.shape[1]
    if x.ndim == 4:
        x = x.reshape(B, T, -1)

    # conditioning constants (precompute_cond analogue, differentiable)
    emb_base = xf_proj @ p["music_linear"]["kernel"] + p["music_linear"]["bias"]
    xf_o = xf_out @ p["music_linear"]["kernel"] + p["music_linear"]["bias"]

    temb = timestep_embedding(t, d.latent_dim)
    temb = (
        nn.silu(temb @ p["time_embed_1"]["kernel"] + p["time_embed_1"]["bias"])
        @ p["time_embed_2"]["kernel"] + p["time_embed_2"]["bias"]
    )
    emb_act = nn.silu(temb[:, None, :] + emb_base).astype(mxu_dtype)

    h = (
        x @ p["joint_embed"]["kernel"] + p["joint_embed"]["bias"]
        + p["sequence_embedding"][None, :T]
    ).astype(mxu_dtype)
    from ..ops.pallas_layer_bwd import fused_decoder_layer_train

    # pad the row dim to a sublane multiple ONCE; every layer kernel then
    # sees aligned inputs (its internal pad/slice are no-ops) with rows
    # >= T masked via t_valid — saves 2*num_layers pad/slice round trips
    tp = -(-T // 8) * 8
    h = jnp.pad(h, ((0, 0), (0, tp - T), (0, 0)))
    emb_act = jnp.pad(emb_act, ((0, 0), (0, tp - T), (0, 0)))
    for i in range(d.num_layers):
        mats, vecs, aw, ab = pack_layer_weights(params, i, cfg)
        kvb = cross_kv_state(
            p[f"blocks_{i}"]["cross_attn"], xf_o, d.num_heads
        ).astype(mxu_dtype)
        h = fused_decoder_layer_train(
            h, emb_act, kvb, mats, vecs, aw, ab, d.num_heads, mxu_dtype, T
        )
    h = h[:, :T]
    return (h.astype(jnp.float32) @ p["out"]["kernel"] + p["out"]["bias"])
