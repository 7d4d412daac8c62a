"""PyTorch state-dict -> flax variable-tree mapping (pure numpy).

Every function takes a flat ``{key: np.ndarray}`` dict (a torch
``state_dict`` with tensors already converted to numpy) and returns the
matching flax ``{"params": ..., "batch_stats": ...}`` tree for the
conductor-tpu modules.  Layout conversions:

- ``nn.Linear``/pointwise ``Conv1d`` (out, in[, 1]) -> flax Dense kernel
  (in, out);
- ``nn.Conv2d`` (out, in, kh, kw) -> flax Conv kernel (kh, kw, in, out);
- BatchNorm ``weight/bias/running_mean/running_var`` ->
  params ``scale/bias`` + batch_stats ``mean/var``;
- the reference's K-major graph-conv channels and C-major/V-major flatten
  orders already line up with the flax modules by construction (see the
  layout notes in `models/music_encoder.py` and `models/stgcn.py`).

Key-name contracts covered (reference file:line):
- M2SNet: `Contrastive_Stage/models/M2SNet.py:7-41` (music_encoder.*,
  motion_encoder.*, fuse_layer.{0,2,4});
- MusicEncoder: `Contrastive_Stage/models/MusicEncoder.py:30-53`
  (convN.i.conv2d_layer.{0,1}, convN.i.residual.{0,1}, conv4.{0,1});
- MotionEncoder_STGCN: `Contrastive_Stage/models/MotionEncoder.py:6-27`
  (st_gcn.data_bn, st_gcn.st_gcn_networks.i.{gcn.conv,tcn.{0,2,3},
  residual.{0,1}}, st_gcn.edge_importance.i, fc.{0,1});
- MotionTransformer: `Diffusion_Stage/models/transformer.py:360-445`
  (sequence_embedding, music_encoder.*, proj, linear, joint_embed,
  time_embed.{0,2}, temporal_decoder_blocks.i.{sa_block,ca_block,ffn}, out);
- stage-2 tar dict: `Diffusion_Stage/trainers/ddpm_trainer.py:290-319`.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

Array = np.ndarray
SD = Mapping[str, Array]


# --------------------------------------------------------------------- utils


def strip_module_prefix(sd: SD) -> dict[str, Array]:
    """Drop the DataParallel ``module.`` prefix the reference strips by hand
    (`M2SGAN_train.py:47-51`, `transformer.py:395-401`)."""
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in sd.items()
    }


def _np(x) -> Array:
    return np.asarray(x, dtype=np.float32)


def _dense(sd: SD, key: str) -> dict[str, Array]:
    """torch Linear (out, in) or pointwise Conv1d (out, in, 1) -> Dense."""
    w = _np(sd[f"{key}.weight"])
    if w.ndim == 3:  # Conv1d kernel_size=1
        w = w[:, :, 0]
    return {"kernel": np.ascontiguousarray(w.T), "bias": _np(sd[f"{key}.bias"])}


def _conv2d(sd: SD, key: str) -> dict[str, Array]:
    """torch Conv2d (O, I, kh, kw) -> flax Conv (kh, kw, I, O)."""
    w = _np(sd[f"{key}.weight"])
    return {
        "kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
        "bias": _np(sd[f"{key}.bias"]),
    }


def _bn(sd: SD, key: str) -> tuple[dict[str, Array], dict[str, Array]]:
    """BatchNorm{1,2}d -> (params {scale, bias}, stats {mean, var})."""
    return (
        {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])},
        {
            "mean": _np(sd[f"{key}.running_mean"]),
            "var": _np(sd[f"{key}.running_var"]),
        },
    )


def _has(sd: SD, key: str) -> bool:
    return f"{key}.weight" in sd


# ------------------------------------------------------------- MusicEncoder

# flax block name -> torch Sequential index within convN
_MUSIC_BLOCKS = [
    ("conv1_0", "conv1.0"), ("conv1_1", "conv1.1"), ("conv1_2", "conv1.2"),
    ("conv2_0", "conv2.0"), ("conv2_1", "conv2.1"),
    ("conv3_0", "conv3.0"), ("conv3_1", "conv3.1"),
]


def import_music_encoder(sd: SD, prefix: str = "") -> dict[str, Any]:
    """MusicEncoder subtree -> flax `models.music_encoder.MusicEncoder`
    variables.  ``prefix`` addresses the subtree inside a larger state dict
    (e.g. ``"music_encoder."``)."""
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    for flax_name, tname in _MUSIC_BLOCKS:
        t = f"{prefix}{tname}"
        p: dict[str, Any] = {"Conv_0": _conv2d(sd, f"{t}.conv2d_layer.0")}
        s: dict[str, Any] = {}
        p["BatchNorm_0"], s["BatchNorm_0"] = _bn(sd, f"{t}.conv2d_layer.1")
        if _has(sd, f"{t}.residual.0"):  # conv1x1 + BN residual branch
            p["Conv_1"] = _conv2d(sd, f"{t}.residual.0")
            p["BatchNorm_1"], s["BatchNorm_1"] = _bn(sd, f"{t}.residual.1")
        params[flax_name] = p
        stats[flax_name] = s
    params["proj"] = _dense(sd, f"{prefix}conv4.0")
    params["proj_bn"], stats["proj_bn"] = _bn(sd, f"{prefix}conv4.1")
    return {"params": params, "batch_stats": stats}


# ----------------------------------------------------- MotionEncoder_STGCN


def import_motion_encoder(sd: SD, prefix: str = "") -> dict[str, Any]:
    """MotionEncoder_STGCN subtree -> flax
    `models.stgcn.MotionEncoderSTGCN` variables."""
    g = f"{prefix}st_gcn."
    gp: dict[str, Any] = {}
    gs: dict[str, Any] = {}
    gp["data_bn"], gs["data_bn"] = _bn(sd, f"{g}data_bn")

    n_blocks = 0
    while _has(sd, f"{g}st_gcn_networks.{n_blocks}.gcn.conv"):
        n_blocks += 1
    if n_blocks == 0:
        raise KeyError(f"no st_gcn_networks.* blocks under '{g}'")

    for i in range(n_blocks):
        t = f"{g}st_gcn_networks.{i}"
        bp: dict[str, Any] = {}
        bs: dict[str, Any] = {}
        # flax @nn.compact creation order: residual Conv/BN (if any) come
        # first, so the post-GCN/post-TCN BatchNorm indices shift by one.
        off = 0
        if _has(sd, f"{t}.residual.0"):
            rw = _np(sd[f"{t}.residual.0.weight"])  # (O, I, 1, 1)
            bp["Conv_0"] = {
                "kernel": np.ascontiguousarray(rw.transpose(2, 3, 1, 0)),
                "bias": _np(sd[f"{t}.residual.0.bias"]),
            }
            bp["BatchNorm_0"], bs["BatchNorm_0"] = _bn(sd, f"{t}.residual.1")
            off = 1
        # graph conv: Conv2d (K*C, Cin, 1, 1), K-major channels -> (Cin, K*C)
        gw = _np(sd[f"{t}.gcn.conv.weight"])[:, :, 0, 0]
        bp["GraphConv_0"] = {
            "kernel": np.ascontiguousarray(gw.T),
            "bias": _np(sd[f"{t}.gcn.conv.bias"]),
        }
        bp[f"BatchNorm_{off}"], bs[f"BatchNorm_{off}"] = _bn(sd, f"{t}.tcn.0")
        # temporal conv: Conv2d (C, C, kt, 1) -> (kt, Cin, C)
        tw = _np(sd[f"{t}.tcn.2.weight"])[:, :, :, 0]
        bp["TemporalConv_0"] = {
            "kernel": np.ascontiguousarray(tw.transpose(2, 1, 0)),
            "bias": _np(sd[f"{t}.tcn.2.bias"]),
        }
        bp[f"BatchNorm_{off + 1}"], bs[f"BatchNorm_{off + 1}"] = _bn(
            sd, f"{t}.tcn.3"
        )
        gp[f"blocks_{i}"] = bp
        gs[f"blocks_{i}"] = bs

    for i in range(n_blocks):
        k = f"{g}edge_importance.{i}"
        if k in sd:
            gp[f"edge_importance_{i}"] = _np(sd[k])

    params: dict[str, Any] = {"st_gcn": gp, "fc": _dense(sd, f"{prefix}fc.0")}
    stats: dict[str, Any] = {"st_gcn": gs}
    params["fc_bn"], stats["fc_bn"] = _bn(sd, f"{prefix}fc.1")
    return {"params": params, "batch_stats": stats}


def check_adjacency(sd: SD, prefix: str = "", atol: float = 1e-5) -> None:
    """Verify the checkpoint's baked adjacency buffer (`ST_GCN.py:39-40`)
    matches this framework's `build_adjacency` — a wrong graph would corrupt
    every motion latent silently."""
    key = f"{prefix}st_gcn.A"
    if key not in sd:
        return
    from ..models.graph import build_adjacency

    ours = build_adjacency("ConductorMotionX", "uniform")
    theirs = _np(sd[key])
    if ours.shape != theirs.shape or not np.allclose(ours, theirs, atol=atol):
        raise ValueError(
            f"checkpoint adjacency {theirs.shape} does not match "
            f"build_adjacency('ConductorMotionX','uniform') {ours.shape} — "
            "was the checkpoint trained with a different graph layout/strategy?"
        )


# ------------------------------------------------------------------ M2SNet


def import_m2snet(sd: SD) -> dict[str, Any]:
    """Full M2SNet state dict -> flax `models.m2snet.M2SNet` variables.
    Accepts either bare or ``module.``-prefixed keys."""
    sd = strip_module_prefix(sd)
    check_adjacency(sd, "motion_encoder.")
    music = import_music_encoder(sd, "music_encoder.")
    motion = import_motion_encoder(sd, "motion_encoder.")
    params: dict[str, Any] = {
        "music_encoder": music["params"],
        "motion_encoder": motion["params"],
        "fuse1": _dense(sd, "fuse_layer.0"),
        "fuse2": _dense(sd, "fuse_layer.2"),
        "fuse3": _dense(sd, "fuse_layer.4"),
    }
    stats = {
        "music_encoder": music["batch_stats"],
        "motion_encoder": motion["batch_stats"],
    }
    return {"params": params, "batch_stats": stats}


def music_encoder_from_m2snet(sd: SD) -> dict[str, Any]:
    """The stage-2 grafting contract: pull ``module.music_encoder.*`` out of
    a stage-1 M2SNet checkpoint (`transformer.py:394-401`)."""
    return import_music_encoder(strip_module_prefix(sd), "music_encoder.")


def motion_encoder_from_m2snet(sd: SD) -> dict[str, Any]:
    """The perceptual-loss encoder graft: ``module.motion_encoder.*``
    (`ddpm_trainer.py:66-79` MotionPretrain)."""
    sd = strip_module_prefix(sd)
    check_adjacency(sd, "motion_encoder.")
    return import_motion_encoder(sd, "motion_encoder.")


# ------------------------------------------------------- MotionTransformer


def import_motion_transformer(sd: SD) -> dict[str, Any]:
    """MotionTransformer state dict -> flax
    `models.transformer.MotionTransformer` variables.

    Works for both the efficient (linear-attention) and ``no_eff``
    (quadratic) reference variants — their state-dict key names coincide.
    The per-block StylizationBlock ``emb_layers`` Linears are packed into
    the flax model's single batched ``adaln_kernel`` (see
    `models/transformer.py` StylizationBlock docstring): column span
    ``(i*3 + j) * 2*latent`` holds layer i's sublayer j (0=self-attn,
    1=cross-attn, 2=FFN), scale before shift, matching
    ``torch.chunk(emb_out, 2)`` (`transformer.py:77`).
    """
    sd = strip_module_prefix(sd)
    music = import_music_encoder(sd, "music_encoder.")

    n_layers = 0
    while _has(sd, f"temporal_decoder_blocks.{n_layers}.sa_block.query"):
        n_layers += 1
    if n_layers == 0:
        raise KeyError("no temporal_decoder_blocks.* in state dict")
    latent = _np(sd["joint_embed.weight"]).shape[0]
    time_embed_dim = _np(sd["time_embed.0.weight"]).shape[0]

    def _ln(key: str) -> dict[str, Array]:
        return {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}

    span = 2 * latent
    adaln_kernel = np.zeros((time_embed_dim, n_layers * 3 * span), np.float32)
    adaln_bias = np.zeros((n_layers * 3 * span,), np.float32)

    params: dict[str, Any] = {
        "music_encoder": music["params"],
        "proj": _dense(sd, "proj"),
        "music_linear": _dense(sd, "linear"),
        "joint_embed": _dense(sd, "joint_embed"),
        "sequence_embedding": _np(sd["sequence_embedding"]),
        "time_embed_1": _dense(sd, "time_embed.0"),
        "time_embed_2": _dense(sd, "time_embed.2"),
        "out": _dense(sd, "out"),
    }

    for i in range(n_layers):
        t = f"temporal_decoder_blocks.{i}"
        for j, sub in enumerate(("sa_block", "ca_block", "ffn")):
            emb = _dense(sd, f"{t}.{sub}.proj_out.emb_layers.1")
            col = (i * 3 + j) * span
            adaln_kernel[:, col : col + span] = emb["kernel"]
            adaln_bias[col : col + span] = emb["bias"]

        def _styl(sub: str) -> dict[str, Any]:
            return {
                "LayerNorm_0": _ln(f"{t}.{sub}.proj_out.norm"),
                "Dense_0": _dense(sd, f"{t}.{sub}.proj_out.out_layers.2"),
            }

        blk = {
            "self_attn": {
                "LayerNorm_0": _ln(f"{t}.sa_block.norm"),
                "Dense_0": _dense(sd, f"{t}.sa_block.query"),
                "Dense_1": _dense(sd, f"{t}.sa_block.key"),
                "Dense_2": _dense(sd, f"{t}.sa_block.value"),
                "StylizationBlock_0": _styl("sa_block"),
            },
            "cross_attn": {
                "norm_x": _ln(f"{t}.ca_block.norm"),
                "norm_xf": _ln(f"{t}.ca_block.text_norm"),
                "query": _dense(sd, f"{t}.ca_block.query"),
                "key": _dense(sd, f"{t}.ca_block.key"),
                "value": _dense(sd, f"{t}.ca_block.value"),
                "styl": _styl("ca_block"),
            },
            "ffn": {
                "Dense_0": _dense(sd, f"{t}.ffn.linear1"),
                "Dense_1": _dense(sd, f"{t}.ffn.linear2"),
                "StylizationBlock_0": _styl("ffn"),
            },
        }
        params[f"blocks_{i}"] = blk

    params["adaln_kernel"] = adaln_kernel
    params["adaln_bias"] = adaln_bias
    return {"params": params, "batch_stats": {"music_encoder": music["batch_stats"]}}


# --------------------------------------------------------------- torch I/O


def load_torch_state_dict(path: str) -> dict[str, Array]:
    """Load a ``.pt`` state-dict file to numpy (requires torch, CPU-only)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.detach().cpu().numpy() for k, v in obj.items()}


def load_diffusion_tar(path: str) -> tuple[dict[str, Array], dict[str, Any]]:
    """Load a stage-2 ``latest.tar``-style checkpoint
    (`ddpm_trainer.py:290-319`): returns (encoder state dict as numpy,
    metadata {ep, total_it}).  The optimizer state is not imported — resume
    momentum from scratch (Adam warms up within a few hundred steps)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    enc = {k: v.detach().cpu().numpy() for k, v in obj["encoder"].items()}
    meta = {"ep": int(obj.get("ep", 0)), "total_it": int(obj.get("total_it", 0))}
    return enc, meta


# ----------------------------------------------------- M2SGAN Generator / D


def _conv1d(sd: SD, key: str) -> dict[str, Array]:
    """torch Conv1d (O, I, k) -> flax Conv (k, I, O)."""
    w = _np(sd[f"{key}.weight"])
    return {
        "kernel": np.ascontiguousarray(w.transpose(2, 1, 0)),
        "bias": _np(sd[f"{key}.bias"]),
    }


def _convtranspose1d(sd: SD, key: str) -> dict[str, Array]:
    """torch ConvTranspose1d (I, O, k) -> flax ConvTranspose SAME (k, I, O):
    flip the kernel taps (verified element-exact against torch for all four
    noise-upsampler configs, `Generator.py:59-64`)."""
    w = _np(sd[f"{key}.weight"])[:, :, ::-1]
    return {
        "kernel": np.ascontiguousarray(w.transpose(2, 0, 1)),
        "bias": _np(sd[f"{key}.bias"]),
    }


def _wn_conv1d(sd: SD, key: str):
    """weight-normed Conv1d: v (O, I, k) + g (O, 1, 1) -> flax
    (Conv {kernel: v, bias}, WeightNorm scale g).  Both frameworks
    renormalize per out channel, so v ports as the direction param."""
    v = _np(sd[f"{key}.weight_v"])
    g = _np(sd[f"{key}.weight_g"]).reshape(-1)
    conv = {
        "kernel": np.ascontiguousarray(v.transpose(2, 1, 0)),
        "bias": _np(sd[f"{key}.bias"]),
    }
    return conv, g


def import_generator(sd: SD, n_layers: int = 6) -> dict[str, Any]:
    """M2SGAN Generator state dict -> flax `models.generator.Generator`
    (TCN decoder) variables (`Generator.py:52-77`)."""
    sd = strip_module_prefix(sd)
    music = import_music_encoder(sd, "music_encoder.")

    tcn_p: dict[str, Any] = {}
    tcn_s: dict[str, Any] = {}
    for i in range(n_layers):
        t = f"tcn.TCN.tcn.tcn.network.{i}"
        bp: dict[str, Any] = {}
        bs: dict[str, Any] = {}
        for j in (0, 1):
            conv, g = _wn_conv1d(sd, f"{t}.conv{j + 1}")
            bp[f"Conv_{j}"] = conv
            bp[f"WeightNorm_{j}"] = {f"Conv_{j}/kernel/scale": g}
            bp[f"BatchNorm_{j}"], bs[f"BatchNorm_{j}"] = _bn(sd, f"{t}.bn{j + 1}")
        if f"{t}.downsample.weight" in sd:
            bp["Conv_2"] = _conv1d(sd, f"{t}.downsample")
        tcn_p[f"TemporalBlock_{i}"] = bp
        tcn_s[f"TemporalBlock_{i}"] = bs
    tcn_p["Dense_0"] = _dense(sd, "tcn.TCN.tcn.linear")

    decoder_p = {
        "DilatedTCN_0": tcn_p,
        "Dense_0": _dense(sd, "tcn.fc.0"),
        "Dense_1": _dense(sd, "tcn.fc.2"),
        "Dense_2": _dense(sd, "tcn.fc.4"),
    }
    params: dict[str, Any] = {
        "music_encoder": music["params"],
        "decoder": decoder_p,
        "up1": _convtranspose1d(sd, "noise_convTranspose.0"),
        "up2": _convtranspose1d(sd, "noise_convTranspose.2"),
        "up3": _convtranspose1d(sd, "noise_convTranspose.4"),
        "up4": _convtranspose1d(sd, "noise_convTranspose.6"),
    }
    stats: dict[str, Any] = {
        "music_encoder": music["batch_stats"],
        "decoder": {"DilatedTCN_0": tcn_s},
    }
    params["noise_bn"], stats["noise_bn"] = _bn(sd, "noise_BN")
    return {"params": params, "batch_stats": stats}


def import_discriminator(sd: SD) -> dict[str, Any]:
    """WGAN critic state dict -> flax
    `models.generator.Discriminator1DCNN` variables
    (`Discriminator.py:5-41`)."""
    sd = strip_module_prefix(sd)
    params: dict[str, Any] = {}
    for j, tkey in enumerate(("motion_encoder.0", "motion_encoder.3", "motion_encoder.6")):
        params[f"Conv_{j}"] = _conv1d(sd, tkey)
    for j, tkey in enumerate(("fc.0", "fc.2", "fc.4")):
        params[f"Dense_{j}"] = _dense(sd, tkey)
    return {"params": params}


_BUFFER_SUFFIXES = ("running_mean", "running_var", "num_batches_tracked")


def parameter_names(sd: SD) -> list[str]:
    """The torch ``named_parameters()`` order for a MotionTransformer state
    dict: state-dict order minus buffers.  This is the index contract of
    ``optimizer.state_dict()['param_groups'][0]['params']`` (torch enumerates
    ``model.parameters()`` in registration order)."""
    return [
        k for k in sd
        if not any(k.endswith(s) for s in _BUFFER_SUFFIXES)
        and not k.endswith(".A")
    ]


def import_adam_state(
    opt_sd: Mapping[str, Any], enc_sd: SD
) -> tuple[dict[str, Any], dict[str, Any], int]:
    """Stage-2 tar ``opt_encoder`` (torch Adam state dict) -> (mu, nu, count)
    flax trees matching `import_motion_transformer`'s params structure
    (`trainers/ddpm_trainer.py:290-319` saves it; the reference restores
    optimizer momentum on resume, `:303-319`).

    Adam moments are elementwise, so every weight-layout transform commutes
    with them: we build two moment-valued state dicts (zeros where torch has
    no state — e.g. the frozen music encoder never receives grads) and run
    them through the SAME importer as the weights.
    """
    enc_sd = strip_module_prefix(enc_sd)
    names = parameter_names(enc_sd)
    state = opt_sd.get("state", {})
    order = opt_sd.get("param_groups", [{}])[0].get(
        "params", list(range(len(names)))
    )

    mu_sd: dict[str, Array] = {}
    nu_sd: dict[str, Array] = {}
    count = 0
    for k, v in enc_sd.items():  # start from zeros everywhere
        mu_sd[k] = np.zeros_like(_np(v)) if k in names else _np(v)
        nu_sd[k] = np.zeros_like(_np(v)) if k in names else _np(v)
    for pos, idx in enumerate(order):
        ent = state.get(idx, state.get(str(idx)))
        if ent is None or pos >= len(names):
            continue
        name = names[pos]
        mu_sd[name] = _np(ent["exp_avg"])
        nu_sd[name] = _np(ent["exp_avg_sq"])
        count = max(count, int(np.asarray(ent["step"]).item()))

    mu = import_motion_transformer(mu_sd)["params"]
    nu = import_motion_transformer(nu_sd)["params"]
    return mu, nu, count


def load_diffusion_optimizer(path: str):
    """Pull (mu, nu, count) out of a ``latest.tar`` file; returns None when
    the tar carries no optimizer state."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    opt_sd = obj.get("opt_encoder")
    if not opt_sd or not opt_sd.get("state"):
        return None
    enc = {k: v.detach().cpu().numpy() for k, v in obj["encoder"].items()}

    def _tonp(x):
        return x.detach().cpu().numpy() if hasattr(x, "detach") else x

    opt_np = {
        "state": {
            k: {kk: _tonp(vv) for kk, vv in v.items()}
            for k, v in opt_sd["state"].items()
        },
        "param_groups": opt_sd.get("param_groups", []),
    }
    return import_adam_state(opt_np, enc)


def graft_adam_state(opt_state: Any, mu: Any, nu: Any, count: int) -> Any:
    """Replace the ScaleByAdamState inside an optax chain state (e.g.
    ``chain(clip_by_global_norm, adam)``) with imported moments."""
    import jax
    import jax.numpy as jnp
    import optax

    def visit(node):
        if isinstance(node, optax.ScaleByAdamState):
            return node._replace(  # NamedTuple
                count=jnp.asarray(count, jnp.int32),
                mu=jax.tree.map(jnp.asarray, mu),
                nu=jax.tree.map(jnp.asarray, nu),
            )
        if isinstance(node, tuple) and not hasattr(node, "_fields"):
            return tuple(visit(c) for c in node)
        if isinstance(node, tuple):  # other NamedTuples: recurse fields
            return type(node)(*(visit(c) for c in node))
        return node

    return visit(opt_state)


def assert_matches_template(imported: Any, template: Any, path: str = "") -> None:
    """Structural check: the imported tree must have exactly the template's
    leaves (names + shapes).  Raises with the full diff on mismatch."""
    import jax

    imp = {"/".join(str(p.key) for p in k): v.shape
           for k, v in jax.tree_util.tree_leaves_with_path(imported)}
    tmp = {"/".join(str(p.key) for p in k): v.shape
           for k, v in jax.tree_util.tree_leaves_with_path(template)}
    problems = []
    for k in sorted(set(imp) | set(tmp)):
        if k not in imp:
            problems.append(f"missing: {k} {tmp[k]}")
        elif k not in tmp:
            problems.append(f"extra:   {k} {imp[k]}")
        elif tuple(imp[k]) != tuple(tmp[k]):
            problems.append(f"shape:   {k} imported {imp[k]} != template {tmp[k]}")
    if problems:
        raise ValueError(
            f"imported tree does not match the flax template at '{path}':\n  "
            + "\n  ".join(problems)
        )
