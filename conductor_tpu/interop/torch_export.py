"""Flax variable-tree -> PyTorch state-dict mapping (pure numpy).

Exact inverse of `torch_import`: models trained (or fine-tuned) in this
framework export back to the reference's published checkpoint formats —
stage-1 ``M2SNet_*.pt`` state dicts (`Contrastive_Stage/M2SNet_eval.py:
118-119`) and stage-2 ``latest.tar`` dicts
(`Diffusion_Stage/trainers/ddpm_trainer.py:290-319`) — so results remain
consumable by the reference's own eval/visualization tools.

Keys are emitted bare (no DataParallel ``module.`` prefix); every reference
loader strips/accepts both (`M2SGAN_train.py:47-51`, `transformer.py:
395-401`).  Buffers the reference persists but never trains are
reconstructed: the ST-GCN adjacency ``st_gcn.A`` from `models.graph.
build_adjacency` (it is data, not a weight) and BatchNorm
``num_batches_tracked`` as 0.

Round-trip identity (import(export(import(sd))) == import(sd), and raw
key/value equality against the reference manifests) is pinned in
`tests/test_torch_export.py`.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from .torch_import import _MUSIC_BLOCKS

Array = np.ndarray


def _np(x) -> Array:
    return np.asarray(x, dtype=np.float32)


def _t_dense(out: dict, p: Mapping, key: str, conv1d: bool = False) -> None:
    """flax Dense (in, out) -> torch Linear (out, in), or pointwise Conv1d
    (out, in, 1) for the reference modules that use 1x1 Conv1d."""
    w = np.ascontiguousarray(_np(p["kernel"]).T)
    out[f"{key}.weight"] = w[:, :, None] if conv1d else w
    out[f"{key}.bias"] = _np(p["bias"])


def _t_conv2d(out: dict, p: Mapping, key: str) -> None:
    """flax Conv (kh, kw, I, O) -> torch Conv2d (O, I, kh, kw)."""
    out[f"{key}.weight"] = np.ascontiguousarray(
        _np(p["kernel"]).transpose(3, 2, 0, 1)
    )
    out[f"{key}.bias"] = _np(p["bias"])


def _t_bn(out: dict, p: Mapping, s: Mapping, key: str) -> None:
    out[f"{key}.weight"] = _np(p["scale"])
    out[f"{key}.bias"] = _np(p["bias"])
    out[f"{key}.running_mean"] = _np(s["mean"])
    out[f"{key}.running_var"] = _np(s["var"])
    out[f"{key}.num_batches_tracked"] = np.zeros((), np.int64)


# ------------------------------------------------------------- MusicEncoder


def export_music_encoder(variables: Mapping[str, Any], prefix: str = "") -> dict:
    """Inverse of `torch_import.import_music_encoder`."""
    params, stats = variables["params"], variables["batch_stats"]
    out: dict[str, Array] = {}
    for flax_name, tname in _MUSIC_BLOCKS:
        p, s = params[flax_name], stats[flax_name]
        t = f"{prefix}{tname}"
        _t_conv2d(out, p["Conv_0"], f"{t}.conv2d_layer.0")
        _t_bn(out, p["BatchNorm_0"], s["BatchNorm_0"], f"{t}.conv2d_layer.1")
        if "Conv_1" in p:
            _t_conv2d(out, p["Conv_1"], f"{t}.residual.0")
            _t_bn(out, p["BatchNorm_1"], s["BatchNorm_1"], f"{t}.residual.1")
    _t_dense(out, params["proj"], f"{prefix}conv4.0", conv1d=True)
    _t_bn(out, params["proj_bn"], stats["proj_bn"], f"{prefix}conv4.1")
    return out


# ----------------------------------------------------- MotionEncoder_STGCN


def export_motion_encoder(variables: Mapping[str, Any], prefix: str = "") -> dict:
    """Inverse of `torch_import.import_motion_encoder`."""
    from ..models.graph import build_adjacency

    params, stats = variables["params"], variables["batch_stats"]
    gp, gs = params["st_gcn"], stats["st_gcn"]
    g = f"{prefix}st_gcn."
    out: dict[str, Array] = {
        f"{g}A": build_adjacency("ConductorMotionX", "uniform").astype(np.float32)
    }
    _t_bn(out, gp["data_bn"], gs["data_bn"], f"{g}data_bn")

    n_blocks = 0
    while f"blocks_{n_blocks}" in gp:
        n_blocks += 1
    for i in range(n_blocks):
        bp, bs = gp[f"blocks_{i}"], gs[f"blocks_{i}"]
        t = f"{g}st_gcn_networks.{i}"
        off = 0
        if "Conv_0" in bp:  # conv1x1 + BN residual branch (created first)
            out[f"{t}.residual.0.weight"] = np.ascontiguousarray(
                _np(bp["Conv_0"]["kernel"]).transpose(3, 2, 0, 1)
            )
            out[f"{t}.residual.0.bias"] = _np(bp["Conv_0"]["bias"])
            _t_bn(out, bp["BatchNorm_0"], bs["BatchNorm_0"], f"{t}.residual.1")
            off = 1
        # graph conv (Cin, K*C) -> Conv2d (K*C, Cin, 1, 1)
        gw = np.ascontiguousarray(_np(bp["GraphConv_0"]["kernel"]).T)
        out[f"{t}.gcn.conv.weight"] = gw[:, :, None, None]
        out[f"{t}.gcn.conv.bias"] = _np(bp["GraphConv_0"]["bias"])
        _t_bn(out, bp[f"BatchNorm_{off}"], bs[f"BatchNorm_{off}"], f"{t}.tcn.0")
        # temporal conv (kt, Cin, C) -> Conv2d (C, Cin, kt, 1)
        tw = np.ascontiguousarray(
            _np(bp["TemporalConv_0"]["kernel"]).transpose(2, 1, 0)
        )
        out[f"{t}.tcn.2.weight"] = tw[:, :, :, None]
        out[f"{t}.tcn.2.bias"] = _np(bp["TemporalConv_0"]["bias"])
        _t_bn(out, bp[f"BatchNorm_{off + 1}"], bs[f"BatchNorm_{off + 1}"],
              f"{t}.tcn.3")
        if f"edge_importance_{i}" in gp:
            out[f"{g}edge_importance.{i}"] = _np(gp[f"edge_importance_{i}"])

    # the reference ST_GCN registers a prediction head it never executes on
    # the M2S feature path (`ST_GCN.py:83-84,114` — dead in
    # `extract_feature`); strict load_state_dict still requires the keys, so
    # emit it zeroed (in_channels is hard-coded 256 in the reference even
    # though the M2S stack ends at 32 channels)
    last = gp[f"blocks_{n_blocks - 1}"]["TemporalConv_0"]["bias"]
    out[f"{g}fcn.weight"] = np.zeros((np.asarray(last).shape[0], 256, 1, 1),
                                     np.float32)
    out[f"{g}fcn.bias"] = np.zeros((np.asarray(last).shape[0],), np.float32)

    _t_dense(out, params["fc"], f"{prefix}fc.0", conv1d=True)
    _t_bn(out, params["fc_bn"], stats["fc_bn"], f"{prefix}fc.1")
    return out


# ------------------------------------------------------------------ M2SNet


def export_m2snet(variables: Mapping[str, Any]) -> dict:
    """Inverse of `torch_import.import_m2snet`: the full ``M2SNet_*.pt``
    state-dict format."""
    params, stats = variables["params"], variables["batch_stats"]
    out = export_music_encoder(
        {"params": params["music_encoder"],
         "batch_stats": stats["music_encoder"]},
        "music_encoder.",
    )
    out.update(export_motion_encoder(
        {"params": params["motion_encoder"],
         "batch_stats": stats["motion_encoder"]},
        "motion_encoder.",
    ))
    _t_dense(out, params["fuse1"], "fuse_layer.0", conv1d=True)
    _t_dense(out, params["fuse2"], "fuse_layer.2", conv1d=True)
    _t_dense(out, params["fuse3"], "fuse_layer.4", conv1d=True)
    return out


# ------------------------------------------------------- MotionTransformer


def export_motion_transformer(variables: Mapping[str, Any]) -> dict:
    """Inverse of `torch_import.import_motion_transformer`: the stage-2
    ``encoder`` state-dict format (both linear-attention and ``no_eff``
    reference variants share these key names)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out = export_music_encoder(
        {"params": params["music_encoder"],
         "batch_stats": stats["music_encoder"]},
        "music_encoder.",
    )
    _t_dense(out, params["proj"], "proj")
    _t_dense(out, params["music_linear"], "linear")
    _t_dense(out, params["joint_embed"], "joint_embed")
    out["sequence_embedding"] = _np(params["sequence_embedding"])
    _t_dense(out, params["time_embed_1"], "time_embed.0")
    _t_dense(out, params["time_embed_2"], "time_embed.2")
    _t_dense(out, params["out"], "out")

    n_layers = 0
    while f"blocks_{n_layers}" in params:
        n_layers += 1
    latent = _np(params["joint_embed"]["kernel"]).shape[1]
    span = 2 * latent
    aw = _np(params["adaln_kernel"])
    ab = _np(params["adaln_bias"])

    def _t_ln(p: Mapping, key: str) -> None:
        out[f"{key}.weight"] = _np(p["scale"])
        out[f"{key}.bias"] = _np(p["bias"])

    for i in range(n_layers):
        blk = params[f"blocks_{i}"]
        t = f"temporal_decoder_blocks.{i}"
        for j, (sub, styl) in enumerate((
            ("sa_block", blk["self_attn"]["StylizationBlock_0"]),
            ("ca_block", blk["cross_attn"]["styl"]),
            ("ffn", blk["ffn"]["StylizationBlock_0"]),
        )):
            col = (i * 3 + j) * span
            _t_dense(
                out,
                {"kernel": aw[:, col:col + span], "bias": ab[col:col + span]},
                f"{t}.{sub}.proj_out.emb_layers.1",
            )
            _t_ln(styl["LayerNorm_0"], f"{t}.{sub}.proj_out.norm")
            _t_dense(out, styl["Dense_0"], f"{t}.{sub}.proj_out.out_layers.2")
        sa = blk["self_attn"]
        _t_ln(sa["LayerNorm_0"], f"{t}.sa_block.norm")
        _t_dense(out, sa["Dense_0"], f"{t}.sa_block.query")
        _t_dense(out, sa["Dense_1"], f"{t}.sa_block.key")
        _t_dense(out, sa["Dense_2"], f"{t}.sa_block.value")
        ca = blk["cross_attn"]
        _t_ln(ca["norm_x"], f"{t}.ca_block.norm")
        _t_ln(ca["norm_xf"], f"{t}.ca_block.text_norm")
        _t_dense(out, ca["query"], f"{t}.ca_block.query")
        _t_dense(out, ca["key"], f"{t}.ca_block.key")
        _t_dense(out, ca["value"], f"{t}.ca_block.value")
        _t_dense(out, blk["ffn"]["Dense_0"], f"{t}.ffn.linear1")
        _t_dense(out, blk["ffn"]["Dense_1"], f"{t}.ffn.linear2")
    return out


# --------------------------------------------------------------- torch I/O


def _to_tensor(v: Array):
    import torch

    # copy: jax/np views can be non-writable, and from_numpy would alias them
    return torch.from_numpy(np.array(v))


def save_torch_state_dict(path: str, sd: Mapping[str, Array]) -> None:
    """Write a ``.pt`` state-dict file torch can load (requires torch)."""
    import torch

    torch.save({k: _to_tensor(v) for k, v in sd.items()}, path)


def save_diffusion_tar(
    path: str, encoder_sd: Mapping[str, Array], ep: int = 0, total_it: int = 0,
    lr: float = 2e-4,
) -> None:
    """Write a stage-2 ``latest.tar``-style checkpoint the reference's
    `DDPMTrainer.load` (`ddpm_trainer.py:303-319`) accepts for BOTH eval
    (reads only ``encoder``) and training resume (also reads
    ``opt_encoder``).  ``opt_encoder`` is an EMPTY torch-Adam state dict
    with the right parameter-group arity: torch's Adam state indices follow
    the module's registration order, which this exporter does not replicate,
    and an empty state loads cleanly (the reference resumes with fresh
    moments) whereas mis-indexed moments would corrupt training silently."""
    import torch

    from .torch_import import parameter_names

    n_params = len(parameter_names(encoder_sd))
    opt_encoder = {
        "state": {},
        "param_groups": [
            {
                "lr": lr, "betas": (0.9, 0.999), "eps": 1e-8,
                "weight_decay": 0, "amsgrad": False, "maximize": False,
                "foreach": None, "capturable": False,
                "differentiable": False, "fused": None,
                "params": list(range(n_params)),
            }
        ],
    }
    torch.save(
        {
            "encoder": {k: _to_tensor(v) for k, v in encoder_sd.items()},
            "opt_encoder": opt_encoder,
            "ep": int(ep),
            "total_it": int(total_it),
        },
        path,
    )
