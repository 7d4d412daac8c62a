"""Convert reference PyTorch checkpoints into conductor-tpu run dirs.

    # stage 1: M2SNet_last.pt -> orbax ckpt usable as --stage1_ckpt
    python -m conductor_tpu.cli.import_torch m2snet \
        --input M2SNet_last.pt --output runs/m2snet_imported

    # stage 2: latest.tar -> full run dir (config.json + ckpt/) usable by
    # cli/visualize.py and cli/evaluate.py, optionally grafting the stage-1
    # perceptual ST-GCN
    python -m conductor_tpu.cli.import_torch diffusion \
        --input latest.tar --output runs/diffusion_imported \
        [--stage1_pt M2SNet_last.pt] [--num_heads 8]

Covers the reference checkpoint formats end-to-end: raw ``state_dict`` .pt
(`Contrastive_Stage/M2SNet_eval.py:118-119`, with or without the
DataParallel ``module.`` prefix) and the stage-2 tar dict
``{encoder, opt_encoder, ep, total_it}``
(`Diffusion_Stage/trainers/ddpm_trainer.py:290-319`).  The denoiser
architecture (latent/layers/frames/ffn width) is inferred from the weights
and validated structurally against the flax template before saving.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, DenoiserConfig
from ..interop import (
    import_m2snet,
    import_motion_transformer,
    load_diffusion_tar,
    load_torch_state_dict,
    strip_module_prefix,
)
from ..interop.torch_import import (
    assert_matches_template,
    motion_encoder_from_m2snet,
)
from ..train.checkpoints import CheckpointManager


def _save_ckpt(out_dir: str, step: int, state) -> None:
    mgr = CheckpointManager(os.path.join(out_dir, "ckpt"))
    mgr.save(step, state, wait=True)
    mgr.close()


def import_m2snet_cmd(args) -> None:
    sd = load_torch_state_dict(args.input)
    variables = jax.tree.map(jnp.asarray, import_m2snet(sd))

    from ..models.m2snet import M2SNet

    template = M2SNet().init(
        jax.random.PRNGKey(0), jnp.zeros((1, 90, 128)), jnp.zeros((1, 30, 13, 2))
    )
    assert_matches_template(variables, template)

    os.makedirs(args.output, exist_ok=True)
    _save_ckpt(
        args.output,
        0,
        {
            "step": jnp.zeros((), jnp.int32),
            "params": variables["params"],
            "batch_stats": variables["batch_stats"],
        },
    )
    with open(os.path.join(args.output, "import_meta.json"), "w") as f:
        json.dump({"source": os.path.abspath(args.input), "kind": "m2snet"}, f)
    print(f"imported M2SNet -> {args.output} (use as --stage1_ckpt)")


def import_m2sgan_cmd(args) -> None:
    """Generator (+optional Discriminator) .pt -> orbax checkpoint with the
    GANState field names, restorable by M2SGANTrainer."""
    from ..interop.torch_import import import_discriminator, import_generator
    from ..models.generator import Discriminator1DCNN, Generator

    g_sd = load_torch_state_dict(args.input)
    g_vars = jax.tree.map(jnp.asarray, import_generator(g_sd))
    template = Generator().init(
        jax.random.PRNGKey(0), jnp.zeros((1, 90, 128)), jnp.zeros((1, 1, 8))
    )
    assert_matches_template(g_vars, template)

    tree = {
        "step": jnp.zeros((), jnp.int32),
        "g_params": g_vars["params"],
        "g_batch_stats": g_vars["batch_stats"],
    }
    if args.discriminator:
        d_sd = load_torch_state_dict(args.discriminator)
        d_vars = jax.tree.map(jnp.asarray, import_discriminator(d_sd))
        d_template = Discriminator1DCNN().init(
            jax.random.PRNGKey(0), jnp.zeros((1, 90, 13, 2))
        )
        assert_matches_template(d_vars, d_template)
        tree["d_params"] = d_vars["params"]

    os.makedirs(args.output, exist_ok=True)
    _save_ckpt(args.output, 0, tree)
    with open(os.path.join(args.output, "import_meta.json"), "w") as f:
        json.dump({"source": os.path.abspath(args.input), "kind": "m2sgan"}, f)
    print(f"imported M2SGAN G{'+D' if args.discriminator else ''} -> {args.output}")


def denoiser_config_from_state_dict(sd, num_heads: int = 8) -> DenoiserConfig:
    """Infer the architecture from weight shapes (heads don't affect shapes;
    pass the training value, default 8 per `transformer.py:367`)."""
    sd = strip_module_prefix(sd)
    latent = np.asarray(sd["joint_embed.weight"]).shape[0]
    n_layers = 0
    while f"temporal_decoder_blocks.{n_layers}.sa_block.query.weight" in sd:
        n_layers += 1
    return DenoiserConfig(
        input_feats=np.asarray(sd["out.weight"]).shape[0],
        num_frames=np.asarray(sd["sequence_embedding"]).shape[0],
        latent_dim=latent,
        ff_size=np.asarray(
            sd["temporal_decoder_blocks.0.ffn.linear1.weight"]
        ).shape[0],
        num_layers=n_layers,
        num_heads=num_heads,
    )


def import_diffusion_cmd(args) -> None:
    # --input may be the tar itself or a reference run dir
    # (checkpoints/<ds>/<name>/ with opt.txt + model/latest.tar) — the run-dir
    # form re-specifies nothing: architecture comes from the weights, training
    # hyperparameters from opt.txt (`utils/get_opt.py:29-106`).
    opt = None
    tar_path = args.input
    if os.path.isdir(args.input):
        from ..interop.opt_txt import resolve_run_dir

        opt, tar_path = resolve_run_dir(args.input, args.which_epoch)
        print(f"read {os.path.join(args.input, 'opt.txt')} -> {tar_path}")

    enc_sd, meta = load_diffusion_tar(tar_path)
    dcfg = denoiser_config_from_state_dict(enc_sd, args.num_heads)
    cfg = Config(denoiser=dcfg)
    if opt is not None:
        # cross-check weight-inferred architecture against the recorded run
        for opt_key, got in (
            ("num_layers", dcfg.num_layers),
            ("latent_dim", dcfg.latent_dim),
        ):
            want = opt.get(opt_key)
            if want is not None and int(want) != got:
                raise ValueError(
                    f"opt.txt says {opt_key}={want} but the weights imply "
                    f"{got} — wrong checkpoint for this run dir?"
                )
        cfg = dataclasses.replace(
            cfg,
            denoiser=dataclasses.replace(
                dcfg, efficient_attention=not bool(opt.get("no_eff", False))
            ),
            diffusion=dataclasses.replace(
                cfg.diffusion, steps=int(opt.get("diffusion_steps", 1000))
            ),
            train=dataclasses.replace(
                cfg.train,
                lr=float(opt.get("lr", cfg.train.lr)),
                batch_size=int(opt.get("batch_size", cfg.train.batch_size)),
                num_epochs=int(opt.get("num_epochs", cfg.train.num_epochs)),
                log_every=int(opt.get("log_every", cfg.train.log_every)),
                save_latest=int(opt.get("save_latest", cfg.train.save_latest)),
                save_every_e=int(opt.get("save_every_e", cfg.train.save_every_e)),
            ),
        )
        dcfg = cfg.denoiser
    # clamp the training window to the model's sequence capacity (matters
    # only for reduced-size checkpoints; the reference is 1800 frames)
    max_seconds = dcfg.num_frames // cfg.dataset.motion_hz
    if cfg.train.sample_length > max_seconds:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, sample_length=max_seconds)
        )
    variables = jax.tree.map(jnp.asarray, import_motion_transformer(enc_sd))

    from ..train.ddpm_trainer import DDPMTrainer

    trainer = DDPMTrainer(cfg)
    stage1_motion = None
    if args.stage1_pt:
        stage1_motion = jax.tree.map(
            jnp.asarray,
            motion_encoder_from_m2snet(load_torch_state_dict(args.stage1_pt)),
        )
    state = trainer.init_state(
        jax.random.PRNGKey(0), stage1_motion_variables=stage1_motion
    )
    assert_matches_template(
        {"params": variables["params"]}, {"params": state.params}
    )
    state = state.replace(
        step=jnp.asarray(meta["total_it"], jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
    )

    if not args.skip_optimizer:
        from ..interop.torch_import import graft_adam_state, load_diffusion_optimizer

        imported_opt = load_diffusion_optimizer(tar_path)
        if imported_opt is not None:
            mu, nu, count = imported_opt
            state = state.replace(
                opt_state=graft_adam_state(state.opt_state, mu, nu, count)
            )
            print(f"imported Adam moments (count={count})")

    os.makedirs(args.output, exist_ok=True)
    cfg.save(os.path.join(args.output, "config.json"))
    _save_ckpt(args.output, meta["total_it"], state)
    with open(os.path.join(args.output, "import_meta.json"), "w") as f:
        json.dump(
            {
                "source": os.path.abspath(args.input),
                "kind": "diffusion",
                **meta,
                "denoiser": dataclasses.asdict(dcfg),
                **({"opt_txt": opt} if opt is not None else {}),
            },
            f,
            indent=2,
        )
    print(
        f"imported MotionTransformer (ep={meta['ep']}, it={meta['total_it']}) "
        f"-> {args.output} (use as --run_dir)"
    )


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="kind", required=True)

    pm = sub.add_parser("m2snet", help="stage-1 M2SNet .pt -> orbax")
    pm.add_argument("--input", required=True)
    pm.add_argument("--output", required=True)
    pm.set_defaults(fn=import_m2snet_cmd)

    pg = sub.add_parser("m2sgan", help="M2SGAN Generator/Discriminator .pt -> orbax")
    pg.add_argument("--input", required=True, help="Generator .pt")
    pg.add_argument("--discriminator", default=None, help="Discriminator .pt")
    pg.add_argument("--output", required=True)
    pg.set_defaults(fn=import_m2sgan_cmd)

    pd = sub.add_parser(
        "diffusion",
        help="stage-2 latest.tar OR reference run dir (opt.txt) -> run dir",
    )
    pd.add_argument("--input", required=True,
                    help="latest.tar, or a reference run dir containing "
                    "opt.txt + model/latest.tar")
    pd.add_argument("--which_epoch", default="latest",
                    help="'latest' or an epoch number (reference "
                    "--which_epoch; only with a run-dir --input)")
    pd.add_argument("--output", required=True)
    pd.add_argument("--stage1_pt", default=None,
                    help="M2SNet .pt for the perceptual ST-GCN graft")
    pd.add_argument("--num_heads", type=int, default=8)
    pd.add_argument("--skip_optimizer", action="store_true",
                    help="don't import Adam moments from opt_encoder")
    pd.set_defaults(fn=import_diffusion_cmd)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
