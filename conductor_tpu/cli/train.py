"""Stage-2 diffusion training CLI.

Rebuild of reference `Diffusion_Stage/tools/train.py` + the `DDPMTrainer.train`
loop (`trainers/ddpm_trainer.py:321-370`): one process drives SPMD training
over all visible devices (no slurm launcher / DDP wrapper needed — the mesh
replaces `MMDistributedDataParallel`, SURVEY.md §2.3).  The full `Config` is
persisted as `config.json` in the run directory (replacing the reference's
re-parsed `opt.txt`, `options/base_options.py:72-89`), checkpoints go to
`<run>/ckpt` with `--continue` resume (`--is_continue` equivalent).

    python -m conductor_tpu.cli.train --data_root /data/cm100 \
        --name my_run [--batch_size 32] [--epochs 100] [--times 25] [--continue]
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from ..config import Config, DiffusionConfig, TrainConfig
from ..data import ConductorMotionDataset
from ..data.native_loader import make_batch_iterator
from ..parallel import make_mesh, replicate, shard_batch
from ..train import CheckpointManager, DDPMTrainer
from ..utils import MetricLogger


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", required=True, help="ConductorMotion100 root (train/ test/ splits)")
    p.add_argument("--name", default="diffusion", help="run name")
    p.add_argument("--checkpoints_dir", default="./checkpoints")
    p.add_argument("--batch_size", type=int, default=32, help="GLOBAL batch size")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--times", type=int, default=1, help="dataset repetitions per epoch")
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--diffusion_steps", type=int, default=1000)
    p.add_argument("--sample_length", type=int, default=30, help="seconds per window")
    p.add_argument("--limit_hours", type=float, default=None)
    p.add_argument("--timestep_sampler", default="uniform",
                   choices=["uniform", "loss-second-moment"])
    p.add_argument("--stage1_ckpt", default=None,
                   help="M2SNet checkpoint dir to graft music/motion encoders from")
    p.add_argument("--continue", dest="is_continue", action="store_true")
    p.add_argument("--log_every", type=int, default=5)
    p.add_argument("--save_latest", type=int, default=500)
    p.add_argument("--save_every_e", type=int, default=5)
    p.add_argument("--seed", type=int, default=19990319)
    p.add_argument("--replicate_reference_mask", action="store_true")
    # model overrides (reference defaults: latent 128, 8 layers — ff_size 64
    # and 8 heads from the constructor defaults)
    p.add_argument("--latent_dim", type=int, default=128)
    p.add_argument("--ff_size", type=int, default=64)
    p.add_argument("--num_layers", type=int, default=8)
    p.add_argument("--num_heads", type=int, default=8)
    p.add_argument("--no_eff", action="store_true", help="quadratic attention fallback")
    p.add_argument("--schedule", default="linear", choices=["linear", "cosine"])
    p.add_argument("--compute_dtype", default="auto",
                   choices=["auto", "float32", "bfloat16"],
                   help="activation/matmul dtype (params stay f32); "
                        "auto = bf16 on TPU, f32 elsewhere")
    p.add_argument("--feat_impl", default="auto",
                   choices=["auto", "flax", "pallas"],
                   help="perceptual-loss ST-GCN: fused frozen-encoder "
                        "kernels (ops/pallas_stgcn.py) vs composable flax; "
                        "auto = pallas on TPU")
    p.add_argument("--train_layer_impl", default="auto",
                   choices=["auto", "flax", "pallas_fused"],
                   help="fused whole-layer training kernels (fwd + custom_vjp "
                        "bwd, ops/pallas_layer_bwd.py); ~2x the denoiser "
                        "fwd+bwd, requires dropout 0 / efficient attention / "
                        "no --replicate_reference_mask; auto = pallas_fused "
                        "on TPU when those hold")
    p.add_argument("--faithful", action="store_true",
                   help="reference-exact preset: pin every implementation "
                        "knob to the flax/XLA f32 path that reproduces the "
                        "reference's numerics bit-for-bit (the default is "
                        "the parity-pinned TPU-first fast configuration)")
    p.add_argument("--cached_features", action="store_true",
                   help="precompute frozen music-encoder features once and "
                        "train from the cache (numerically identical, ~2x step)")
    p.add_argument("--overwrite_cache", action="store_true",
                   help="recompute the on-disk feature cache even if present; "
                        "required when it was written under different frozen "
                        "weights (the sidecar metadata check refuses a silent "
                        "mismatch)")
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax_debug_nans (replaces the reference's "
                        "always-on anomaly detection, `tools/train.py:38`)")
    p.add_argument("--profile_steps", type=int, default=0,
                   help="capture a jax.profiler trace of the first N steps "
                        "to <run_dir>/profile (view with TensorBoard/XProf)")
    return p


def main(argv=None) -> None:
    args = build_argparser().parse_args(argv)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    # preemption-safe shutdown: SIGTERM/SIGINT request a checkpoint at the
    # next step boundary instead of killing mid-write (the reference's only
    # recovery is manual --is_continue from whatever latest.tar survived,
    # `trainers/ddpm_trainer.py:328-330`).  Installed before the (slow)
    # compile/cache setup so early preemption is also caught.
    import signal

    stop_requested = []

    def _request_stop(signum, frame):
        stop_requested.append(signum)
        # restore the previous handler so a SECOND Ctrl-C/SIGTERM force-exits
        # (e.g. out of a hung compile) instead of being swallowed
        signal.signal(signum, prev_handlers[signum])

    prev_handlers = {
        s: signal.signal(s, _request_stop) for s in (signal.SIGTERM, signal.SIGINT)
    }

    from ..config import DenoiserConfig

    cfg = Config(
        denoiser=DenoiserConfig(
            latent_dim=args.latent_dim, ff_size=args.ff_size,
            num_layers=args.num_layers, num_heads=args.num_heads,
            efficient_attention=not args.no_eff,
            compute_dtype=args.compute_dtype,
            train_layer_impl=args.train_layer_impl,
        ),
        diffusion=DiffusionConfig(steps=args.diffusion_steps, schedule=args.schedule),
        train=TrainConfig(
            lr=args.lr, batch_size=args.batch_size, num_epochs=args.epochs,
            sample_length=args.sample_length, timestep_sampler=args.timestep_sampler,
            log_every=args.log_every, save_latest=args.save_latest,
            save_every_e=args.save_every_e, seed=args.seed,
            replicate_reference_mask=args.replicate_reference_mask,
            cached_features=args.cached_features,
            feat_impl=args.feat_impl,
        ),
    )
    if args.faithful:
        from ..config import pin_faithful

        cfg = pin_faithful(cfg)
    else:
        # persist the RESOLVED impl knobs: the run dir's config.json should
        # say exactly which paths trained this model, not "auto"
        from ..config import resolve_auto

        cfg = resolve_auto(cfg)
    run_dir = os.path.join(args.checkpoints_dir, cfg.dataset.name, args.name)
    os.makedirs(run_dir, exist_ok=True)
    cfg.save(os.path.join(run_dir, "config.json"))

    trainer = DDPMTrainer(cfg)
    rng = jax.random.PRNGKey(cfg.train.seed)

    stage1 = _load_stage1(args.stage1_ckpt) if args.stage1_ckpt else {}
    state = trainer.init_state(rng, **stage1)

    ckpt = CheckpointManager(os.path.join(run_dir, "ckpt"))
    if args.is_continue and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        trainer.reset_caches()  # frozen subtrees may differ from init
        print(f"resumed from step {int(state.step)}")

    n_dev = len(jax.devices())
    dp = n_dev
    while cfg.train.batch_size % dp:
        dp -= 1  # batch must divide the data axis; drop to the largest divisor
    if dp != n_dev:
        print(f"warning: batch_size {cfg.train.batch_size} not divisible by "
              f"{n_dev} devices; using {dp}-way data parallelism")
    mesh = make_mesh(data=dp, devices=jax.devices()[:dp])
    print(f"devices: {n_dev}; mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    if args.cached_features:
        from ..data.feature_cache import (
            FeatureCachedDataset,
            precompute_music_features,
            tree_fingerprint,
        )

        variables = {"params": state.params, "batch_stats": state.batch_stats}
        encode = jax.jit(
            lambda mel: trainer.model.apply(
                variables, mel, method=trainer.model.encode_music
            )[1]
        )
        # sidecar keyed to the exact frozen encoder weights: a cache from a
        # different --stage1_ckpt or init seed has identical shapes, so
        # nothing downstream would error on a silent mismatch
        n = precompute_music_features(
            encode, args.data_root, "train",
            overwrite=args.overwrite_cache,
            meta={
                "fingerprint": tree_fingerprint({
                    "params": state.params["music_encoder"],
                    "batch_stats": state.batch_stats["music_encoder"],
                }),
            },
        )
        print(f"feature cache: {n} clips precomputed")
        ds = FeatureCachedDataset(
            args.data_root, "train", sample_length=cfg.train.sample_length,
            mode="random", limit_hours=args.limit_hours, spec=cfg.dataset,
        )
    else:
        ds = ConductorMotionDataset(
            args.data_root, "train", sample_length=cfg.train.sample_length,
            mode="random", limit_hours=args.limit_hours, spec=cfg.dataset,
        )
    # native C++ prefetching loader when buildable, Python fallback otherwise
    # multi-host (multi-slice): each host loads only its slice of every
    # global batch; shard_batch assembles the global array across processes
    loader = make_batch_iterator(
        ds, cfg.train.batch_size, times=args.times, seed=cfg.train.seed,
        host_shard=jax.process_count() > 1,
    )
    logger = MetricLogger(run_dir, console_every=cfg.train.log_every)

    profiling = args.profile_steps > 0
    if profiling:
        jax.profiler.start_trace(os.path.join(run_dir, "profile"))

    with mesh:
        state = replicate(state, mesh)
        it = int(state.step)
        if len(loader) == 0:
            raise SystemExit(
                f"no training batches: batch_size={cfg.train.batch_size} "
                f"exceeds the dataset length ({len(loader.ds)} windows). "
                "Lower --batch_size or add data."
            )
        start_epoch = it // max(len(loader), 1)
        for epoch in range(start_epoch, cfg.train.num_epochs):
            loader.epoch = epoch
            for batch in loader:
                state, metrics = trainer.train_step(state, shard_batch(batch, mesh), rng)
                it += 1
                logger.log(it, metrics, epoch=epoch)
                if profiling and it >= args.profile_steps:
                    jax.block_until_ready(metrics)
                    jax.profiler.stop_trace()
                    profiling = False
                    print(f"profile written to {run_dir}/profile")
                if it % cfg.train.save_latest == 0:
                    ckpt.save(it, state)
                if stop_requested:
                    break
            if stop_requested:
                if profiling:  # don't leave a truncated trace open
                    jax.profiler.stop_trace()
                    profiling = False
                ckpt.save(it, state, wait=True)
                print(f"stop requested (signal {stop_requested[0]}): saved "
                      f"step {it}; resume with --continue")
                break
            if epoch % cfg.train.save_every_e == 0:
                ckpt.save(it, state, wait=True)
        else:
            ckpt.save(it, state, wait=True)
    for s, h in prev_handlers.items():
        signal.signal(s, h)
    logger.close()
    print(f"done: {it} steps; checkpoints in {run_dir}/ckpt")


def _load_stage1(ckpt_dir: str) -> dict:
    """Graft the stage-1 M2SNet encoder subtrees (the cross-stage contract,
    `transformer.py:394-401` / `ddpm_trainer.py:71-78`)."""
    from ..train.checkpoints import restore_raw

    restored = restore_raw(ckpt_dir)
    params = restored["params"]
    stats = restored.get("batch_stats", {})
    return dict(
        stage1_music_params=params["music_encoder"],
        stage1_music_stats=stats.get("music_encoder"),
        stage1_motion_variables={
            "params": params["motion_encoder"],
            "batch_stats": stats.get("motion_encoder", {}),
        },
    )


if __name__ == "__main__":
    main()
