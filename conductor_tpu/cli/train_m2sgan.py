"""Stage-1 WGAN-GP training CLI (M2SGAN).

Rebuild of reference `Contrastive_Stage/M2SGAN_train.py:36-198`: loads the
frozen M2SNet, transfers its music encoder into the generator, alternates
5 critic iterations with one generator step, and periodically runs the full
M2SGAN evaluation (realism + consistency metrics).

    python -m conductor_tpu.cli.train_m2sgan --data_root /data/cm100 \
        --m2snet_ckpt checkpoints/M2SNet/M2SNet_hard/ckpt
"""

from __future__ import annotations

import argparse
import os

import jax

from ..data import BatchIterator, ConductorMotionDataset
from ..train import CheckpointManager, M2SGANTrainer
from ..utils import MetricLogger


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", required=True)
    p.add_argument("--m2snet_ckpt", default=None,
                   help="stage-1 M2SNet checkpoint dir (music-encoder transfer + SyncLoss net)")
    p.add_argument("--name", default="M2SGAN")
    p.add_argument("--checkpoints_dir", default="./checkpoints")
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--batch_size", type=int, default=55)
    p.add_argument("--sample_length", type=int, default=30)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--critic_iters", type=int, default=5)
    p.add_argument("--w_adv", type=float, default=1.0)
    p.add_argument("--w_sync", type=float, default=0.05)
    p.add_argument("--w_mse", type=float, default=0.0)
    p.add_argument("--w_gp", type=float, default=10.0)
    p.add_argument("--evaluate_epoch", type=int, default=10)
    p.add_argument("--limit_hours", type=float, default=None)
    p.add_argument("--seed", type=int, default=19990319)
    p.add_argument("--music_encoder_impl", default="flax", choices=["flax", "pallas"],
                   help="frozen music-encoder path: flax f32 or fused bf16 kernels")
    p.add_argument("--sync_encoder_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="frozen SyncLoss ST-GCN compute dtype")
    p.add_argument("--sync_encoder_impl", default="flax",
                   choices=["flax", "pallas"],
                   help="frozen SyncLoss ST-GCN as fused whole-network "
                        "kernels (ops/pallas_stgcn.py)")
    return p


def main(argv=None) -> None:
    args = build_argparser().parse_args(argv)
    run_dir = os.path.join(args.checkpoints_dir, "M2SGAN", args.name)
    os.makedirs(run_dir, exist_ok=True)

    trainer = M2SGANTrainer(
        sample_length=args.sample_length, lr=args.lr, critic_iters=args.critic_iters,
        w_adv=args.w_adv, w_sync=args.w_sync, w_mse=args.w_mse, w_gp=args.w_gp,
        music_encoder_impl=args.music_encoder_impl,
        sync_encoder_dtype=args.sync_encoder_dtype,
        sync_encoder_impl=args.sync_encoder_impl,
    )
    rng = jax.random.PRNGKey(args.seed)

    transfer = {}
    if args.m2snet_ckpt:
        from ..train.checkpoints import restore_raw

        restored = restore_raw(args.m2snet_ckpt)
        params, stats = restored["params"], restored.get("batch_stats", {})
        transfer = dict(
            m2snet_music_params=params["music_encoder"],
            m2snet_music_stats=stats.get("music_encoder"),
            m2snet_motion_variables={
                "params": params["motion_encoder"],
                "batch_stats": stats.get("motion_encoder", {}),
            },
        )
    state = trainer.init_state(rng, **transfer)

    ds = ConductorMotionDataset(
        args.data_root, "train", sample_length=args.sample_length,
        mode="sequential", limit_hours=args.limit_hours,
    )
    loader = BatchIterator(ds, args.batch_size, seed=args.seed)
    ckpt = CheckpointManager(os.path.join(run_dir, "ckpt"))
    logger = MetricLogger(run_dir)

    it = 0
    for epoch in range(args.epochs):
        for mel, motion, _ in loader:
            state, metrics = trainer.train_step(state, (mel, motion), rng)
            it += 1
            logger.log(it, metrics, epoch=epoch)
        if epoch % args.evaluate_epoch == 0:
            # real-vs-generated trace plot, the reference's per-eval image
            # dump (`M2SGAN_eval.py:150-181` via `train_utils.plot_motion`)
            sample = next(iter(loader), None)
            if sample is not None:
                fake = trainer.generate(state, sample[0][:1], rng)
                logger.log_motion_plot(it, fake, sample[1][:1])
            ckpt.save(it, state, wait=True)
    ckpt.save(it, state, wait=True)
    logger.close()


if __name__ == "__main__":
    main()
