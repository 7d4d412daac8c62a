"""Stage-1 contrastive training CLI (M2SNet).

Rebuild of reference `Contrastive_Stage/M2SNet_train.py:119-180`: modes
easy / hard / super_hard / hard_test (the last trains on the *test* split to
produce the sync-error measuring network).  Epoch 0 always uses easy
negatives (`M2SNet_train.py:81-86`); periodic evaluation reports accuracy at
all three difficulties on the test split (`M2SNet_eval.py:34-121`).

    python -m conductor_tpu.cli.train_m2snet --data_root /data/cm100 --mode hard
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from ..data import BatchIterator, ConductorMotionDataset
from ..train import CheckpointManager, M2SNetTrainer
from ..utils import MetricLogger


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", required=True)
    p.add_argument("--mode", default="hard",
                   choices=["easy", "hard", "super_hard", "hard_test"])
    p.add_argument("--name", default=None)
    p.add_argument("--checkpoints_dir", default="./checkpoints")
    p.add_argument("--epochs", type=int, default=400)
    p.add_argument("--batch_size", type=int, default=10)
    p.add_argument("--sample_length", type=int, default=30)
    p.add_argument("--clip_length", type=int, default=10)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--evaluate_epoch", type=int, default=5)
    p.add_argument("--limit_hours", type=float, default=None)
    p.add_argument("--seed", type=int, default=19990319)
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="encoder compute dtype (bf16 = opt-in fast path)")
    p.add_argument("--share_encodes", action="store_true",
                   help="encode each music/motion once per step and fuse "
                        "pairs in latent space (2x fewer encodes; BN stats "
                        "see 2 updates/step instead of the reference's 4)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize encoder activations in the backward "
                        "pass (same math, ~1.3x FLOPs, lower peak HBM)")
    p.add_argument("--microbatch", type=int, default=1,
                   help="split each step into k grad-accumulation chunks "
                        "(exact full-batch gradients; BN batch stats per "
                        "chunk, like the reference's DataParallel per-GPU "
                        "BN).  With --remat this fits f32 batch 32 x 30 s "
                        "on one v5e chip, which otherwise OOMs on XLA's "
                        "lane-padded conv temps")
    return p


def main(argv=None) -> None:
    args = build_argparser().parse_args(argv)
    # hard_test trains on the test split with hard negatives
    # (`M2SNet_train.py:119-124`)
    train_split = "test" if args.mode == "hard_test" else "train"
    strategy = "hard" if args.mode == "hard_test" else args.mode

    name = args.name or f"M2SNet_{args.mode}"
    run_dir = os.path.join(args.checkpoints_dir, "M2SNet", name)
    os.makedirs(run_dir, exist_ok=True)

    trainer = M2SNetTrainer(
        sample_length=args.sample_length, clip_length=args.clip_length, lr=args.lr,
        compute_dtype=args.compute_dtype, share_encodes=args.share_encodes,
        remat=args.remat, microbatch=args.microbatch,
    )
    rng = jax.random.PRNGKey(args.seed)
    state = trainer.init_state(rng)
    ckpt = CheckpointManager(os.path.join(run_dir, "ckpt"))
    logger = MetricLogger(run_dir)

    train_ds = ConductorMotionDataset(
        args.data_root, train_split, sample_length=args.sample_length,
        mode="sequential", limit_hours=args.limit_hours,
    )
    test_ds = ConductorMotionDataset(
        args.data_root, "test", sample_length=args.sample_length, mode="sequential"
    )
    loader = BatchIterator(train_ds, args.batch_size, seed=args.seed)
    test_loader = BatchIterator(test_ds, args.batch_size, shuffle=False, seed=0)

    it = 0
    for epoch in range(args.epochs):
        # epoch 0 pre-trains with easy negatives (`M2SNet_train.py:81-86`)
        epoch_strategy = "easy" if epoch == 0 else strategy
        for mel, motion, _ in loader:
            state, metrics = trainer.train_step(state, (mel, motion), rng, epoch_strategy)
            it += 1
            logger.log(it, metrics, epoch=epoch)
        if epoch % args.evaluate_epoch == 0:
            evals = {}
            batch = next(iter(test_loader), None)
            if batch is not None:
                for s in ("easy", "hard", "super_hard"):
                    r = trainer.evaluate(state, (batch[0], batch[1]), rng, s)
                    evals[f"acc_{s}"] = r["accuracy"]
                print(f"eval@{epoch}: " + " ".join(f"{k}={v:.5f}" for k, v in evals.items()))
                # encoder feature-map images, the reference's per-eval
                # training-health dump (`M2SNet_eval.py:110-116`)
                mfeats, yfeats = trainer.model.apply(
                    {"params": state.params, "batch_stats": state.batch_stats},
                    np.asarray(batch[0][:1]), np.asarray(batch[1][:1]),
                    method=trainer.model.features,
                )
                logger.log_feature_maps(it, mfeats, yfeats)
            ckpt.save(it, state, wait=True)
    ckpt.save(it, state, wait=True)
    logger.close()


if __name__ == "__main__":
    main()
