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
    p.add_argument("--eval_batches", type=int, default=None,
                   help="cap the test batches per evaluation sweep "
                        "(default: the whole test split, like the reference)")
    p.add_argument("--limit_hours", type=float, default=None)
    p.add_argument("--test_limit_hours", type=float, default=None,
                   help="reference --testing_set_limit (hours of test data)")
    p.add_argument("--seed", type=int, default=19990319)
    p.add_argument("--continue", dest="is_continue", action="store_true",
                   help="resume from the run dir's latest checkpoint "
                        "(reference --M2SNet ckpt path)")
    p.add_argument("--music_conv_impl", default="auto",
                   choices=["auto", "lax", "pallas_train"],
                   help="music-encoder conv-stage impl: lax (XLA convs) or "
                        "pallas_train (packed trainable kernels, NOTES.md "
                        "'M2SNet encoder profile'); auto = pallas_train on TPU")
    p.add_argument("--compute_dtype", default="auto",
                   choices=["auto", "float32", "bfloat16"],
                   help="encoder compute dtype; auto = bf16 on TPU, f32 "
                        "elsewhere")
    p.add_argument("--faithful", action="store_true",
                   help="reference-exact preset: lax convs + f32 on any "
                        "backend (the default is the parity-pinned TPU-first "
                        "fast configuration)")
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

    if args.faithful:
        args.compute_dtype, args.music_conv_impl = "float32", "lax"
    trainer = M2SNetTrainer(
        sample_length=args.sample_length, clip_length=args.clip_length, lr=args.lr,
        compute_dtype=args.compute_dtype, share_encodes=args.share_encodes,
        remat=args.remat, microbatch=args.microbatch,
        music_conv_impl=args.music_conv_impl,
    )
    rng = jax.random.PRNGKey(args.seed)
    state = trainer.init_state(rng)
    ckpt = CheckpointManager(os.path.join(run_dir, "ckpt"))
    if args.is_continue and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        print(f"resumed from step {int(state.step)}")
    logger = MetricLogger(run_dir)

    train_ds = ConductorMotionDataset(
        args.data_root, train_split, sample_length=args.sample_length,
        mode="sequential", limit_hours=args.limit_hours,
    )
    test_ds = ConductorMotionDataset(
        args.data_root, "test", sample_length=args.sample_length,
        mode="sequential", limit_hours=args.test_limit_hours,
    )
    loader = BatchIterator(train_ds, args.batch_size, seed=args.seed)
    test_loader = BatchIterator(test_ds, args.batch_size, shuffle=False, seed=0)

    # 3-difficulty sweep over the test split, the reference's per-eval
    # protocol (`M2SNet_eval.py:34-121`)
    from ..eval.stage1 import M2SNetEvaluator

    evaluator = M2SNetEvaluator(trainer)

    def eval_batches():
        for i, (mel, motion, _) in enumerate(test_loader):
            if args.eval_batches is not None and i >= args.eval_batches:
                return
            yield mel, motion

    if len(loader) == 0:
        raise SystemExit(
            f"no training batches: batch_size={args.batch_size} exceeds the "
            "dataset length. Lower --batch_size or add data."
        )
    it = int(state.step)
    for epoch in range(args.epochs):
        # epoch 0 pre-trains with easy negatives (`M2SNet_train.py:81-86`)
        epoch_strategy = "easy" if epoch == 0 else strategy
        for mel, motion, _ in loader:
            state, metrics = trainer.train_step(state, (mel, motion), rng, epoch_strategy)
            it += 1
            logger.log(it, metrics, epoch=epoch)
        if epoch % args.evaluate_epoch == 0:
            results = evaluator.evaluate(state, eval_batches(), seed=args.seed)
            evals = {
                f"{k}_{s}": v
                for s, ms in results.items() for k, v in ms.items()
            }
            if evals:
                logger.log(it, evals, epoch=epoch)
                acc = " ".join(
                    f"acc_{s}={ms['accuracy']:.5f}" for s, ms in results.items()
                )
                print(f"eval@{epoch}: {acc}")
            # encoder feature-map images, the reference's per-eval
            # training-health dump (`M2SNet_eval.py:110-116`)
            batch = next(iter(test_loader), None)
            if batch is not None:
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
