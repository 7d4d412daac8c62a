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
    p.add_argument("--eval_batches", type=int, default=None,
                   help="cap the test batches per evaluation sweep "
                        "(default: the whole test split, like the reference)")
    p.add_argument("--no_eval_beats", action="store_true",
                   help="skip beat consistency in the periodic eval (host-side, slow)")
    p.add_argument("--limit_hours", type=float, default=None)
    p.add_argument("--test_limit_hours", type=float, default=None,
                   help="reference --testing_set_limit (hours of test data)")
    p.add_argument("--seed", type=int, default=19990319)
    p.add_argument("--continue", dest="is_continue", action="store_true",
                   help="resume from the run dir's latest checkpoint")
    p.add_argument("--train_music_encoder", action="store_true",
                   help="unfreeze the transferred music encoder "
                        "(reference --train_music_encoder, default frozen)")
    p.add_argument("--no_transfer_music_encoder", action="store_true",
                   help="keep the generator's random-init music encoder; the "
                        "M2SNet checkpoint still supplies the SyncLoss net "
                        "(reference --transfer_music_encoder False)")
    p.add_argument("--music_encoder_impl", default="auto",
                   choices=["auto", "flax", "pallas"],
                   help="frozen music-encoder path: flax f32 or fused bf16 "
                        "kernels; auto = pallas on TPU (flax with "
                        "--train_music_encoder)")
    p.add_argument("--music_conv_impl", default="auto",
                   choices=["auto", "lax", "pallas_train"],
                   help="music-encoder conv impl inside the generator: "
                        "pallas_train = packed trainable kernels; auto = "
                        "pallas_train on TPU when --train_music_encoder is "
                        "set, lax otherwise")
    p.add_argument("--compute_dtype", default="auto",
                   choices=["auto", "float32", "bfloat16"],
                   help="generator compute dtype; auto = bf16 on TPU when "
                        "--train_music_encoder is set (the f32 packed conv "
                        "temps at batch 55 x 30 s exceed v5e HBM), float32 "
                        "otherwise (reference-exact)")
    p.add_argument("--sync_encoder_dtype", default="auto",
                   choices=["auto", "float32", "bfloat16"],
                   help="frozen SyncLoss ST-GCN compute dtype; auto = bf16 "
                        "on TPU")
    p.add_argument("--sync_encoder_impl", default="auto",
                   choices=["auto", "flax", "pallas"],
                   help="frozen SyncLoss ST-GCN as fused whole-network "
                        "kernels (ops/pallas_stgcn.py); auto = pallas on TPU")
    p.add_argument("--faithful", action="store_true",
                   help="reference-exact preset: flax/lax f32 everywhere "
                        "(the default is the parity-pinned TPU-first fast "
                        "configuration)")
    p.add_argument("--cached_features", action="store_true",
                   help="precompute the FROZEN music encoder's features once "
                        "per dataset and train from the cache — bit-identical "
                        "numerics (everything trainable sits after the cache "
                        "boundary), removes the dominant per-step cost "
                        "(round-4 profile in NOTES.md); incompatible with "
                        "--train_music_encoder")
    p.add_argument("--cached_sync_latents", action="store_true",
                   help="precompute the frozen SyncLoss motion encoder's "
                        "latents of REAL motion once per dataset (per "
                        "training window) and read them from the cache — "
                        "the other data-deterministic frozen forward in the "
                        "generator step (round-4 NOTES profile: ~ half the "
                        "SyncLoss ST-GCN cost); fake-side latents and their "
                        "backward stay on-device")
    p.add_argument("--overwrite_cache", action="store_true",
                   help="recompute the on-disk feature/sync-latent caches "
                        "even if present; required when the run dir's caches "
                        "were written under different frozen weights or "
                        "settings (the sidecar metadata check refuses a "
                        "silent mismatch)")
    return p


def main(argv=None) -> None:
    args = build_argparser().parse_args(argv)
    if args.faithful:
        args.music_encoder_impl = "flax"
        args.music_conv_impl = "lax"
        args.compute_dtype = "float32"
        args.sync_encoder_dtype = "float32"
        args.sync_encoder_impl = "flax"
    run_dir = os.path.join(args.checkpoints_dir, "M2SGAN", args.name)
    os.makedirs(run_dir, exist_ok=True)

    trainer = M2SGANTrainer(
        sample_length=args.sample_length, lr=args.lr, critic_iters=args.critic_iters,
        w_adv=args.w_adv, w_sync=args.w_sync, w_mse=args.w_mse, w_gp=args.w_gp,
        music_encoder_impl=args.music_encoder_impl,
        sync_encoder_dtype=args.sync_encoder_dtype,
        sync_encoder_impl=args.sync_encoder_impl,
        train_music_encoder=args.train_music_encoder,
        music_conv_impl=args.music_conv_impl,
        compute_dtype=args.compute_dtype,
        cached_features=args.cached_features,
        cached_sync_latents=args.cached_sync_latents,
    )
    rng = jax.random.PRNGKey(args.seed)

    transfer = {}
    if args.m2snet_ckpt:
        from ..train.checkpoints import restore_raw

        restored = restore_raw(args.m2snet_ckpt)
        params, stats = restored["params"], restored.get("batch_stats", {})
        # the SyncLoss motion encoder always comes from the M2SNet ckpt; the
        # music-encoder transfer is separately togglable
        # (`M2SGAN_train.py:43-64`, --transfer_music_encoder)
        transfer = dict(
            m2snet_motion_variables={
                "params": params["motion_encoder"],
                "batch_stats": stats.get("motion_encoder", {}),
            },
        )
        if not args.no_transfer_music_encoder:
            transfer.update(
                m2snet_music_params=params["music_encoder"],
                m2snet_music_stats=stats.get("music_encoder"),
            )
    state = trainer.init_state(rng, **transfer)
    ckpt = CheckpointManager(os.path.join(run_dir, "ckpt"))
    if args.is_continue and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        trainer.reset_caches()  # frozen subtrees may differ from init
        print(f"resumed from step {int(state.step)}")

    if args.cached_features:
        from ..data.feature_cache import precompute_music_features, tree_fingerprint

        g_vars = {"params": state.g_params, "batch_stats": state.g_batch_stats}
        encode = jax.jit(lambda mel: trainer._music_features(g_vars, mel))
        # cache keyed to THIS stage's transferred encoder — a separate file
        # from stage-2's grafted-encoder cache on the same data root — and to
        # the exact frozen weights + encoder impl via the sidecar metadata
        # (a cache from a different --m2snet_ckpt / init seed has identical
        # shapes, so nothing downstream would error on a silent mismatch)
        n = precompute_music_features(
            encode, args.data_root, "train", filename="music_feat_m2sgan.npy",
            overwrite=args.overwrite_cache,
            meta={
                "fingerprint": tree_fingerprint({
                    "params": g_vars["params"]["music_encoder"],
                    "batch_stats": g_vars["batch_stats"]["music_encoder"],
                }),
                # the RESOLVED impl ("auto" maps per backend; pallas runs
                # bf16 kernels whose features differ from flax f32)
                "music_encoder_impl": trainer.music_encoder_impl,
            },
        )
        print(f"feature cache: {n} clips precomputed")
    if args.cached_sync_latents:
        from ..data.feature_cache import precompute_sync_latents, tree_fingerprint

        latent = jax.jit(trainer.sync_latent_fn(state.sync_variables))
        # keyed to THIS stage's (transferred) SyncLoss encoder + window grid
        n = precompute_sync_latents(
            latent, args.data_root, "train",
            sample_length=args.sample_length,
            filename="sync_latent_m2sgan.npy",
            overwrite=args.overwrite_cache,
            meta={
                "fingerprint": tree_fingerprint(state.sync_variables),
                "sample_length": args.sample_length,
                "sync_encoder_dtype": str(trainer.sync_encoder.dtype),
                "sync_encoder_impl": trainer.sync_encoder_impl,
            },
        )
        print(f"sync-latent cache: {n} clips precomputed")
    if args.cached_sync_latents:
        from ..data.feature_cache import GANCachedDataset

        ds = GANCachedDataset(
            args.data_root, "train", sample_length=args.sample_length,
            mode="sequential", limit_hours=args.limit_hours,
            feature_file="music_feat_m2sgan.npy" if args.cached_features else None,
            sync_latent_file="sync_latent_m2sgan.npy",
        )
    elif args.cached_features:
        from ..data.feature_cache import FeatureCachedDataset

        ds = FeatureCachedDataset(
            args.data_root, "train", sample_length=args.sample_length,
            mode="sequential", limit_hours=args.limit_hours,
            feature_file="music_feat_m2sgan.npy",
        )
    else:
        ds = ConductorMotionDataset(
            args.data_root, "train", sample_length=args.sample_length,
            mode="sequential", limit_hours=args.limit_hours,
        )
    loader = BatchIterator(ds, args.batch_size, seed=args.seed)
    test_ds = ConductorMotionDataset(
        args.data_root, "test", sample_length=args.sample_length,
        mode="sequential", limit_hours=args.test_limit_hours,
    )
    test_loader = BatchIterator(test_ds, args.batch_size, shuffle=False, seed=0)
    logger = MetricLogger(run_dir)

    # the reference's periodic full-suite evaluation
    # (`M2SGAN_train.py:128-141` -> `M2SGAN_eval.py:62-191`): realism +
    # consistency + FGD/Diversity/BC on the test split
    from ..eval.stage1 import M2SGANEvaluator
    from ..models.stgcn import MotionEncoderSTGCN

    feat_model = MotionEncoderSTGCN()
    latents_fn = jax.jit(
        lambda fv, motion: feat_model.apply(
            fv, motion, method=feat_model.features
        )[-1].astype("float32")
    )
    evaluator = M2SGANEvaluator(
        lambda mel, erng: trainer.generate(state, mel, erng),
        latents_fn=lambda motion: latents_fn(state.sync_variables, motion),
    )

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
        for batch in loader:
            # (cond, motion, sync_latents) under --cached_sync_latents;
            # otherwise (cond, motion[, m_len]) — m_len is a stage-2 concern
            step_batch = batch if args.cached_sync_latents else (batch[0], batch[1])
            state, metrics = trainer.train_step(state, step_batch, rng)
            it += 1
            logger.log(it, metrics, epoch=epoch)
        if epoch % args.evaluate_epoch == 0:
            scores = evaluator.evaluate(
                eval_batches(), seed=args.seed,
                with_beat=not args.no_eval_beats,
            )
            logger.log(it, scores, epoch=epoch)
            print(
                f"eval@{epoch}: "
                + " ".join(f"{k}={v:.5f}" for k, v in sorted(scores.items()))
            )
            # real-vs-generated trace plot, the reference's per-eval image
            # dump (`M2SGAN_eval.py:150-181` via `train_utils.plot_motion`)
            sample = next(iter(loader), None)
            if sample is not None:
                # under --cached_features the loader yields frozen-encoder
                # features, not mel — generate must take the decode path
                fake = trainer.generate(
                    state, sample[0][:1], rng,
                    from_features=args.cached_features,
                )
                logger.log_motion_plot(it, fake, sample[1][:1])
            ckpt.save(it, state, wait=True)
    ckpt.save(it, state, wait=True)
    logger.close()


if __name__ == "__main__":
    main()
