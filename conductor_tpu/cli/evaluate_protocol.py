"""Replicated retrieval-protocol evaluation CLI.

Rebuild of reference `Diffusion_Stage/tools/evaluation.py:33-238`: the
MotionDiffuse protocol — R-precision, MatchingScore, FID, Diversity and
(optionally) MultiModality with per-replication means and 95 % confidence
intervals.  The reference harness only supports its t2m/kit text datasets
and raises for ConductorMotion (`datasets/evaluator.py:281-293`); here the
co-embedding space is the frozen stage-1 M2SNet (mean-pooled 64-d music and
motion latents, `eval.protocol.M2SNetCoEmbedding`), so the same protocol
runs on the conducting data.

    python -m conductor_tpu.cli.evaluate_protocol \
        --run_dir checkpoints/ConductorMotion100/my_run \
        --m2snet_ckpt checkpoints/M2SNet/M2SNet_hard/ckpt \
        --data_root /data/cm100 [--steps 50] [--replications 20]
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data import BatchIterator, ConductorMotionDataset
from ..eval.protocol import EvaluationProtocol, M2SNetCoEmbedding, ProtocolConfig
from ..train import CheckpointManager, DDPMTrainer


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run_dir", required=True)
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step to load (reference --which_epoch); "
                   "default: latest")
    p.add_argument("--m2snet_ckpt", required=True,
                   help="stage-1 M2SNet checkpoint dir (the co-embedding nets)")
    p.add_argument("--data_root", required=True)
    p.add_argument("--split", default="test")
    p.add_argument("--sample_length", type=int, default=60,
                   help="seconds per evaluated window")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_batches", type=int, default=None)
    p.add_argument("--steps", type=int, default=None,
                   help="DDIM respacing (default: full ladder)")
    p.add_argument("--replications", type=int, default=1,
                   help="protocol replications (reference default 20, "
                   "`evaluation.py:245`)")
    p.add_argument("--top_k", type=int, default=3)
    p.add_argument("--diversity_times", type=int, default=300)
    p.add_argument("--mm_samples", type=int, default=0,
                   help="conditions for MultiModality (0 = skip)")
    p.add_argument("--mm_repeats", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    return p


def make_generator(trainer, state, rng, *, num_steps, n_joints, joint_dim):
    """A fresh-noise `generate(cond)` closure for the protocol.

    Folds a per-call counter into the key so every batch of every
    replication draws independent DDIM noise — the reference regenerates
    samples per replication by rebuilding its motion loaders
    (`tools/evaluation.py:160-200`); a fixed key would make every
    replication identical and collapse the 95 % CIs to zero.
    """
    counter = {"i": 0}

    def generate(cond):
        key = jax.random.fold_in(rng, counter["i"])
        counter["i"] += 1
        out = np.asarray(
            trainer.generate(state, jnp.asarray(cond), key, num_steps=num_steps),
            np.float32,
        )
        return out.reshape(out.shape[0], -1, n_joints, joint_dim)

    return generate


def main(argv=None) -> None:
    args = build_argparser().parse_args(argv)
    cfg = Config.load(os.path.join(args.run_dir, "config.json"))
    trainer = DDPMTrainer(cfg)
    rng = jax.random.PRNGKey(args.seed)
    state = trainer.init_state(rng)
    state = CheckpointManager(os.path.join(args.run_dir, "ckpt")).restore(
        state, step=args.step
    )

    # frozen stage-1 co-embedding (embeddings always f32: the numpy metric
    # reductions downstream must not accumulate in bf16)
    from ..models.m2snet import M2SNet
    from ..train.checkpoints import restore_raw

    restored = restore_raw(args.m2snet_ckpt)
    m2s_vars = {
        "params": restored["params"],
        "batch_stats": restored.get("batch_stats", {}),
    }
    m2s = M2SNet()
    music_fn = jax.jit(
        lambda mel: m2s.apply(
            m2s_vars, mel, method=lambda m, x: m.music_encoder(x, False)
        ).astype(jnp.float32)
    )
    motion_fn = jax.jit(
        lambda mo: m2s.apply(
            m2s_vars, mo, method=lambda m, x: m.motion_encoder(x, False)
        ).astype(jnp.float32)
    )
    wrapper = M2SNetCoEmbedding(music_fn, motion_fn)

    ds = ConductorMotionDataset(
        args.data_root, args.split, sample_length=args.sample_length,
        mode="sequential",
    )
    loader = BatchIterator(ds, args.batch_size, shuffle=True, seed=args.seed)

    def batches_fn(rep: int = 0):
        # Reshuffle batch composition per replication: the reference's
        # ground-truth loader is an epoch-seeded shuffling DataLoader
        # re-iterated every replication (`tools/evaluation.py:160-200`,
        # `datasets/dataloader.py:33-37`), so the within-batch distance
        # matrices — hence ground-truth MatchingScore/R-precision — vary
        # across replications and carry a real CI.
        loader.epoch = rep
        for i, (mel, motion, _) in enumerate(loader):
            if args.max_batches is not None and i >= args.max_batches:
                return
            yield np.asarray(mel), np.asarray(motion)

    generate = make_generator(
        trainer, state, rng, num_steps=args.steps,
        n_joints=cfg.dataset.n_joints, joint_dim=cfg.dataset.joint_dim,
    )

    mm_generate = None
    mm_conds = None
    if args.mm_samples > 0:
        picker = np.random.default_rng(args.seed)
        all_mels = [mel for mel, _ in batches_fn()]
        pool = np.concatenate(all_mels, axis=0) if all_mels else np.zeros((0,))
        idx = picker.choice(
            len(pool), min(args.mm_samples, len(pool)), replace=False
        )
        mm_conds = [pool[i] for i in idx]

        def mm_generate(cond):
            reps = np.repeat(np.asarray(cond)[None], args.mm_repeats, axis=0)
            return generate(reps)  # (R, T30, J, D)

    protocol = EvaluationProtocol(
        wrapper,
        ProtocolConfig(
            top_k=args.top_k,
            diversity_times=args.diversity_times,
            mm_num_times=args.mm_repeats,
            replication_times=args.replications,
            seed=args.seed,
        ),
    )
    result = protocol.run(
        batches_fn, {"conductor_tpu": generate},
        mm_generate=mm_generate, mm_conds=mm_conds,
    )
    print(result.format_report())

    def jsonable(x):
        mean, conf = x
        return {"mean": np.asarray(mean).tolist(), "conf": np.asarray(conf).tolist()}

    report = {
        metric: {model: jsonable(v) for model, v in models.items()}
        for metric, models in result.summary().items()
    }
    out = os.path.join(args.run_dir, f"protocol_{args.split}.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
