"""Unseen-music test CLI: arbitrary-length audio -> conducting-motion videos.

Rebuild of reference `Contrastive_Stage/ProspectiveCup/test_unseen.py:39-99`:
scan a directory of music files, extract (and cache) mels, generate motion in
60-s chunks through the trained diffusion model (the reference kit drives its
stage-1 GAN; the chunking contract is identical), render skeleton videos, and
mux the audio back in.  Per-chunk generation is independent, so chunks of one
song batch across the device mesh.

    python -m conductor_tpu.cli.test_unseen --run_dir checkpoints/.../my_run \
        --music_dir test/test_samples [--steps 50]
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

from ..config import Config
from ..prospective.unseen import cached_mel, generate_long
from ..train import CheckpointManager, DDPMTrainer
from ..viz.motion import mux_audio, render_motion_video


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run_dir", required=True)
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step to load (reference --which_epoch); "
                   "default: latest")
    p.add_argument("--music_dir", required=True, help="directory of audio files")
    p.add_argument("--out_dir", default=None, help="default: <run_dir>/unseen")
    p.add_argument("--cache_dir", default=None, help="mel cache (default: <music_dir>/cache)")
    p.add_argument("--steps", type=int, default=None, help="DDIM respacing")
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None) -> None:
    args = build_argparser().parse_args(argv)
    cfg = Config.load(os.path.join(args.run_dir, "config.json"))
    trainer = DDPMTrainer(cfg)
    rng = jax.random.PRNGKey(args.seed)
    state = trainer.init_state(rng)
    state = CheckpointManager(os.path.join(args.run_dir, "ckpt")).restore(
        state, step=args.step
    )

    out_dir = args.out_dir or os.path.join(args.run_dir, "unseen")
    cache_dir = args.cache_dir or os.path.join(args.music_dir, "cache")
    names = sorted(
        f for f in os.listdir(args.music_dir)
        if os.path.isfile(os.path.join(args.music_dir, f)) and not f.startswith(".")
    )
    print(f"found {len(names)} test samples: {names}")

    def generate_fn(mel_batch):
        return np.asarray(
            trainer.generate(
                state, mel_batch, rng, num_steps=args.steps
            )
        )

    for i, name in enumerate(names):
        path = os.path.join(args.music_dir, name)
        print(f"[{i + 1}/{len(names)}] {name}")
        t0 = time.time()
        mel = cached_mel(path, cache_dir)
        print(f"  mel {mel.shape} in {time.time() - t0:.2f}s")
        t0 = time.time()
        motion = generate_long(generate_fn, mel)
        print(f"  motion generated in {time.time() - t0:.2f}s")
        video = render_motion_video(
            [motion], out_dir, name=os.path.splitext(name)[0]
        )
        final = mux_audio(video, path)
        print(f"  wrote {final}")
    print("test finished")


if __name__ == "__main__":
    main()
