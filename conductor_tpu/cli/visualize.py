"""Inference + visualization CLI: audio -> mel -> motion -> skeleton video.

Rebuild of reference `Diffusion_Stage/tools/visualization.py:180-223`: load a
trained run, extract the first 60 s of a music file as a 90 fps mel,
generate the conducting motion with the scan-DDIM sampler (optionally
respaced — the reference always runs the full 1000 steps), Savitzky-Golay
smooth, render an OpenCV skeleton video, and mux the audio back in.

    python -m conductor_tpu.cli.visualize --run_dir checkpoints/ConductorMotion100/my_run \
        --music path/to/music.wav [--steps 50] [--guidance 1.0]
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from ..config import Config
from ..data.mel import extract_mel_feature
from ..train import CheckpointManager, DDPMTrainer
from ..viz.motion import mux_audio, render_motion_video


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run_dir", required=True, help="training run dir (contains config.json, ckpt/)")
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step to load (reference --which_epoch); "
                   "default: latest")
    p.add_argument("--music", required=True, help="audio file (wav natively; others need soundfile)")
    p.add_argument("--out_dir", default=None, help="default: <run_dir>/viz")
    p.add_argument("--steps", type=int, default=None, help="DDIM respacing (default: full ladder)")
    p.add_argument("--guidance", type=float, default=1.0)
    p.add_argument(
        "--max_seconds", type=float, default=60.0,
        help="truncate the audio (reference behavior: first 60 s only); "
        "0 = no cap: chunk the full track into 60-s windows "
        "(prospective.unseen.generate_long) and concatenate",
    )
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save_npy", action="store_true", help="also save the raw (T,13,2) motion")
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

    mel = extract_mel_feature(
        args.music, max_seconds=args.max_seconds if args.max_seconds > 0 else None
    )
    print(f"mel: {mel.shape} ({mel.shape[0] / 90:.1f} s)")

    if mel.shape[0] > cfg.dataset.clip_seconds * cfg.dataset.mel_hz:
        # longer than the model's learned sequence-embedding horizon:
        # generate 60-s windows independently and concatenate (the same
        # chunking contract as the reference's unseen-music kit)
        from ..prospective.unseen import generate_long

        motion = generate_long(
            lambda m: trainer.generate(
                state, m, rng, num_steps=args.steps,
                guidance_scale=args.guidance,
            ),
            mel,
            chunk_seconds=cfg.dataset.clip_seconds,
            mel_hz=cfg.dataset.mel_hz,
            motion_hz=cfg.dataset.motion_hz,
            n_joints=cfg.dataset.n_joints,
            joint_dim=cfg.dataset.joint_dim,
        )
    else:
        motion = trainer.generate(
            state, mel[None], rng, num_steps=args.steps, guidance_scale=args.guidance
        )
        motion = np.asarray(motion[0]).reshape(
            -1, cfg.dataset.n_joints, cfg.dataset.joint_dim
        )

    out_dir = args.out_dir or os.path.join(args.run_dir, "viz")
    name = os.path.splitext(os.path.basename(args.music))[0]
    if args.save_npy:
        os.makedirs(out_dir, exist_ok=True)
        np.save(os.path.join(out_dir, f"{name}.npy"), motion)
    video = render_motion_video([motion], out_dir, name=name)
    final = mux_audio(video, args.music)
    print(f"wrote {final}")


if __name__ == "__main__":
    main()
