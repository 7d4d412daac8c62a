"""Trace one hot training/sampling step and print its op breakdown.

    python scripts/profile_step.py m2snet|m2snet_lax|m2sgan|stage2|sample \
        [--steps 5] [--trace_dir /tmp/conductor_trace] [--by op|category|scope]

Builds the surface at its bench_suite shape (the README perf-table
configuration), warms the executable twice (tunnel upload), traces
``--steps`` chained steps with jax.profiler, then shells out to
`scripts/parse_xplane.py` for the table.  Run on the real TPU; the
breakdown drives the fuse-vs-roofline decisions recorded in NOTES.md.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp


def build_m2snet(impl: str):
    from conductor_tpu.train.m2snet_trainer import M2SNetTrainer

    rng = jax.random.PRNGKey(0)
    B = 10
    mel = jax.random.uniform(rng, (B, 30 * 90, 128))
    motion = jax.random.uniform(rng, (B, 30 * 30, 13, 2))
    trainer = M2SNetTrainer(
        sample_length=30, clip_length=10, compute_dtype="bfloat16",
        share_encodes=True, music_conv_impl=impl,
    )
    holder = {"state": trainer.init_state(rng)}

    def step():
        holder["state"], metrics = trainer.train_step(
            holder["state"], (mel, motion), rng, "hard"
        )
        return metrics["loss"]

    return step


def build_m2sgan(cached: bool = False):
    from conductor_tpu.train.m2sgan_trainer import M2SGANTrainer

    trainer = M2SGANTrainer(
        sample_length=30, music_encoder_impl="pallas",
        sync_encoder_dtype="bfloat16", sync_encoder_impl="pallas",
        cached_features=cached,
    )
    rng = jax.random.PRNGKey(0)
    B = 55
    mel = jax.random.uniform(rng, (B, 30 * 90, 128))
    motion = jax.random.uniform(rng, (B, 30 * 30, 13, 2))
    state = trainer.init_state(rng)
    if cached:
        g_vars = {"params": state.g_params, "batch_stats": state.g_batch_stats}
        cond = jax.jit(lambda m: trainer._music_features(g_vars, m))(mel)
    else:
        cond = mel
    holder = {"state": state}

    def step():
        holder["state"], metrics = trainer.train_step(
            holder["state"], (cond, motion), rng
        )
        return metrics["w_distance"]

    return step


def build_m2sgan_te():
    """Unfrozen-encoder GAN step (reference --train_music_encoder) at the
    reference batch, in the TPU "auto" configuration: bf16 generator +
    packed trainable conv kernels."""
    from conductor_tpu.train.m2sgan_trainer import M2SGANTrainer

    trainer = M2SGANTrainer(
        sample_length=30, train_music_encoder=True,
        sync_encoder_dtype="bfloat16", sync_encoder_impl="pallas",
        music_conv_impl="pallas_train", compute_dtype="bfloat16",
    )
    rng = jax.random.PRNGKey(0)
    B = 55
    mel = jax.random.uniform(rng, (B, 30 * 90, 128))
    motion = jax.random.uniform(rng, (B, 30 * 30, 13, 2))
    holder = {"state": trainer.init_state(rng)}

    def step():
        holder["state"], metrics = trainer.train_step(
            holder["state"], (mel, motion), rng
        )
        return metrics["w_distance"]

    return step


def build_stage2():
    import dataclasses

    from conductor_tpu.config import Config
    from conductor_tpu.train.ddpm_trainer import DDPMTrainer

    cfg = Config()
    cfg = cfg.replace(
        denoiser=dataclasses.replace(
            cfg.denoiser, attention_impl="pallas", compute_dtype="bfloat16",
            train_layer_impl="pallas_fused",
        ),
        train=dataclasses.replace(cfg.train, cached_features=True,
                                  feat_impl="pallas"),
    )
    trainer = DDPMTrainer(cfg)
    rng = jax.random.PRNGKey(0)
    B, S = 32, 30
    feats = jax.random.uniform(rng, (B, S * 30, 64))
    motion = jax.random.uniform(rng, (B, S * 30, 13, 2))
    m_lens = jnp.full((B,), 60, jnp.int32)
    holder = {"state": trainer.init_state(rng)}

    def step():
        holder["state"], metrics = trainer.train_step(
            holder["state"], (feats, motion, m_lens), rng
        )
        return metrics["loss"]

    return step


def build_sample(batch: int = 8, music_impl: str = "flax"):
    import dataclasses

    from conductor_tpu.config import Config
    from conductor_tpu.train.ddpm_trainer import DDPMTrainer

    cfg = Config()
    cfg = cfg.replace(
        denoiser=dataclasses.replace(
            cfg.denoiser, attention_impl="pallas", compute_dtype="bfloat16",
            layer_impl="pallas_fused", sampler_adaln_int8=True,
            music_encoder_impl=music_impl,
        )
    )
    trainer = DDPMTrainer(cfg)
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng)
    mel = jax.random.uniform(rng, (batch, 5400, cfg.dataset.mel_bins))

    def step():
        return trainer.generate(state, mel, rng, num_steps=50)

    return step


SURFACES = {
    "m2snet": lambda: build_m2snet("pallas_train"),
    "m2snet_lax": lambda: build_m2snet("lax"),
    "m2sgan": build_m2sgan,
    "m2sgan_cached": lambda: build_m2sgan(cached=True),
    "m2sgan_te": build_m2sgan_te,
    "stage2": build_stage2,
    "sample": build_sample,
    # the production single-clip serving call (VERDICT r4 #1): B=1, ddim50,
    # fused music encoder — the surface whose ~34 ms fixed overhead the
    # round-5 work decomposes
    "sample1_ddim50": lambda: build_sample(batch=1, music_impl="pallas"),
    "sample1_ddim50_flaxenc": lambda: build_sample(batch=1, music_impl="flax"),
}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("surface", choices=sorted(SURFACES))
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--trace_dir", default=None)
    ap.add_argument("--by", default="op", choices=("op", "category", "scope"))
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    trace_dir = args.trace_dir or f"/tmp/conductor_trace_{args.surface}"
    step = SURFACES[args.surface]()

    for _ in range(2):  # warm: compile + tunnel program upload
        out = step()
        float(jnp.asarray(out).reshape(-1)[0])

    from conductor_tpu.utils.profiling import trace

    with trace(trace_dir):
        for _ in range(args.steps):
            out = step()
        float(jnp.asarray(out).reshape(-1)[0])

    here = os.path.dirname(os.path.abspath(__file__))
    subprocess.run(
        [sys.executable, os.path.join(here, "parse_xplane.py"), trace_dir,
         "--by", args.by, "--top", str(args.top)],
        check=True,
    )
    print(f"\n(traced {args.steps} steps; divide ms by {args.steps} for "
          f"per-step cost; trace at {trace_dir})")


if __name__ == "__main__":
    main()
