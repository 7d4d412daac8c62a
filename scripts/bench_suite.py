"""Multi-surface benchmark suite: every hot loop, one JSON line each.

Complements the driver-facing `bench.py` (which measures only the headline
eval-sweep sampling shape) with the other production surfaces, so perf
regressions anywhere show up as a diffable artifact:

    python scripts/bench_suite.py [--out bench_suite.json] [--skip m2sgan]

Timing rules (see .claude/skills/verify/SKILL.md): every new executable is
warmed TWICE (the first execution over the tunneled TPU absorbs program
upload), every timed repetition ends with a host readback of a value that
depends on the result, and the best of 3 is reported.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def timed(fn, *, reps: int = 3) -> float:
    """Best-of-reps seconds for fn() -> array; double warmup + readback."""
    for _ in range(2):
        out = fn()
        float(jnp.asarray(out).reshape(-1)[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        float(jnp.asarray(out).reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def timed_steps(step_fn, *, k: int = 20, reps: int = 2) -> float:
    """Seconds per step for a CHAINED step function (each call consumes the
    previous call's state, so the k-step loop is one dependency chain on
    device) — one readback at the end, not per step: a per-step readback
    would add one host round-trip per step over the tunnel and dominate
    short steps."""
    for _ in range(2):
        out = step_fn()
        float(jnp.asarray(out).reshape(-1)[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(k):
            out = step_fn()
        float(jnp.asarray(out).reshape(-1)[0])
        best = min(best, (time.perf_counter() - t0) / k)
    return best


def serving_config():
    from conductor_tpu.config import Config

    cfg = Config()
    return cfg.replace(
        denoiser=dataclasses.replace(
            cfg.denoiser,
            attention_impl="pallas",
            compute_dtype="bfloat16",
            layer_impl="pallas_fused",
            sampler_adaln_int8=True,
            music_encoder_impl="pallas",
        )
    )


def bench_sampling(results: list[dict]) -> None:
    from conductor_tpu.train.ddpm_trainer import DDPMTrainer

    cfg = serving_config()
    trainer = DDPMTrainer(cfg)
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng)
    n_chips = len(jax.devices())
    T90 = cfg.dataset.clip_seconds * cfg.dataset.mel_hz
    T30 = cfg.dataset.clip_seconds * cfg.dataset.motion_hz

    for name, per_chip, steps in (
        ("sample_1clip_ddim1000", None, None),   # single-clip latency
        ("sample_wave8_ddim1000", 8, None),      # eval-sweep serving shape
        ("sample_1clip_ddim50", None, 50),       # respaced production path
        ("sample_wave8_ddim50", 8, 50),          # respaced batched serving
    ):
        B = 1 if per_chip is None else max(1, n_chips) * per_chip
        mel = jax.random.uniform(rng, (B, T90, cfg.dataset.mel_bins))
        sec = timed(lambda: trainer.generate(state, mel, rng, num_steps=steps))
        from conductor_tpu.utils.flops import sampling_mfu

        results.append({
            "surface": name,
            "seconds": round(sec, 4),
            "frames_per_sec_per_chip": round(B * T30 / sec / n_chips, 1),
            "batch": B,
            **sampling_mfu(cfg, B, T30, steps or cfg.diffusion.steps, sec,
                           n_chips=n_chips),
        })

    # Pipelined single-clip serving: K back-to-back ddim50 calls with a
    # forced data dependency (clip i+1's mel consumes a scalar of clip i's
    # motion, so calls cannot overlap and the final readback proves all K
    # finished).  Separates the per-clip cost a streaming server pays from
    # the blocking-latency number above, which on this image is dominated by
    # the tunneled host<->TPU round trip (~26 ms for a trivial jitted op —
    # see NOTES.md round-5 serving decomposition).
    K = 10
    mel = jax.random.uniform(rng, (1, T90, cfg.dataset.mel_bins))

    def chain():
        out = jnp.zeros((1, T30, cfg.denoiser.input_feats))
        for i in range(K):
            m = mel + 0.0 * out[0, 0, 0]
            out = trainer.generate(
                state, m, jax.random.fold_in(rng, i), num_steps=50
            )
        return out

    sec = timed(chain) / K
    from conductor_tpu.utils.flops import sampling_mfu

    results.append({
        "surface": "sample_1clip_ddim50_pipelined_x10",
        "seconds": round(sec, 5),
        "frames_per_sec_per_chip": round(T30 / sec / n_chips, 1),
        "batch": 1,
        **sampling_mfu(cfg, 1, T30, 50, sec, n_chips=n_chips),
    })


def bench_stage2_train(results: list[dict]) -> None:
    """Flagship training config from the README table: 30-s windows,
    cached stage-1 features, bf16 compute, fused whole-layer training
    kernels, fused frozen ST-GCN perceptual net — measured at B = 32 (the
    reference recipe's global batch, `Diffusion_Stage/README.md:100-109`)
    and at 64/128 for the MFU-vs-batch scaling record (VERDICT r4 #6)."""
    from conductor_tpu.config import Config
    from conductor_tpu.train.ddpm_trainer import DDPMTrainer

    cfg = Config()
    cfg = cfg.replace(
        denoiser=dataclasses.replace(
            cfg.denoiser,
            attention_impl="pallas",
            compute_dtype="bfloat16",
            train_layer_impl="pallas_fused",
        ),
        train=dataclasses.replace(
            cfg.train, cached_features=True, feat_impl="pallas"
        ),
    )
    trainer = DDPMTrainer(cfg)
    rng = jax.random.PRNGKey(0)
    from conductor_tpu.utils.flops import train_step_mfu

    S = 30
    for B in (32, 64, 128):
        state = trainer.init_state(rng)
        feats = jax.random.uniform(rng, (B, S * 30, 64))  # cached encoder output
        motion = jax.random.uniform(rng, (B, S * 30, 13, 2))
        m_lens = jnp.full((B,), 60, jnp.int32)

        holder = {"state": state}

        def step():
            holder["state"], metrics = trainer.train_step(
                holder["state"], (feats, motion, m_lens), rng
            )
            return metrics["loss"]

        sec = timed_steps(step)
        results.append({
            "surface": f"train_step_stage2_b{B}_cached_fused",
            "ms_per_step": round(sec * 1e3, 2),
            **train_step_mfu(cfg, B, S * 30, sec),
        })


def bench_m2snet(results: list[dict]) -> None:
    from conductor_tpu.train.m2snet_trainer import M2SNetTrainer

    rng = jax.random.PRNGKey(0)
    B = 10
    mel = jax.random.uniform(rng, (B, 30 * 90, 128))
    motion = jax.random.uniform(rng, (B, 30 * 30, 13, 2))

    for impl, tag in (("lax", ""), ("pallas_train", "_packed")):
        trainer = M2SNetTrainer(
            sample_length=30, clip_length=10,
            compute_dtype="bfloat16", share_encodes=True,
            music_conv_impl=impl,
        )
        state = trainer.init_state(rng)
        holder = {"state": state}

        def step():
            holder["state"], metrics = trainer.train_step(
                holder["state"], (mel, motion), rng, "hard"
            )
            return metrics["loss"]

        sec = timed_steps(step, k=10)
        results.append({
            "surface": f"m2snet_step_b10_hard_bf16_shared{tag}",
            "ms_per_step": round(sec * 1e3, 2),
        })


def bench_m2sgan(results: list[dict]) -> None:
    from conductor_tpu.train.m2sgan_trainer import M2SGANTrainer

    rng = jax.random.PRNGKey(0)
    B = 55  # reference batch (`M2SGAN_train.py:178`)
    mel = jax.random.uniform(rng, (B, 30 * 90, 128))
    motion = jax.random.uniform(rng, (B, 30 * 30, 13, 2))

    for cached, cached_sync, tag in (
        (False, False, ""),
        (True, False, "_cached"),
        (True, True, "_cached_sync"),
    ):
        trainer = M2SGANTrainer(
            sample_length=30, music_encoder_impl="pallas",
            sync_encoder_dtype="bfloat16", sync_encoder_impl="pallas",
            cached_features=cached, cached_sync_latents=cached_sync,
        )
        state = trainer.init_state(rng)
        if cached:  # precomputed frozen-encoder features replace the mel
            g_vars = {"params": state.g_params,
                      "batch_stats": state.g_batch_stats}
            cond = jax.jit(lambda m: trainer._music_features(g_vars, m))(mel)
        else:
            cond = mel
        batch = (cond, motion)
        if cached_sync:  # precomputed real-motion SyncLoss latents (f32 cache)
            lat = jax.jit(trainer.sync_latent_fn(state.sync_variables))(motion)
            batch = (cond, motion, lat.astype(jnp.float32))
        holder = {"state": state}

        def step():
            holder["state"], metrics = trainer.train_step(
                holder["state"], batch, rng
            )
            return metrics["w_distance"]

        sec = timed_steps(step, k=10)
        results.append({
            "surface": f"m2sgan_step_b55_fused{tag}",
            "ms_per_step": round(sec * 1e3, 2),
        })

    # the UNFROZEN-encoder configuration (reference --train_music_encoder):
    # generator updates reach the transferred music encoder, so the frozen
    # fast paths don't apply — the packed trainable conv kernels
    # (ops/conv_train.py, post-round-4 d(kernel) + halo-split pool backward)
    # carry the encoder fwd+bwd instead (VERDICT r4 #3)
    trainer = M2SGANTrainer(
        sample_length=30, train_music_encoder=True,
        music_conv_impl="pallas_train",
        sync_encoder_dtype="bfloat16", sync_encoder_impl="pallas",
    )
    state = trainer.init_state(rng)
    holder = {"state": state}

    def step_te():
        holder["state"], metrics = trainer.train_step(
            holder["state"], (mel, motion), rng
        )
        return metrics["w_distance"]

    sec = timed_steps(step_te, k=10)
    results.append({
        "surface": "m2sgan_step_b55_train_encoder_packed",
        "ms_per_step": round(sec * 1e3, 2),
    })


SURFACES = {
    "sampling": bench_sampling,
    "stage2_train": bench_stage2_train,
    "m2snet": bench_m2snet,
    "m2sgan": bench_m2sgan,
}


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default=None, help="also write results to this JSON file")
    p.add_argument("--skip", nargs="*", default=[], choices=sorted(SURFACES))
    p.add_argument("--only", nargs="*", default=None, choices=sorted(SURFACES))
    args = p.parse_args()

    results: list[dict] = []
    for name, fn in SURFACES.items():
        if name in args.skip or (args.only and name not in args.only):
            continue
        start = len(results)
        fn(results)
        for r in results[start:]:
            print(json.dumps(r))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(
                {"device": str(jax.devices()[0]), "results": results}, f, indent=2
            )


if __name__ == "__main__":
    main()
