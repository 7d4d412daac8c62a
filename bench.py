"""Headline benchmark: 60-s conducting-clip generation throughput.

Measures the reference's dominant inference cost (SURVEY.md §3.4): a full
1000-step DDIM ladder over the flagship MotionTransformer at T=1800 frames
(60 s at 30 Hz), conditioned on a 5400x128 mel — the exact workload of
`Diffusion_Stage/tools/visualization.py` / `eval_new_metrics.py`, where the
reference dispatches 1000 denoiser forwards from Python per clip.

Metric: motion frames generated per second per chip.
Baseline anchor (BASELINE.json north star): a 60-s clip in < 1 s on v5e-8
=> 1800 frames / (1 s x 8 chips) = 225 frames/s/chip.  vs_baseline is the
ratio of measured throughput to that target (>= 1.0 meets the north star).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

NORTH_STAR_FRAMES_PER_SEC_PER_CHIP = 225.0


def main() -> None:
    import dataclasses

    from conductor_tpu.config import Config
    from conductor_tpu.train.ddpm_trainer import DDPMTrainer

    cfg = Config()
    # Inference-optimized serving config: whole-layer fused Pallas kernels
    # (ops/pallas_layer.py) with bfloat16 MXU operands / f32 accumulation,
    # plus the int8 MXU path for the AdaLN projection (~68% of step FLOPs;
    # drift bound pinned in tests/test_fused_denoiser.py, quality deltas vs
    # the exact path recorded in docs/e2e_run/eval_test_serving.json);
    # params and schedule math stay f32.
    cfg = cfg.replace(
        denoiser=dataclasses.replace(
            cfg.denoiser,
            attention_impl="pallas",
            compute_dtype="bfloat16",
            layer_impl="pallas_fused",
            sampler_adaln_int8=True,
            music_encoder_impl="pallas",
        )
    )
    trainer = DDPMTrainer(cfg)
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng)

    n_chips = len(jax.devices())
    # 8 clips per chip: the eval-sweep serving shape (the reference's real
    # use of this workload is scoring whole test splits,
    # `eval_new_metrics.py:113-156`, and `cli.evaluate` batches waves the
    # same way).  Measured on v5e (int8 AdaLN path): 4/chip 13.1k, 8/chip
    # 13.6k, 16/chip 13.8k frames/s/chip — deeper matmuls amortize the
    # per-step serialized VPU chain, with diminishing returns past 8 (see
    # NOTES.md "Sampling MFU investigation"); 8 matches the
    # DiffusionEvaluator default wave.
    B = max(1, n_chips) * 8
    T90 = cfg.dataset.clip_seconds * cfg.dataset.mel_hz    # 5400
    T30 = cfg.dataset.clip_seconds * cfg.dataset.motion_hz  # 1800
    mel = jax.random.uniform(rng, (B, T90, cfg.dataset.mel_bins))

    generate = trainer.generate  # jitted + cached internally

    # compile
    out = generate(state, mel, rng)
    out.block_until_ready()
    assert out.shape == (B, T30, cfg.dataset.pose_dim)

    # NOTE: timing ends with a host readback of the result — on the
    # tunneled TPU backend `block_until_ready` alone can report before
    # device execution finishes (see .claude/skills/verify/SKILL.md).
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        out = generate(state, mel, jax.random.fold_in(rng, i))
        float(out[0, 0, 0])
        times.append(time.perf_counter() - t0)
    best = min(times)

    frames_per_sec_per_chip = (B * T30) / best / n_chips

    # MFU from the analytic per-step matmul count (utils/flops.py; int8
    # AdaLN priced at the int8 peak so quantization can't flatter the
    # number) — makes MXU-efficiency regressions visible independent of the
    # vs_baseline ratio (VERDICT r3 #8).
    from conductor_tpu.utils.flops import sampling_mfu

    mfu = sampling_mfu(
        cfg, B, T30, cfg.diffusion.steps, best, n_chips=n_chips
    )
    print(
        json.dumps(
            {
                "metric": "ddim1000_60s_clip_motion_frames_per_sec_per_chip",
                "value": round(frames_per_sec_per_chip, 2),
                "unit": "frames/s/chip",
                "vs_baseline": round(
                    frames_per_sec_per_chip / NORTH_STAR_FRAMES_PER_SEC_PER_CHIP, 4
                ),
                "achieved_tflops_per_chip": mfu["achieved_tflops"],
                "mfu_pct": mfu["mfu_pct"],
            }
        )
    )


if __name__ == "__main__":
    main()
