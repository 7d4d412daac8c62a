"""Stage-1 evaluation harnesses (reference `M2SNet_eval.py:18-121` C9,
`M2SGAN_eval.py:29-456` C15).

`M2SNetEvaluator` sweeps sync accuracy + mean sync/non-sync probabilities at
all three pair difficulties over a test iterator; `M2SGANEvaluator` runs the
GAN metric suite — realism (per-frame SD, Wasserstein), consistency (MSE,
MPE, RDE, SCE), FGD on frozen ST-GCN latents, Diversity, and Beat
Consistency.  Both take batched iterators and jitted model fns; metric math
lives in `eval.metrics` (single source, unlike the reference's per-script
copies).
"""

from __future__ import annotations

from typing import Callable, Iterable

import jax
import numpy as np

from .metrics import (
    beat_consistency,
    diversity_score,
    frechet_distance,
    mean_perceptual_error,
    motion_mse,
    per_frame_std,
    rhythm_density_error,
    strength_contour_error,
    wasserstein_1d,
)


class M2SNetEvaluator:
    """Accuracy at easy/hard/super_hard over a test split
    (`M2SNet_eval.py:34-121`)."""

    def __init__(self, trainer, strategies=("easy", "hard", "super_hard")):
        self.trainer = trainer
        self.strategies = strategies

    def evaluate(
        self, state, batches: Iterable[tuple], seed: int = 0
    ) -> dict[str, dict[str, float]]:
        results: dict[str, dict[str, list[float]]] = {
            s: {} for s in self.strategies
        }
        batches = list(batches)
        for s in self.strategies:
            for i, batch in enumerate(batches):
                rng = jax.random.PRNGKey((seed, i).__hash__() & 0x7FFFFFFF)
                metrics = self.trainer.evaluate(state, batch, rng, s)
                for k, v in metrics.items():
                    results[s].setdefault(k, []).append(v)
        return {
            s: {k: float(np.mean(v)) for k, v in ms.items()}
            for s, ms in results.items()
        }


class M2SGANEvaluator:
    """The full stage-1 GAN metric suite (`M2SGAN_eval.py:62-456`).

    - ``generate_fn(mel, rng) -> motion (B, T30, 13, 2)``;
    - ``latents_fn(motion) -> (B, T30, 64)`` frozen ST-GCN features for
      FGD / Diversity / MPE (`M2SGAN_eval.py:195-280`);
    - ``mel_hz`` for beat tracking on the raw mel (BC,
      `M2SGAN_eval.py:310-394`).
    """

    def __init__(
        self,
        generate_fn: Callable,
        latents_fn: Callable | None = None,
        mel_hz: int = 90,
        motion_hz: int = 30,
    ):
        self.generate_fn = generate_fn
        self.latents_fn = latents_fn
        self.mel_hz = mel_hz
        self.motion_hz = motion_hz

    def evaluate(
        self, batches: Iterable[tuple], seed: int = 0, with_beat: bool = True
    ) -> dict[str, float]:
        sd_real, sd_fake, wdist = [], [], []
        mse, mpe, rde, sce = [], [], [], []
        real_lat, fake_lat, fake_clip_lat = [], [], []
        beat_scores = []
        for i, (mel, real) in enumerate(batches):
            mel = np.asarray(mel)
            real = np.asarray(real)
            rng = jax.random.PRNGKey((seed, i).__hash__() & 0x7FFFFFFF)
            # metric math must run f32: a bf16 generate_fn/latents_fn would
            # otherwise drive the numpy reductions below to accumulate in
            # bf16 (partial sums saturate; see eval/evaluator.py)
            fake = np.asarray(self.generate_fn(mel, rng), np.float32)
            if fake.ndim == 3:
                fake = fake.reshape(real.shape)

            # realism (`M2SGAN_eval.py:62-120`)
            sd_real.append(per_frame_std(real))
            sd_fake.append(per_frame_std(fake))
            wdist.append(wasserstein_1d(real, fake))

            # consistency (`M2SGAN_eval.py:121-194`)
            mse.append(motion_mse(real, fake))
            rde.append(rhythm_density_error(real, fake))
            sce.append(strength_contour_error(real, fake))

            if self.latents_fn is not None:
                rl = np.asarray(self.latents_fn(real), np.float32)
                fl = np.asarray(self.latents_fn(fake), np.float32)
                mpe.append(mean_perceptual_error(rl, fl))
                real_lat += list(rl.reshape(-1, rl.shape[-1]))
                fake_lat += list(fl.reshape(-1, fl.shape[-1]))
                # per-CLIP latent sequences for Diversity — the reference
                # shuffles whole clips, not frames (`M2SGAN_eval.py:292-308`)
                fake_clip_lat += [fl[b] for b in range(fl.shape[0])]

            if with_beat:
                for b in range(mel.shape[0]):
                    beat_scores.append(beat_consistency(fake[b], mel[b]))

        out = {
            "SD_real": float(np.mean(sd_real)),
            "SD_fake": float(np.mean(sd_fake)),
            "SDP": float(np.mean(sd_fake) / max(np.mean(sd_real), 1e-12) * 100),
            "wasserstein": float(np.mean(wdist)),
            "MSE": float(np.mean(mse)),
            "RDE": float(np.mean(rde)),
            "SCE": float(np.mean(sce)),
        }
        if mpe:
            out["MPE"] = float(np.mean(mpe))
            out["FGD"] = frechet_distance(
                np.stack(real_lat), np.stack(fake_lat)
            )
            out["Diversity"] = diversity_score(fake_clip_lat)
        if beat_scores:
            out["BC"] = float(np.mean(beat_scores))
        return out
