"""Headline evaluator: FGD / Diversity / Beat-Consistency / MSE / SE / MPE.

Rebuild of `Diffusion_Stage/tools/eval_new_metrics.py:94-390` (plus the
old-metric MSE/SE sweeps, `eval_old_metrics.py`, `eval_new.py`), with the
per-folder Python loop replaced by *batched on-device generation*: all test
clips are generated in sharded batches (the per-clip 1000-step DDIM ladder was
the reference's dominant eval cost, SURVEY.md §3.5), then features are
extracted in one batched ST-GCN pass; only beat tracking and the Fréchet
sqrtm stay on host.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..data import ConductorMotionDataset
from ..train.ddpm_trainer import DDPMTrainer, TrainState
from . import metrics as M


@dataclass
class EvalResult:
    fgd: float
    diversity: float
    feat_dist: float
    mse: float
    sync_error: float
    mpe: float
    sdp: float
    beat_consistency_real: float
    beat_consistency_generated: float

    def as_dict(self) -> dict:
        return self.__dict__.copy()


class DiffusionEvaluator:
    """Generate on the test split and score against ground truth.

    With ``mesh`` set, each generation wave is sharded over the mesh's
    ``data`` axis (batches padded to a multiple of the axis size), so a full
    test-split sweep at 1000 steps uses every chip — the reference generates
    clip-by-clip on one device (`eval_new_metrics.py:113-156`).
    """

    def __init__(self, trainer: DDPMTrainer, batch_size: int | None = None,
                 mesh=None):
        self.trainer = trainer
        self.mesh = mesh
        if mesh is not None:
            dp = mesh.devices.size
            if batch_size is None:
                # 8 clips per chip: measured serving sweet spot on v5e —
                # 13.1k (4/chip) -> 13.6k frames/s/chip, and +1% more at
                # 16/chip isn't worth doubling the wave latency (NOTES.md
                # "Sampling MFU investigation"; bench.py measures this shape)
                batch_size = dp * 8
            # every wave must fill the data axis evenly; round up
            batch_size = -(-batch_size // dp) * dp
        elif batch_size is None:
            batch_size = 8
        self.batch_size = batch_size
        # Metric extraction always runs f32, independent of the trainer's
        # sampler compute dtype: a bf16 feat model would emit bf16 latents,
        # and the numpy metric reductions downstream would then ACCUMULATE
        # in bf16 — partial sums saturate and FGD/diversity/SE/MPE collapse
        # silently (seen: diversity 23 -> 1.7 on identical motions).  The
        # restored feat weights are f32 either way.
        from ..models.stgcn import MotionEncoderSTGCN

        self._feat_model = MotionEncoderSTGCN()
        # jitted: eager ST-GCN dispatch is one host round-trip per op —
        # unusable over remote/tunneled devices.
        self._latents_fn = jax.jit(
            lambda fv, motion: self._feat_model.apply(
                fv, motion, method=self._feat_model.features
            )[-1].astype(jnp.float32)
        )

    def _latents(self, state: TrainState, motion: jnp.ndarray) -> np.ndarray:
        """Frozen stage-1 ST-GCN 64-d latents (`eval_new_metrics.py:143-150`)."""
        return np.asarray(self._latents_fn(state.feat_variables, motion))

    def _generate_wave(self, state, mel: np.ndarray, rng, num_steps):
        """One generation wave; under a mesh, pads the batch to the data-axis
        size and shards clips across devices (GSPMD partitions the jitted
        sampler along the batch)."""
        if self.mesh is None:
            return self.trainer.generate(
                state, jnp.asarray(mel), rng, num_steps=num_steps
            )
        from ..parallel import pad_to_multiple, shard_batch

        dp = self.mesh.devices.size
        mel_p, orig_len = pad_to_multiple(np.asarray(mel), dp)
        (mel_s,) = shard_batch((mel_p,), self.mesh)
        gen = self.trainer.generate(state, mel_s, rng, num_steps=num_steps)
        return gen[:orig_len]

    def evaluate(
        self,
        state: TrainState,
        dataset_root: str,
        *,
        split: str = "test",
        num_steps: int | None = None,
        max_clips: int | None = None,
        rng: jax.Array | None = None,
        compute_beats: bool = True,
    ) -> EvalResult:
        rng = jax.random.PRNGKey(0) if rng is None else rng
        spec = self.trainer.cfg.dataset
        ds = ConductorMotionDataset(
            dataset_root, split,
            sample_length=spec.clip_seconds, mode="sequential", spec=spec,
        )
        n = len(ds) if max_clips is None else min(max_clips, len(ds))

        real_list, gen_list = [], []
        real_lat, gen_lat = [], []
        bc_real, bc_gen = [], []

        from contextlib import nullcontext

        with self.mesh if self.mesh is not None else nullcontext():
            if self.mesh is not None:
                from ..parallel import replicate

                state = replicate(state, self.mesh)
            for i0 in range(0, n, self.batch_size):
                idxs = range(i0, min(i0 + self.batch_size, n))
                mel = np.stack([ds[i][0] for i in idxs])
                motion = np.stack([ds[i][1] for i in idxs])
                gen = self._generate_wave(state, mel, jax.random.fold_in(rng, i0), num_steps)
                B, T = gen.shape[0], gen.shape[1]
                gen = np.asarray(gen).reshape(B, T, spec.n_joints, spec.joint_dim)

                real_list.append(motion)
                gen_list.append(gen)
                real_lat.append(self._latents(state, jnp.asarray(motion)))
                gen_lat.append(self._latents(state, jnp.asarray(gen)))
                if compute_beats:
                    for b in range(B):
                        bc_real.append(M.beat_consistency(motion[b], mel[b]))
                        bc_gen.append(M.beat_consistency(gen[b], mel[b]))

        real = np.concatenate(real_list)
        gen = np.concatenate(gen_list)
        real_lat_flat = np.concatenate([x.reshape(-1, x.shape[-1]) for x in real_lat])
        gen_lat_flat = np.concatenate([x.reshape(-1, x.shape[-1]) for x in gen_lat])
        per_clip_gen_lat = [x.reshape(-1, x.shape[-1]) for g in gen_lat for x in g]

        return EvalResult(
            fgd=M.frechet_distance(gen_lat_flat, real_lat_flat),
            diversity=M.diversity_score(per_clip_gen_lat),
            feat_dist=M.feat_distance(real_lat_flat, gen_lat_flat),
            mse=M.motion_mse(real, gen),
            sync_error=M.sync_error(real_lat_flat, gen_lat_flat),
            mpe=M.mean_perceptual_error(real_lat_flat, gen_lat_flat),
            sdp=M.std_percentage(real, gen),
            beat_consistency_real=float(np.mean(bc_real)) if bc_real else float("nan"),
            beat_consistency_generated=float(np.mean(bc_gen)) if bc_gen else float("nan"),
        )
