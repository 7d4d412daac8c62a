"""Prospective Cup kit: baselines, evaluator, chunked unseen-music generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conductor_tpu.prospective import (
    CNNLSTMGenerator,
    PlainGenerator,
    ProspectiveEvaluator,
    generate_long,
)


@pytest.fixture(scope="module")
def rng():
    return jax.random.PRNGKey(0)


class TestBaselines:
    def test_plain_zeros(self, rng):
        g = PlainGenerator()
        mel = jnp.ones((2, 270, 128))
        out = g.apply({}, mel)
        assert out.shape == (2, 90, 13, 2)
        assert float(jnp.abs(out).max()) == 0.0

    def test_cnn_lstm_shapes_and_range(self, rng):
        g = CNNLSTMGenerator()
        mel = jax.random.uniform(rng, (1, 270, 128))
        variables = g.init(rng, mel)
        out = g.apply(variables, mel)
        assert out.shape == (1, 90, 13, 2)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


class TestEvaluator:
    def test_plain_model_scores(self):
        # constant output: SDP must be exactly 0 %, MSE positive
        rs = np.random.RandomState(0)
        batches = [
            (rs.rand(2, 270, 128), rs.rand(2, 90, 13, 2).astype(np.float32))
            for _ in range(2)
        ]
        ev = ProspectiveEvaluator(lambda mel: np.zeros((mel.shape[0], 90, 13, 2)))
        res = ev.evaluate(batches)
        assert res.sdp == 0.0
        assert res.mse > 0
        assert np.isfinite(res.rde) and np.isfinite(res.sce)

    def test_perfect_model_scores(self):
        rs = np.random.RandomState(1)
        motion = rs.rand(1, 90, 13, 2).astype(np.float32)
        ev = ProspectiveEvaluator(lambda mel: motion)
        res = ev.evaluate([(rs.rand(1, 270, 128), motion)])
        assert res.mse == 0.0
        assert abs(res.sdp - 100.0) < 1e-6
        assert res.rde == pytest.approx(0.0, abs=1e-6)
        d = res.as_dict()
        assert set(d) == {"MSE", "RDE", "SCE", "SDP"}


class TestGenerateLong:
    def test_chunking_and_tail(self):
        calls = []

        def fake_gen(mel_batch):
            calls.append(mel_batch.shape[1])
            t90 = mel_batch.shape[1]
            return np.ones((1, t90 // 3, 13, 2))

        # 130 s of mel: one full 60-s chunk, one full 60-s chunk, 10-s tail
        mel = np.zeros((130 * 90, 128), np.float32)
        motion = generate_long(fake_gen, mel)
        assert calls == [5400, 5400, 900]
        assert motion.shape[0] == 130 * 30 + 1
        assert motion[: 130 * 30].min() == 1.0  # all covered

    def test_short_tail_skipped(self):
        def fake_gen(mel_batch):
            return np.ones((1, mel_batch.shape[1] // 3, 13, 2))

        # 63 s: 60-s chunk + 3-s tail (< 5 s) -> tail stays zeros
        mel = np.zeros((63 * 90, 128), np.float32)
        motion = generate_long(fake_gen, mel)
        assert motion[: 60 * 30].min() == 1.0
        assert motion[60 * 30 :].max() == 0.0
