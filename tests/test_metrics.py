"""Golden-value tests for the evaluation metrics (SURVEY.md §4: the reference
has no metric tests; fixed-array goldens are our regression oracle)."""

import numpy as np
import pytest

from conductor_tpu.eval import beat, metrics as M


class TestFrechet:
    def test_identical_is_zero(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(500, 8))
        assert abs(M.frechet_distance(x, x.copy())) < 1e-6

    def test_mean_shift_golden(self):
        # Equal (near-identity) covariances, mean shift d => FGD ~ ||d||^2
        rng = np.random.default_rng(0)
        a = rng.normal(size=(20000, 4))
        b = rng.normal(size=(20000, 4)) + np.array([1.0, 0, 0, 0])
        fgd = M.frechet_distance(a, b)
        assert abs(fgd - 1.0) < 0.05

    def test_variance_mismatch(self):
        # N(0,1) vs N(0,4) per dim: FGD = sum (sigma1 - sigma2)^2 = D*(1-2)^2
        rng = np.random.default_rng(1)
        a = rng.normal(size=(50000, 3))
        b = rng.normal(size=(50000, 3)) * 2.0
        fgd = M.frechet_distance(a, b)
        assert abs(fgd - 3.0) < 0.1


class TestDiversity:
    def test_identical_latents_zero(self):
        x = np.ones((10, 64))
        lat = [x.copy() for _ in range(5)]
        assert M.diversity_score(lat) == 0.0

    def test_distinct_latents_positive(self):
        rng = np.random.default_rng(0)
        lat = [rng.normal(size=(10, 64)) for _ in range(8)]
        assert M.diversity_score(lat) > 0.0


class TestBeat:
    def test_motion_peaks_on_sinusoid(self):
        # sinusoidal joint motion has velocity-envelope minima twice per cycle
        t = np.arange(300) / 30.0
        motion = np.zeros((300, 13, 2), np.float32)
        motion[:, :, 0] = 0.5 + 0.2 * np.sin(2 * np.pi * 1.0 * t)[:, None]
        peaks = M.motion_peak_onehot(motion)
        # ~2 velocity minima per second over 10 s => ~20 peaks (edges excluded)
        assert 10 <= peaks.sum() <= 25

    def test_alignment_perfect(self):
        beats = np.zeros(100)
        beats[::10] = 1
        assert M.alignment_score(beats, beats.astype(bool)) == pytest.approx(1.0)

    def test_alignment_offset_scores_gaussian(self):
        music = np.zeros(100)
        music[::10] = 1
        motion = np.zeros(100, dtype=bool)
        motion[3::10] = True  # constant 3-frame offset
        s = M.alignment_score(music, motion, sigma=3.0)
        assert s == pytest.approx(np.exp(-9 / 18), rel=1e-3)

    def test_no_motion_beats_zero(self):
        music = np.zeros(100)
        music[::10] = 1
        assert M.alignment_score(music, np.zeros(100, dtype=bool)) == 0.0

    def test_dp_beat_tracker_on_metronome(self):
        # synthetic onset envelope with clear 0.5-s periodicity at 90 fps
        fps = 90
        env = np.zeros(900)
        env[::45] = 1.0
        env += 0.01 * np.random.default_rng(0).random(900)
        beats = beat.beat_track(env, fps=fps)
        assert len(beats) >= 15
        intervals = np.diff(beats)
        # median interval within one frame of the true 45-frame period
        assert abs(np.median(intervals) - 45) <= 2

    def test_mel_to_beats_onehot(self):
        # periodic broadband pulses in the mel => beats at the pulse rate
        rng = np.random.default_rng(0)
        mel = 0.02 * rng.random((900, 128)).astype(np.float32)
        mel[::45] += 0.9
        onehot = beat.music_beats_from_mel(mel)
        assert onehot.shape == (900,)
        idx = np.where(onehot)[0]
        assert len(idx) >= 10
        assert abs(np.median(np.diff(idx)) - 45) <= 3


class TestSignalMetrics:
    def _motion(self, freq, seed=0, T=900):
        rng = np.random.default_rng(seed)
        t = np.arange(T)[:, None, None] / 30.0
        phase = rng.random((1, 13, 2)) * 2 * np.pi
        return (0.5 + 0.2 * np.sin(2 * np.pi * freq * t + phase)).astype(np.float32)

    def test_sce_zero_for_identical(self):
        m = self._motion(1.0)[None]
        assert M.strength_contour_error(m, m.copy()) == pytest.approx(0.0, abs=1e-6)

    def test_sce_positive_for_different_amplitude(self):
        a = self._motion(1.0)[None]
        assert M.strength_contour_error(a, a * 2.0) > 0.1

    def test_rde_zero_for_identical(self):
        m = self._motion(2.0)[None]
        assert M.rhythm_density_error(m, m.copy()) == pytest.approx(0.0, abs=1e-6)

    def test_rde_detects_rhythm_change(self):
        a = self._motion(1.0)[None]
        b = self._motion(4.0)[None]
        assert M.rhythm_density_error(a, b) > M.rhythm_density_error(a, a.copy())

    def test_sdp_constant_output_zero(self):
        real = self._motion(1.0)[None]
        fake = np.full_like(real, 0.5)
        assert M.std_percentage(real, fake) == pytest.approx(0.0, abs=1e-6)
        assert M.std_percentage(real, real.copy()) == pytest.approx(100.0)

    def test_mse_and_latent_metrics(self):
        rng = np.random.default_rng(0)
        a = rng.normal(size=(2, 64)).astype(np.float32)
        b = a + 1.0
        assert M.sync_error(a, b) == pytest.approx(1.0)
        assert M.mean_perceptual_error(a, b) == pytest.approx(1.0)
        assert M.motion_mse(a, b) == pytest.approx(1.0)

    def test_wasserstein_and_std(self):
        rng = np.random.default_rng(0)
        a = rng.normal(size=(1, 900, 13, 2))
        assert M.wasserstein_1d(a, a + 0.0) == pytest.approx(0.0, abs=1e-9)
        assert M.wasserstein_1d(a, a + 1.0) == pytest.approx(1.0, rel=1e-3)
        assert M.per_frame_std(np.ones((1, 10, 13, 2))) == 0.0
