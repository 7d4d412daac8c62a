"""Viz pipeline + mel extraction tests."""

import os
import wave

import numpy as np
import pytest

from conductor_tpu.data import mel as M
from conductor_tpu.viz import (
    bandpass_motion,
    cm100_to_coco,
    coco_to_cm100,
    norm_motion,
    render_motion_video,
    smooth_motion,
)


def _sine_wav(path, freq=440.0, sr=22050, seconds=2.0):
    t = np.arange(int(sr * seconds)) / sr
    y = (0.5 * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(y.tobytes())
    return path


class TestMel:
    def test_filterbank_shape_and_support(self):
        fb = M.mel_filterbank(22050, 2048, 128)
        assert fb.shape == (128, 1025)
        assert (fb >= 0).all()
        # triangles: each filter has contiguous support, centers increase
        centers = fb.argmax(axis=1)
        assert (np.diff(centers) >= 0).all()

    def test_mel_scale_roundtrip(self):
        f = np.array([0.0, 200.0, 1000.0, 4000.0, 11025.0])
        np.testing.assert_allclose(M.mel_to_hz(M.hz_to_mel(f)), f, rtol=1e-6)

    def test_stft_frame_count(self):
        y = np.random.default_rng(0).standard_normal(22050).astype(np.float32)
        S = M.stft_power(y, 2048, 256)
        assert S.shape[0] == 1025
        assert abs(S.shape[1] - (1 + 22050 // 256)) <= 1

    def test_extract_mel_feature_shape_range(self, tmp_path):
        wav = _sine_wav(str(tmp_path / "a.wav"), seconds=2.0)
        mel = M.extract_mel_feature(wav)
        assert mel.shape == (180, 128)
        assert mel.min() >= 0.0 and mel.max() <= 1.0 + 1e-6

    def test_sine_peak_in_expected_band(self, tmp_path):
        # 440 Hz tone: after the freq flip, low frequencies are at HIGH index
        wav = _sine_wav(str(tmp_path / "b.wav"), freq=440.0)
        mel = M.extract_mel_feature(wav)
        peak_bin = mel.mean(axis=0).argmax()
        fb = M.mel_filterbank(22050, 2048, 128)
        freqs = np.linspace(0, 11025, 1025)
        center_hz = freqs[fb[127 - peak_bin].argmax()]  # unflip
        assert 300 < center_hz < 650

    def test_max_seconds_cap(self, tmp_path):
        wav = _sine_wav(str(tmp_path / "c.wav"), seconds=3.0)
        mel = M.extract_mel_feature(wav, max_seconds=1.0)
        assert mel.shape[0] == 90

    def test_waveform_input(self):
        y = np.random.default_rng(0).standard_normal(22050).astype(np.float32)
        mel = M.extract_mel_feature(y)
        assert mel.shape == (90, 128)

    def test_stereo_wav(self, tmp_path):
        sr = 22050
        t = np.arange(sr) / sr
        y = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
        stereo = np.stack([y, y], axis=1).reshape(-1)
        path = str(tmp_path / "st.wav")
        with wave.open(path, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(stereo.tobytes())
        loaded, got_sr = M.load_audio(path)
        assert got_sr == 22050 and loaded.ndim == 1


class TestViz:
    def _motion(self, T=120):
        rng = np.random.default_rng(0)
        t = np.arange(T)[:, None, None] / 30.0
        phase = rng.random((1, 13, 2)) * 2 * np.pi
        return (0.5 + 0.2 * np.sin(2 * np.pi * t + phase)).astype(np.float64)

    def test_smooth_reduces_jitter(self):
        m = self._motion() + np.random.default_rng(1).normal(0, 0.02, (120, 13, 2))
        sm = smooth_motion(m.copy())
        jitter = lambda x: np.abs(np.diff(x, axis=0)).mean()
        assert jitter(sm) < jitter(m)

    def test_norm_motion_properties(self):
        # realistic skeleton geometry: distinct joint bases, positive shoulder
        # width (x5 > x6), small sinusoidal sway — in pixel coordinates
        rng = np.random.default_rng(0)
        base = rng.random((1, 13, 2)) * 100 + 200
        base[0, 5, 0], base[0, 6, 0] = 380.0, 260.0  # shoulders
        base[0, 11], base[0, 12] = (340, 420), (300, 420)  # hips
        t = np.arange(120)[:, None, None] / 30.0
        m = base + 10 * np.sin(2 * np.pi * t)
        n = norm_motion(m.copy(), width=640, height=480)
        shoulder = np.mean(n[:, 5, 0] - n[:, 6, 0])
        np.testing.assert_allclose(shoulder, 0.2, atol=1e-6)
        hip_x = np.mean(n[:, 11, 0] + n[:, 12, 0]) / 2
        np.testing.assert_allclose(hip_x, 0.5, atol=1e-6)

    def test_keypoint_roundtrip(self):
        m = self._motion()
        np.testing.assert_array_equal(coco_to_cm100(cm100_to_coco(m)), m)

    def test_bandpass_keeps_conducting_band(self):
        T = 600
        t = np.arange(T)[:, None, None] / 30.0
        slow_drift = 0.3 * t / t.max()
        signal = 0.1 * np.sin(2 * np.pi * 2.0 * t)  # 2 Hz conducting motion
        m = (0.5 + signal + slow_drift) * np.ones((T, 13, 2))
        f = bandpass_motion(m)
        # drift removed: start/end means closer together
        drift_before = abs(m[-30:].mean() - m[:30].mean())
        drift_after = abs(f[-30:].mean() - f[:30].mean())
        assert drift_after < drift_before * 0.3

    def test_render_video(self, tmp_path):
        cv2 = pytest.importorskip("cv2")
        m = self._motion(T=10)
        video = render_motion_video([m], str(tmp_path), name="test", smooth_kernel=7)
        assert os.path.isfile(video)
        cap = cv2.VideoCapture(video)
        frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        cap.release()
        assert frames == 10


class TestImageLogging:
    """MetricLogger image surface (`M2SNet_eval.py:97-116`,
    `train_utils.py:104-150` equivalents)."""

    def test_feature_map_image(self):
        from conductor_tpu.utils.logging import feature_map_image

        img = feature_map_image(np.random.rand(1, 90, 64).astype(np.float32))
        assert img.shape == (64, 90, 3) and img.dtype == np.uint8

    def test_motion_plot_image(self):
        from conductor_tpu.utils.logging import motion_plot_image

        fake = np.random.rand(1, 60, 13, 2).astype(np.float32)
        real = np.random.rand(1, 60, 13, 2).astype(np.float32)
        img = motion_plot_image(fake, real)
        assert img.ndim == 3 and img.shape[-1] == 3 and img.dtype == np.uint8

    def test_logger_writes_pngs(self, tmp_path):
        from conductor_tpu.utils.logging import MetricLogger, feature_map_image

        logger = MetricLogger(str(tmp_path))
        logger.log_image(3, "test/map", feature_map_image(np.random.rand(30, 16)))
        logger.log_feature_maps(
            7,
            [np.random.rand(1, 30, 8) for _ in range(2)],
            [np.random.rand(1, 30, 8) for _ in range(3)],
        )
        logger.close()
        imgs = os.listdir(tmp_path / "images")
        assert any(f.startswith("test_map_") and f.endswith(".png") for f in imgs)
        assert any("Music_feature" in f for f in imgs)
