"""Canonical synthetic click-music clips for beat-tracker validation.

Shared by `tests/test_metrics.py::TestBeatTrackerGolden` (constructed-truth
checks of the Ellis-DP fallback in `conductor_tpu/eval/beat.py`) and
`tests/golden/make_librosa_golden.py` (records `librosa.beat.beat_track`
outputs on the SAME clips when run on a machine that has librosa — this
image does not).  Keep the synthesis rules and `GOLDEN_CLIPS` stable: the
committed fixture `tests/fixtures/librosa_beats.npz` is keyed to them.
"""

from __future__ import annotations

import numpy as np

SR = 22050

# (name, bpm, seconds, drift, seed) — the constant-tempo + drift cases from
# TestBeatTrackerGolden, frozen as the librosa-agreement corpus.
GOLDEN_CLIPS = (
    ("bpm70", 70, 12.0, 0.0, 0),
    ("bpm100", 100, 12.0, 0.0, 0),
    ("bpm140", 140, 12.0, 0.0, 0),
    ("drift100", 100, 12.0, 0.15, 3),
)


def click_music(bpm, seconds=12.0, drift=0.0, noise=0.02, seed=0):
    """Percussive clicks over a sustained chord bed; returns (audio float32,
    ground-truth beat times in seconds).  ``drift`` linearly scales the
    tempo over the clip."""
    rng = np.random.RandomState(seed)
    n = int(SR * seconds)
    t = np.arange(n) / SR
    audio = noise * rng.randn(n)
    for f in (220.0, 277.2, 329.6):
        audio += 0.05 * np.sin(2 * np.pi * f * t)
    beats = []
    bt = 0.15
    while bt < seconds - 0.1:
        beats.append(bt)
        period = 60.0 / (bpm * (1.0 + drift * bt / seconds))
        i0 = int(bt * SR)
        dur = int(0.03 * SR)
        env = np.exp(-np.linspace(0, 8, dur))
        audio[i0 : i0 + dur] += 0.9 * env * np.sin(2 * np.pi * 1200 * t[:dur])
        bt += period
    return audio.astype(np.float32), np.array(beats)


def golden_mels():
    """{name: (T90, 128) mel} for every clip in GOLDEN_CLIPS, through the
    real wav->mel pipeline (data/mel.py)."""
    from conductor_tpu.data.mel import extract_mel_feature

    return {
        name: extract_mel_feature(click_music(bpm, seconds, drift, seed=seed)[0],
                                  sr=SR)
        for name, bpm, seconds, drift, seed in GOLDEN_CLIPS
    }
