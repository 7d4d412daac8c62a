"""Frozen music-encoder feature cache for stage-2 training.

The stage-2 denoiser consumes the stage-1 music encoder FROZEN
(`transformer.py:391-403`), yet the reference re-runs that CNN on the raw mel
inside every training step — on TPU that frozen forward dominates the step
(the full-resolution (T90, 128) conv stages are HBM-bound).  Since the
encoder is deterministic per clip, its (T30, 64) outputs can be precomputed
ONCE per dataset — 18x smaller than the mel they replace — and training reads
features directly.  Numerics are bit-identical: condition dropout and the
trainable `proj` happen after the cache boundary
(`MotionTransformer.cond_from_features`).
"""

from __future__ import annotations

import os

import jax
import numpy as np

from .dataset import ClipIndex, ConductorMotionDataset, scan_split

FEATURE_FILE = "music_feat.npy"


def precompute_music_features(
    encode_fn,
    root: str,
    split: str = "train",
    *,
    batch_size: int = 8,
    overwrite: bool = False,
    filename: str = FEATURE_FILE,
) -> int:
    """Run ``encode_fn(mel (B, T90, 128)) -> (B, T30, C)`` over every clip of
    a split, writing ``filename`` beside each `mel.npy`.  Returns the number
    of clips written.  Clips are batched by equal length.  ``filename``
    separates caches keyed to DIFFERENT frozen encoders sharing one data
    root (stage-2's grafted encoder vs the GAN stage's transferred one)."""
    clips = scan_split(root, split)
    todo = [
        c for c in clips
        if overwrite
        or not os.path.exists(os.path.join(os.path.dirname(c.mel_path), filename))
    ]
    by_len: dict[int, list[ClipIndex]] = {}
    for c in todo:
        by_len.setdefault(c.mel_frames, []).append(c)
    written = 0
    for frames, group in by_len.items():
        for i in range(0, len(group), batch_size):
            chunk = group[i : i + batch_size]
            mel = np.stack(
                [np.load(c.mel_path).astype(np.float32) for c in chunk]
            )
            feats = np.asarray(encode_fn(mel))
            for c, f in zip(chunk, feats):
                np.save(
                    os.path.join(os.path.dirname(c.mel_path), filename), f
                )
                written += 1
    return written


class FeatureCachedDataset(ConductorMotionDataset):
    """`ConductorMotionDataset` yielding (features (s*30, C), motion, m_len)
    windows from the cache instead of raw mel.  ``feature_file`` must match
    the ``filename`` the cache was precomputed under."""

    feature_file: str = FEATURE_FILE

    def __init__(self, *args, feature_file: str = FEATURE_FILE, **kwargs):
        super().__init__(*args, **kwargs)
        self.feature_file = feature_file

    def _load_window(self, clip: ClipIndex, start_sec: int):
        s = self.spec
        feat_path = os.path.join(os.path.dirname(clip.mel_path), self.feature_file)
        feats = np.load(feat_path, mmap_mode="r")
        mot = np.load(clip.motion_path, mmap_mode="r")
        f0, f1 = start_sec * s.motion_hz, (start_sec + self.sample_length) * s.motion_hz
        m_len = clip.motion_frames // s.motion_hz
        return (
            np.asarray(feats[f0:f1], dtype=np.float32),
            np.asarray(mot[f0:f1], dtype=np.float32),
            np.int32(m_len),
        )
