"""Unseen-music testing: arbitrary-length audio through a fixed-window model
(reference `ProspectiveCup/test_unseen.py:39-73`).

The models are built for <= 60-s windows (the denoiser's sequence embedding
caps T at 1800 frames, SURVEY.md §5.7), so longer music is chunked into 60-s
mel windows, each generated independently, and the motion concatenated —
replicating the reference's split loop (`test_unseen.py:50-63`) including its
quirks: tails are truncated to a whole mel second and tails shorter than 5 s
are skipped (left as zeros).
"""

from __future__ import annotations

import os

import numpy as np

from ..data.mel import extract_mel_feature


def cached_mel(music_path: str, cache_dir: str) -> np.ndarray:
    """Mel extraction with the kit's npy cache (`test_unseen.py:26-35`)."""
    os.makedirs(cache_dir, exist_ok=True)
    name = os.path.basename(music_path)
    cache = os.path.join(cache_dir, f"mel_{name}.npy")
    if os.path.exists(cache):
        return np.load(cache)
    mel = extract_mel_feature(music_path)
    np.save(cache, mel)
    return mel


def generate_long(
    generate_fn,
    mel: np.ndarray,
    *,
    chunk_seconds: int = 60,
    min_tail_seconds: int = 5,
    mel_hz: int = 90,
    motion_hz: int = 30,
    n_joints: int = 13,
    joint_dim: int = 2,
) -> np.ndarray:
    """mel (T90, 128) of any length -> motion (ceil(T90/3), 13, 2).

    ``generate_fn(mel (1, t90, 128)) -> motion (1, t90//3, ...)`` handles one
    window; windows are independent, so batch-sharding them across a device
    mesh is the natural multi-chip layout (the reference loops serially).
    """
    t90 = mel.shape[0]
    ratio = mel_hz // motion_hz
    chunk90 = chunk_seconds * mel_hz
    motion = np.zeros([t90 // ratio + 1, n_joints, joint_dim], np.float32)

    n_chunks = t90 // chunk90 + 1
    for split in range(n_chunks):
        if (split + 1) * chunk90 <= t90:
            mel_step = mel[split * chunk90 : (split + 1) * chunk90]
        else:
            end = t90 - t90 % mel_hz  # truncate to a whole second
            mel_step = mel[split * chunk90 : end]
            if end - split * chunk90 < min_tail_seconds * mel_hz:
                continue
        out = np.asarray(generate_fn(mel_step[None]))[0]
        if out.ndim == 2:  # (T, 26) -> (T, 13, 2)
            out = out.reshape(-1, n_joints, joint_dim)
        start30 = split * chunk_seconds * motion_hz
        motion[start30 : start30 + out.shape[0]] = out
    return motion
