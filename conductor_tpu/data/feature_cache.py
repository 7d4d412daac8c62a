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

import hashlib
import json
import os

import jax
import numpy as np

from .dataset import ClipIndex, ConductorMotionDataset, scan_split

FEATURE_FILE = "music_feat.npy"


def tree_fingerprint(tree) -> str:
    """Stable content hash of a variable pytree (structure + leaf bytes).
    Used to key on-disk feature caches to the exact frozen weights that
    produced them — two runs with different checkpoints/init seeds yield
    same-shaped caches, so a shape check cannot catch a mismatch."""
    h = hashlib.sha256()
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    h.update(repr(treedef).encode())
    for leaf in leaves:
        arr = np.asarray(leaf)
        h.update(str(arr.shape).encode())
        h.update(str(arr.dtype).encode())
        h.update(np.ascontiguousarray(arr).tobytes())
    return h.hexdigest()[:32]


def _meta_path(root: str, split: str, filename: str) -> str:
    return os.path.join(root, split, f".{filename}.meta.json")


def _resolve_meta(
    root: str, split: str, filename: str, meta: dict | None,
    overwrite: bool, clips: list[ClipIndex], cache_dir_of,
) -> bool:
    """Validate the cache's sidecar metadata against ``meta``; returns the
    effective ``overwrite``.  Rules:

    - ``meta=None``: provenance checking disabled (library callers that
      manage keying themselves); behave as before.
    - sidecar present and equal to ``meta``: reuse (fill missing files only).
    - sidecar present but different, or absent while cache files exist
      (pre-sidecar or foreign cache): raise unless ``overwrite`` — a silent
      reuse would train against latents computed under the wrong frozen
      weights (same shapes, no error anywhere downstream).

    The sidecar is written up front, so a run interrupted mid-precompute
    resumes (matching meta -> fill missing) instead of erroring."""
    if meta is None:
        return overwrite
    mp = _meta_path(root, split, filename)
    if not overwrite:
        if os.path.exists(mp):
            with open(mp) as f:
                old = json.load(f)
            if old != meta:
                diff = {
                    k: (old.get(k), meta.get(k))
                    for k in set(old) | set(meta)
                    if old.get(k) != meta.get(k)
                }
                raise ValueError(
                    f"feature cache '{filename}' under {root}/{split} was "
                    f"precomputed with different settings {diff}; pass "
                    "overwrite=True (CLI: --overwrite_cache) to recompute"
                )
        elif any(
            os.path.exists(os.path.join(cache_dir_of(c), filename))
            for c in clips
        ):
            raise ValueError(
                f"feature cache '{filename}' under {root}/{split} has no "
                "provenance sidecar (predates cache keying, or was written "
                "by another tool); pass overwrite=True (CLI: "
                "--overwrite_cache) to recompute it under the current "
                "frozen weights"
            )
    with open(mp, "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)
    return overwrite


def precompute_music_features(
    encode_fn,
    root: str,
    split: str = "train",
    *,
    batch_size: int = 8,
    overwrite: bool = False,
    filename: str = FEATURE_FILE,
    meta: dict | None = None,
) -> int:
    """Run ``encode_fn(mel (B, T90, 128)) -> (B, T30, C)`` over every clip of
    a split, writing ``filename`` beside each `mel.npy`.  Returns the number
    of clips written.  Clips are batched by equal length.  ``filename``
    separates caches keyed to DIFFERENT frozen encoders sharing one data
    root (stage-2's grafted encoder vs the GAN stage's transferred one);
    ``meta`` (include `tree_fingerprint` of the frozen encoder) is validated
    against the split's sidecar so a cache computed under other weights is
    never silently reused."""
    clips = scan_split(root, split)
    overwrite = _resolve_meta(
        root, split, filename, meta, overwrite, clips,
        lambda c: os.path.dirname(c.mel_path),
    )
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


SYNC_LATENT_FILE = "sync_latent.npy"


def precompute_sync_latents(
    latent_fn,
    root: str,
    split: str = "train",
    *,
    sample_length: int,
    batch_size: int = 8,
    overwrite: bool = False,
    filename: str = SYNC_LATENT_FILE,
    motion_hz: int = 30,
    meta: dict | None = None,
) -> int:
    """Run ``latent_fn(motion (B, S*30, 13, 2)) -> (B, S*30, C)`` — the
    frozen SyncLoss motion encoder — over every sequential
    ``sample_length``-second window of every clip, writing a
    ``(n_windows, S*30, C)`` f32 array beside each `motion.npy`.

    Cached PER WINDOW rather than encoded once per clip and sliced: the
    ST-GCN's temporal convolutions have a receptive field, so latents of a
    window differ from a window of full-clip latents near the borders; the
    cache must match exactly what the uncached training step computes on
    the windowed batch.  Stored f32 regardless of the encoder's compute
    dtype (numpy cannot serialize bfloat16); a bf16 value round-trips
    bf16 -> f32 -> bf16 exactly, so the consumer's cast back preserves
    bit-parity with the uncached path.

    ``meta`` (include `tree_fingerprint` of the frozen encoder plus
    sample_length/dtype) is validated against the split's sidecar so a cache
    computed under other weights or another window grid is never silently
    reused."""
    clips = scan_split(root, split)
    overwrite = _resolve_meta(
        root, split, filename, meta, overwrite, clips,
        lambda c: os.path.dirname(c.motion_path),
    )
    todo = [
        c for c in clips
        if overwrite
        or not os.path.exists(
            os.path.join(os.path.dirname(c.motion_path), filename)
        )
    ]
    hz = motion_hz
    written = 0
    for c in todo:
        n_windows = c.motion_frames // (sample_length * hz)
        if n_windows == 0:
            continue
        mot = np.load(c.motion_path, mmap_mode="r")
        wins = np.stack([
            np.asarray(
                mot[w * sample_length * hz : (w + 1) * sample_length * hz],
                dtype=np.float32,
            )
            for w in range(n_windows)
        ])
        lats = []
        for i in range(0, n_windows, batch_size):
            lats.append(
                np.asarray(latent_fn(wins[i : i + batch_size]), dtype=np.float32)
            )
        np.save(
            os.path.join(os.path.dirname(c.motion_path), filename),
            np.concatenate(lats, axis=0),
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


class GANCachedDataset(ConductorMotionDataset):
    """The M2SGAN trainer's cached-batch view: yields
    ``(cond, motion[, sync_latents])`` sequential windows, where ``cond`` is
    the precomputed frozen music-encoder features (``feature_file`` set) or
    the raw mel (``feature_file=None``), and ``sync_latents`` is the
    per-window frozen SyncLoss latent cache (``sync_latent_file`` set;
    written by `precompute_sync_latents`).  Sequential mode only — the
    sync-latent cache is indexed by the fixed window grid."""

    def __init__(
        self,
        *args,
        feature_file: str | None = None,
        sync_latent_file: str | None = None,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        assert self.mode == "sequential", (
            "GANCachedDataset requires mode='sequential': the sync-latent "
            "cache is stored on the fixed non-overlapping window grid"
        )
        self.feature_file = feature_file
        self.sync_latent_file = sync_latent_file

    def _load_window(self, clip: ClipIndex, start_sec: int):
        s = self.spec
        folder = os.path.dirname(clip.motion_path)
        mot = np.load(clip.motion_path, mmap_mode="r")
        p0, p1 = start_sec * s.motion_hz, (start_sec + self.sample_length) * s.motion_hz
        motion = np.asarray(mot[p0:p1], dtype=np.float32)
        if self.feature_file is not None:
            feats = np.load(os.path.join(folder, self.feature_file), mmap_mode="r")
            cond = np.asarray(feats[p0:p1], dtype=np.float32)
        else:
            mel = np.load(clip.mel_path, mmap_mode="r")
            m0, m1 = start_sec * s.mel_hz, (start_sec + self.sample_length) * s.mel_hz
            cond = np.asarray(mel[m0:m1], dtype=np.float32)
        if self.sync_latent_file is None:
            return cond, motion
        lats = np.load(os.path.join(folder, self.sync_latent_file), mmap_mode="r")
        w = start_sec // self.sample_length
        return cond, motion, np.asarray(lats[w], dtype=np.float32)
