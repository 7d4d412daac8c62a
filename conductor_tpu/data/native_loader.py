"""ctypes bindings for the native C++ batch loader (`native/dataloader.cpp`).

`NativeBatchIterator` mirrors `BatchIterator`'s contract (len / iter / epoch
advance / (mel, motion, m_lens) numpy batches) but assembles batches in C++
worker threads over memory-mapped npy files, overlapping host IO with device
step time.  Falls back is the caller's job: `make_batch_iterator` returns the
native iterator when the shared library is available (building it on demand
with `make`) and the Python one otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from .dataset import BatchIterator, ConductorMotionDataset

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libconductor_data.so"))

_lib: Optional[ctypes.CDLL] = None


def _load_library(build: bool = True) -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build:
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True,
            capture_output=True,
        )
    lib = ctypes.CDLL(_LIB_PATH)
    lib.cdl_create.restype = ctypes.c_void_p
    lib.cdl_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.cdl_destroy.argtypes = [ctypes.c_void_p]
    lib.cdl_num_samples.argtypes = [ctypes.c_void_p]
    lib.cdl_num_samples.restype = ctypes.c_int
    lib.cdl_start_epoch.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.cdl_num_batches.argtypes = [ctypes.c_void_p]
    lib.cdl_num_batches.restype = ctypes.c_int
    lib.cdl_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.cdl_next.restype = ctypes.c_int
    _lib = lib
    return lib


def native_available(build: bool = False) -> bool:
    try:
        _load_library(build=build)
        return True
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return False


class NativeBatchIterator:
    """Drop-in counterpart of `BatchIterator` backed by the C++ loader."""

    def __init__(
        self,
        dataset: ConductorMotionDataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        times: int = 1,
        n_threads: int = 4,
        n_prefetch: int = 4,
        host_shard: bool = False,
        process_index: int | None = None,
        process_count: int | None = None,
    ):
        lib = _load_library()
        self.ds = dataset
        self.batch_size = batch_size
        self.epoch = 0
        spec = dataset.spec
        # FeatureCachedDataset streams 30 Hz cached features as the
        # conditioning instead of 90 Hz mel — same loader, different rate.
        from .feature_cache import FEATURE_FILE, FeatureCachedDataset

        if isinstance(dataset, FeatureCachedDataset):
            cond_hz = spec.motion_hz
            first = np.load(
                os.path.join(
                    os.path.dirname(dataset.clips[0].mel_path), FEATURE_FILE
                ),
                mmap_mode="r",
            )
            self._mel_shape = (dataset.sample_length * cond_hz, first.shape[-1])
            cond_paths = [
                os.path.join(os.path.dirname(c.mel_path), FEATURE_FILE).encode()
                for c in dataset.clips
            ]
        else:
            cond_hz = spec.mel_hz
            self._mel_shape = (dataset.sample_length * spec.mel_hz, spec.mel_bins)
            cond_paths = [c.mel_path.encode() for c in dataset.clips]
        self._mot_shape = (
            dataset.sample_length * spec.motion_hz, spec.n_joints, spec.joint_dim,
        )
        mot_paths = [c.motion_path.encode() for c in dataset.clips]
        if host_shard:
            import jax

            pidx = jax.process_index() if process_index is None else process_index
            pcount = jax.process_count() if process_count is None else process_count
            assert batch_size % pcount == 0, (
                f"global batch {batch_size} must divide process_count {pcount}"
            )
            # the C++ side takes the LOCAL batch; it slices each global batch
            self.batch_size = batch_size // pcount
        else:
            pidx, pcount = 0, 1
        MelArr = ctypes.c_char_p * len(cond_paths)
        self._lib = lib
        self._handle = lib.cdl_create(
            MelArr(*cond_paths), MelArr(*mot_paths), len(cond_paths),
            dataset.sample_length, self.batch_size,
            0 if dataset.mode == "sequential" else 1,
            1 if shuffle else 0, 1 if drop_last else 0, times,
            seed, n_threads, n_prefetch, cond_hz, pidx, pcount,
        )
        if not self._handle:
            raise RuntimeError("cdl_create failed (see stderr)")

    def __len__(self) -> int:
        # num_batches is epoch-independent; derive without starting an epoch
        n = self._lib.cdl_num_samples(self._handle)
        return n // self.batch_size

    def __iter__(self):
        lib, h = self._lib, self._handle
        lib.cdl_start_epoch(h, self.epoch)
        n_batches = lib.cdl_num_batches(h)
        B = self.batch_size
        for _ in range(n_batches):
            mel = np.empty((B,) + self._mel_shape, np.float32)
            motion = np.empty((B,) + self._mot_shape, np.float32)
            m_lens = np.empty((B,), np.int32)
            count = lib.cdl_next(
                h,
                mel.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                motion.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                m_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
            if count == 0:
                break
            yield mel[:count], motion[:count], m_lens[:count]
        self.epoch += 1

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.cdl_destroy(self._handle)
            self._handle = None


def make_batch_iterator(dataset: ConductorMotionDataset, batch_size: int, **kw):
    """Native loader when buildable, Python fallback otherwise."""
    if native_available(build=True):
        native_kw = {
            k: v for k, v in kw.items()
            if k in ("shuffle", "drop_last", "seed", "times", "n_threads",
                     "n_prefetch", "host_shard", "process_index", "process_count")
        }
        try:
            return NativeBatchIterator(dataset, batch_size, **native_kw)
        except (RuntimeError, OSError):
            pass
    py_kw = {
        k: v for k, v in kw.items()
        if k in ("shuffle", "drop_last", "seed", "times", "host_shard",
                 "process_index", "process_count")
    }
    return BatchIterator(dataset, batch_size, **py_kw)
