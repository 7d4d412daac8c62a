"""Native C++ batch loader: build, parity with the Python iterator,
determinism, prefetch correctness."""

import shutil

import numpy as np
import pytest

from conductor_tpu.data import make_synthetic_dataset
from conductor_tpu.data.dataset import BatchIterator, ConductorMotionDataset

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None and shutil.which("make") is None,
    reason="no C++ toolchain",
)


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cm100")
    make_synthetic_dataset(str(root), "train", num_clips=3)
    return str(root)


@pytest.fixture(scope="module")
def native(dataset_root):
    from conductor_tpu.data import native_loader

    if not native_loader.native_available(build=True):
        pytest.skip("native loader build failed")
    return native_loader


def test_sequential_parity_with_python(dataset_root, native):
    ds = ConductorMotionDataset(dataset_root, "train", sample_length=10, mode="sequential")
    py = BatchIterator(ds, batch_size=2, shuffle=False, drop_last=True)
    nat = native.NativeBatchIterator(ds, batch_size=2, shuffle=False, drop_last=True)
    assert len(py) == len(nat)
    for (pm, pp, pl), (nm, np_, nl) in zip(py, nat):
        np.testing.assert_array_equal(pm, nm)
        np.testing.assert_array_equal(pp, np_)
        np.testing.assert_array_equal(pl, nl)


def test_shuffle_deterministic_and_covering(dataset_root, native):
    ds = ConductorMotionDataset(dataset_root, "train", sample_length=10, mode="sequential")
    a = native.NativeBatchIterator(ds, batch_size=3, shuffle=True, seed=7)
    b = native.NativeBatchIterator(ds, batch_size=3, shuffle=True, seed=7)
    batches_a = [m.copy() for m, _, _ in a]
    batches_b = [m.copy() for m, _, _ in b]
    for x, y in zip(batches_a, batches_b):
        np.testing.assert_array_equal(x, y)

    # same multiset of windows as unshuffled (compare frame sums)
    flat = lambda bs: sorted(float(w.sum()) for m in bs for w in m)
    c = native.NativeBatchIterator(ds, batch_size=3, shuffle=False)
    np.testing.assert_allclose(
        flat(batches_a), flat([m.copy() for m, _, _ in c]), rtol=1e-6
    )


def test_random_mode_and_epochs(dataset_root, native):
    ds = ConductorMotionDataset(dataset_root, "train", sample_length=20, mode="random")
    it = native.NativeBatchIterator(ds, batch_size=3, shuffle=True, seed=1)
    e0 = [m.copy() for m, _, _ in it]  # epoch 0
    e1 = [m.copy() for m, _, _ in it]  # epoch 1 (auto-advanced)
    assert e0[0].shape == (3, 20 * 90, 128)
    assert not np.array_equal(e0[0], e1[0])  # new windows per epoch


def test_mlens_full_clip_seconds(dataset_root, native):
    ds = ConductorMotionDataset(dataset_root, "train", sample_length=10, mode="random")
    it = native.NativeBatchIterator(ds, batch_size=3, shuffle=False)
    _, _, m_lens = next(iter(it))
    assert (m_lens == 60).all()  # reference quirk: full-clip seconds


def test_times_duplication(dataset_root, native):
    ds = ConductorMotionDataset(dataset_root, "train", sample_length=20, mode="random")
    it = native.NativeBatchIterator(ds, batch_size=3, times=4, shuffle=True)
    assert len(it) == 3 * 4 // 3


class TestHostShardedIterator:
    """Per-host sharded input loading (multi-slice story, SURVEY §2.3)."""

    def test_disjoint_exhaustive_slices(self, tmp_path):
        from conductor_tpu.data import BatchIterator, ConductorMotionDataset
        from conductor_tpu.data.dataset import make_synthetic_dataset

        root = str(tmp_path / "cm")
        make_synthetic_dataset(root, "train", num_clips=8)
        ds = ConductorMotionDataset(root, "train", sample_length=60, mode="sequential")

        # simulate 4 hosts over a global batch of 8
        shards = []
        for pidx in range(4):
            it = BatchIterator(
                ds, 8, seed=5, host_shard=True,
                process_index=pidx, process_count=4,
            )
            assert it.local_batch_size == 2
            batches = list(it)
            assert len(batches) == len(it) == 1
            shards.append(batches[0])

        # union of host slices == the single-process global batch, in order
        whole = list(BatchIterator(ds, 8, seed=5))[0]
        mel_union = np.concatenate([s[0] for s in shards])
        np.testing.assert_array_equal(mel_union, whole[0])

    def test_remainder_consistent_across_process_counts(self, tmp_path):
        """Regression (VERDICT r2 Weak #7): with drop_last=False the
        remainder batch must be yielded at EVERY process count, not just
        single-host — the multi-host path used to silently drop it."""
        from conductor_tpu.data import BatchIterator, ConductorMotionDataset
        from conductor_tpu.data.dataset import make_synthetic_dataset

        root = str(tmp_path / "cm_rem")
        make_synthetic_dataset(root, "train", num_clips=7)  # 7 % 4 == 3
        ds = ConductorMotionDataset(root, "train", sample_length=60, mode="sequential")

        single = list(BatchIterator(ds, 4, seed=5, drop_last=False))
        assert len(single) == 2 and single[-1][0].shape[0] == 3

        for pcount in (1, 2):
            shards = [
                list(BatchIterator(
                    ds, 4, seed=5, drop_last=False, host_shard=True,
                    process_index=pidx, process_count=pcount,
                ))
                for pidx in range(pcount)
            ]
            # same number of batches on every host, matching single-host
            assert all(len(s) == len(single) for s in shards)
            # full batches: union equals the single-host batch row-for-row
            mel_union = np.concatenate([s[0][0] for s in shards])
            np.testing.assert_array_equal(mel_union, single[0][0])
            # remainder: union covers the single-host remainder rows
            # (pcount=2 pads 3 -> 4 rows with one wrapped duplicate)
            rem_union = np.concatenate([s[1][0] for s in shards])
            assert rem_union.shape[0] >= single[1][0].shape[0]
            rem_rows = {r.tobytes() for r in rem_union.reshape(rem_union.shape[0], -1)}
            want_rows = {
                r.tobytes() for r in single[1][0].reshape(single[1][0].shape[0], -1)
            }
            assert want_rows <= rem_rows

    def test_host_shard_requires_divisibility(self, tmp_path):
        from conductor_tpu.data import BatchIterator, ConductorMotionDataset
        from conductor_tpu.data.dataset import make_synthetic_dataset

        root = str(tmp_path / "cm2")
        make_synthetic_dataset(root, "train", num_clips=4)
        ds = ConductorMotionDataset(root, "train", sample_length=60, mode="sequential")
        with pytest.raises(AssertionError):
            BatchIterator(ds, 7, host_shard=True, process_index=0, process_count=4)


class TestNativeHostShard:
    def test_disjoint_exhaustive_union(self, tmp_path):
        """Native-loader host sharding: per-host slices of each global batch
        are disjoint and their union is the single-host epoch."""
        from conductor_tpu.data import ConductorMotionDataset
        from conductor_tpu.data.dataset import make_synthetic_dataset
        from conductor_tpu.data.native_loader import (
            NativeBatchIterator,
            native_available,
        )

        if not native_available(build=True):
            pytest.skip("native loader not buildable")

        root = str(tmp_path / "cm")
        make_synthetic_dataset(root, "train", num_clips=8)
        ds = ConductorMotionDataset(root, "train", sample_length=60, mode="sequential")

        def epoch_mels(it):
            out = []
            for mel, motion, _ in it:
                out += [mel[i, 0, :8].tobytes() for i in range(mel.shape[0])]
            return out

        whole = epoch_mels(NativeBatchIterator(ds, 8, seed=3))
        shard_rows = []
        for pidx in range(4):
            it = NativeBatchIterator(
                ds, 8, seed=3, host_shard=True,
                process_index=pidx, process_count=4,
            )
            assert it.batch_size == 2
            rows = epoch_mels(it)
            assert len(rows) == 2
            shard_rows.append(rows)

        union = [r for rows in shard_rows for r in rows]
        assert sorted(union) == sorted(whole)
        # slices are positionally consistent: host p's rows are the
        # [2p, 2p+2) rows of the global batch
        flat = [r for rows in shard_rows for r in rows]
        assert flat == whole
