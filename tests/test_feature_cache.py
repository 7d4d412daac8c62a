"""Music-feature cache: precompute pass + numerically-identical cached
training."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conductor_tpu.config import Config, DenoiserConfig, DiffusionConfig, TrainConfig
from conductor_tpu.data import make_synthetic_dataset
from conductor_tpu.data.dataset import BatchIterator, ConductorMotionDataset
from conductor_tpu.data.feature_cache import (
    FeatureCachedDataset,
    precompute_music_features,
)
from conductor_tpu.train.ddpm_trainer import DDPMTrainer


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cm100"))
    make_synthetic_dataset(root, "train", num_clips=3)
    cfg = Config(
        denoiser=DenoiserConfig(
            num_frames=1800, latent_dim=32, ff_size=16, num_layers=2, num_heads=4
        ),
        diffusion=DiffusionConfig(steps=8, schedule="cosine"),
        train=TrainConfig(batch_size=2, sample_length=10),
    )
    trainer = DDPMTrainer(cfg)
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    encode = jax.jit(
        lambda mel: trainer.model.apply(
            variables, mel, method=trainer.model.encode_music
        )[1]
    )
    n = precompute_music_features(encode, root, "train", batch_size=2)
    assert n == 3
    return root, cfg, trainer, state


def test_cached_dataset_shapes(env):
    root, cfg, trainer, state = env
    ds = FeatureCachedDataset(root, "train", sample_length=10, mode="sequential")
    feats, motion, m_len = ds[0]
    assert feats.shape == (300, trainer.model.music_latent_dim)
    assert motion.shape == (300, 13, 2)
    assert m_len == 60


def test_cached_training_matches_uncached(env):
    root, cfg, trainer, state = env
    rng = jax.random.PRNGKey(42)

    raw_ds = ConductorMotionDataset(root, "train", sample_length=10, mode="sequential")
    cached_ds = FeatureCachedDataset(root, "train", sample_length=10, mode="sequential")
    raw_batch = BatchIterator(raw_ds, 2, shuffle=False).__iter__().__next__()
    cached_batch = BatchIterator(cached_ds, 2, shuffle=False).__iter__().__next__()

    # numpy snapshots: train_step donates its state argument
    snap = jax.tree_util.tree_map(np.asarray, state)
    _, metrics_raw = trainer.train_step(
        jax.tree_util.tree_map(jnp.asarray, snap), raw_batch, rng
    )

    cfg_cached = cfg.replace(
        train=dataclasses.replace(cfg.train, cached_features=True)
    )
    trainer_cached = DDPMTrainer(cfg_cached)
    _, metrics_cached = trainer_cached.train_step(
        jax.tree_util.tree_map(jnp.asarray, snap), cached_batch, rng
    )
    np.testing.assert_allclose(
        float(metrics_cached["loss"]), float(metrics_raw["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(metrics_cached["grad_norm"]),
        float(metrics_raw["grad_norm"]),
        rtol=1e-4,
    )


def test_precompute_skips_existing(env):
    root, cfg, trainer, state = env
    n = precompute_music_features(lambda mel: 0, root, "train")
    assert n == 0  # all cached already


class TestCacheProvenance:
    """Sidecar metadata keys each on-disk cache to the frozen weights that
    produced it: same-shaped caches from a different checkpoint/init seed
    must never be silently reused (ADVICE r4)."""

    def _encode(self, mel):
        return np.asarray(mel)[:, ::3, :64] * 2.0

    @pytest.fixture()
    def root(self, tmp_path):
        root = str(tmp_path / "cm100")
        make_synthetic_dataset(root, "train", num_clips=2)
        return root

    def test_matching_meta_reuses(self, root):
        meta = {"fingerprint": "abc", "impl": "flax"}
        n = precompute_music_features(self._encode, root, "train", meta=meta)
        assert n == 2
        n = precompute_music_features(self._encode, root, "train", meta=meta)
        assert n == 0  # sidecar matches: fill-missing only

    def test_mismatched_meta_raises(self, root):
        precompute_music_features(
            self._encode, root, "train", meta={"fingerprint": "abc"}
        )
        with pytest.raises(ValueError, match="overwrite"):
            precompute_music_features(
                self._encode, root, "train", meta={"fingerprint": "OTHER"}
            )

    def test_mismatched_meta_overwrite_recomputes(self, root):
        precompute_music_features(
            self._encode, root, "train", meta={"fingerprint": "abc"}
        )
        n = precompute_music_features(
            lambda mel: self._encode(mel) + 1.0, root, "train",
            meta={"fingerprint": "OTHER"}, overwrite=True,
        )
        assert n == 2  # every file rewritten under the new weights
        # and the sidecar now records the new provenance
        n = precompute_music_features(
            self._encode, root, "train", meta={"fingerprint": "OTHER"}
        )
        assert n == 0

    def test_legacy_cache_without_sidecar_raises(self, root):
        # cache written with provenance checking off (meta=None) ...
        precompute_music_features(self._encode, root, "train")
        # ... then a keyed caller cannot prove whose weights produced it
        with pytest.raises(ValueError, match="sidecar"):
            precompute_music_features(
                self._encode, root, "train", meta={"fingerprint": "abc"}
            )

    def test_sync_latent_meta(self, root):
        from conductor_tpu.data.feature_cache import precompute_sync_latents

        latent = lambda m: np.asarray(m).reshape(m.shape[0], m.shape[1], -1)[..., :4]
        meta = {"fingerprint": "s1", "sample_length": 10}
        n = precompute_sync_latents(
            latent, root, "train", sample_length=10, meta=meta
        )
        assert n == 2
        with pytest.raises(ValueError, match="overwrite"):
            precompute_sync_latents(
                latent, root, "train", sample_length=30,
                meta={"fingerprint": "s1", "sample_length": 30},
            )

    def test_tree_fingerprint_sensitivity(self):
        from conductor_tpu.data.feature_cache import tree_fingerprint

        a = {"w": np.ones((3, 2), np.float32), "b": np.zeros((2,), np.float32)}
        b = {"w": np.ones((3, 2), np.float32), "b": np.zeros((2,), np.float32)}
        assert tree_fingerprint(a) == tree_fingerprint(b)
        b["w"][0, 0] = 2.0
        assert tree_fingerprint(a) != tree_fingerprint(b)
        # dtype and structure changes also move the fingerprint
        c = {"w": np.ones((3, 2), np.float64), "b": np.zeros((2,), np.float32)}
        assert tree_fingerprint(a) != tree_fingerprint(c)


class TestSyncLatentCache:
    """Per-window frozen SyncLoss latent cache (M2SGAN cached_sync_latents)."""

    def _latent_fn(self, motion):
        # a stand-in encoder with an unbounded temporal receptive field
        # (cumsum): window-encode != clip-encode-then-slice, so the test
        # distinguishes per-window caching from naive clip slicing
        x = np.asarray(motion).reshape(motion.shape[0], motion.shape[1], -1)
        return np.cumsum(x[..., :4], axis=1, dtype=np.float32)

    @pytest.fixture()
    def root(self, tmp_path):
        root = str(tmp_path / "cm100")
        make_synthetic_dataset(root, "train", num_clips=2)
        return root

    def test_cache_is_per_window(self, root):
        from conductor_tpu.data.feature_cache import (
            GANCachedDataset,
            precompute_sync_latents,
        )

        n = precompute_sync_latents(
            self._latent_fn, root, "train", sample_length=10, batch_size=4
        )
        assert n == 2
        ds = GANCachedDataset(
            root, "train", sample_length=10, mode="sequential",
            sync_latent_file="sync_latent.npy",
        )
        assert len(ds) == 2 * 6  # 60-s clips, 10-s windows
        cond, motion, lat = ds[1]  # clip 0, window 1
        assert cond.shape == (10 * 90, 128)  # raw mel (feature_file=None)
        assert motion.shape == (10 * 30, 13, 2)
        # the cached latents are the WINDOW's encode ...
        np.testing.assert_allclose(lat, self._latent_fn(motion[None])[0],
                                   rtol=1e-6)
        # ... which, with a receptive field crossing the border, is NOT a
        # slice of the full-clip encode
        raw = ConductorMotionDataset(root, "train", sample_length=60,
                                     mode="sequential")
        full_motion = raw[0][1]
        clip_sliced = self._latent_fn(full_motion[None])[0][300:600]
        assert np.abs(lat - clip_sliced).max() > 1e-3

        n = precompute_sync_latents(
            self._latent_fn, root, "train", sample_length=10
        )
        assert n == 0  # skips existing

    def test_with_feature_cache(self, root, env):
        """Both caches together: (features, motion, latents) batches."""
        from conductor_tpu.data.feature_cache import (
            GANCachedDataset,
            precompute_music_features,
            precompute_sync_latents,
        )

        _, _, trainer, state = env
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        encode = jax.jit(
            lambda mel: trainer.model.apply(
                variables, mel, method=trainer.model.encode_music
            )[1]
        )
        precompute_music_features(encode, root, "train", batch_size=2)
        precompute_sync_latents(self._latent_fn, root, "train", sample_length=10)
        ds = GANCachedDataset(
            root, "train", sample_length=10, mode="sequential",
            feature_file="music_feat.npy", sync_latent_file="sync_latent.npy",
        )
        batch = BatchIterator(ds, 2, shuffle=False).__iter__().__next__()
        assert len(batch) == 3
        feats, motion, lat = batch
        assert feats.shape == (2, 300, trainer.model.music_latent_dim)
        assert motion.shape == (2, 300, 13, 2)
        assert lat.shape == (2, 300, 4)
