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
