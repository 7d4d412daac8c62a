"""End-to-end slice: data -> trainer -> loss decreases -> scan sampler output.

Exercises every layer with a tiny config on synthetic data (SURVEY.md §7.3),
plus the multi-chip SPMD path on the virtual 8-device CPU mesh.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conductor_tpu.config import Config, DenoiserConfig, DiffusionConfig, TrainConfig
from conductor_tpu.data import BatchIterator, ConductorMotionDataset, make_synthetic_dataset
from conductor_tpu.parallel import make_mesh, replicate, shard_batch
from conductor_tpu.train import CheckpointManager, DDPMTrainer


def tiny_config(**train_kw) -> Config:
    return Config(
        denoiser=DenoiserConfig(
            num_frames=64, latent_dim=32, ff_size=16, num_layers=2, num_heads=4
        ),
        diffusion=DiffusionConfig(steps=8, schedule="cosine"),
        train=TrainConfig(**{"batch_size": 4, "sample_length": 2, **train_kw}),
    )


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cm100"))
    make_synthetic_dataset(root, "train", num_clips=4)
    make_synthetic_dataset(root, "test", num_clips=2)
    return root


class TestData:
    def test_sequential_windows(self, synth_root):
        ds = ConductorMotionDataset(synth_root, "train", sample_length=2, mode="sequential")
        assert len(ds) == 4 * 30  # 60s / 2s windows x 4 clips
        mel, motion, m_len = ds[0]
        assert mel.shape == (180, 128)
        assert motion.shape == (60, 13, 2)
        assert int(m_len) == 60

    def test_random_windows_reseed(self, synth_root):
        ds = ConductorMotionDataset(synth_root, "train", sample_length=2, mode="random")
        assert len(ds) == 4
        ds.set_epoch(0)
        a = ds[0][1]
        ds.set_epoch(1)
        b = ds[0][1]
        ds.set_epoch(0)
        c = ds[0][1]
        np.testing.assert_array_equal(a, c)  # deterministic per epoch
        assert not np.array_equal(a, b)

    def test_batch_iterator(self, synth_root):
        ds = ConductorMotionDataset(synth_root, "train", sample_length=2, mode="random")
        it = BatchIterator(ds, batch_size=4, times=3)
        assert len(it) == 3
        batches = list(iter(it))
        assert len(batches) == 3
        mel, motion, m_lens = batches[0]
        assert mel.shape == (4, 180, 128)
        assert motion.shape == (4, 60, 13, 2)
        assert m_lens.shape == (4,)

    def test_motion_in_unit_interval(self, synth_root):
        ds = ConductorMotionDataset(synth_root, "train", sample_length=2, mode="sequential")
        _, motion, _ = ds[0]
        assert motion.min() >= 0.0 and motion.max() <= 1.0


class TestTrainLoop:
    def test_loss_decreases(self, synth_root):
        cfg = tiny_config(lr=1e-3)
        trainer = DDPMTrainer(cfg)
        rng = jax.random.PRNGKey(0)
        state = trainer.init_state(rng)
        ds = ConductorMotionDataset(synth_root, "train", sample_length=2, mode="random")
        it = BatchIterator(ds, batch_size=4, times=8)

        losses = []
        for i, batch in enumerate(iter(it)):
            state, metrics = trainer.train_step(state, batch, rng)
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(losses))
        # x0-prediction from a zero-init output layer starts near E[x0^2];
        # a few steps should reduce reconstruction loss measurably.
        assert losses[-1] < losses[0]

    def test_reference_mask_mode(self, synth_root):
        cfg = tiny_config(replicate_reference_mask=True)
        trainer = DDPMTrainer(cfg)
        rng = jax.random.PRNGKey(0)
        state = trainer.init_state(rng)
        ds = ConductorMotionDataset(synth_root, "train", sample_length=2, mode="random")
        batch = next(iter(BatchIterator(ds, batch_size=4)))
        state, metrics = trainer.train_step(state, batch, rng)
        assert np.isfinite(float(metrics["loss"]))

    def test_loss_aware_sampler(self, synth_root):
        cfg = tiny_config(timestep_sampler="loss-second-moment")
        trainer = DDPMTrainer(cfg)
        rng = jax.random.PRNGKey(0)
        state = trainer.init_state(rng)
        assert state.sampler_state is not None
        ds = ConductorMotionDataset(synth_root, "train", sample_length=2, mode="random")
        batch = next(iter(BatchIterator(ds, batch_size=4)))
        state, _ = trainer.train_step(state, batch, rng)
        assert int(state.sampler_state.loss_counts.sum()) == 4

    def test_generate_shapes_and_respacing(self, synth_root):
        cfg = tiny_config()
        trainer = DDPMTrainer(cfg)
        rng = jax.random.PRNGKey(0)
        state = trainer.init_state(rng)
        mel = jnp.zeros((1, 180, 128))
        out = trainer.generate(state, mel, rng, num_steps=4)
        assert out.shape == (1, 60, 26)
        assert np.isfinite(np.asarray(out)).all()

    def test_generate_rejects_wrong_mel_bins(self, synth_root):
        cfg = tiny_config()
        trainer = DDPMTrainer(cfg)
        rng = jax.random.PRNGKey(0)
        state = trainer.init_state(rng)
        with pytest.raises(ValueError, match="mel must be"):
            trainer.generate(state, jnp.zeros((1, 180, 80)), rng, num_steps=4)

    def test_generate_guided(self, synth_root):
        cfg = tiny_config()
        trainer = DDPMTrainer(cfg)
        rng = jax.random.PRNGKey(0)
        state = trainer.init_state(rng)
        mel = jnp.zeros((1, 180, 128))
        out = trainer.generate(state, mel, rng, num_steps=4, guidance_scale=2.5)
        assert out.shape == (1, 60, 26)

    def test_checkpoint_roundtrip(self, synth_root, tmp_path):
        cfg = tiny_config()
        trainer = DDPMTrainer(cfg)
        rng = jax.random.PRNGKey(0)
        state = trainer.init_state(rng)
        ds = ConductorMotionDataset(synth_root, "train", sample_length=2, mode="random")
        batch = next(iter(BatchIterator(ds, batch_size=4)))
        state, _ = trainer.train_step(state, batch, rng)

        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(int(state.step), state, wait=True)
        template = trainer.init_state(jax.random.PRNGKey(1))
        restored = mgr.restore(template)
        assert int(restored.step) == int(state.step)
        a = jax.tree_util.tree_leaves(state.params)
        b = jax.tree_util.tree_leaves(restored.params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        mgr.close()


class TestMultiChip:
    def test_sharded_train_step_8dev(self, synth_root):
        assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
        cfg = tiny_config(batch_size=8)
        trainer = DDPMTrainer(cfg)
        rng = jax.random.PRNGKey(0)
        state = trainer.init_state(rng)
        ds = ConductorMotionDataset(synth_root, "train", sample_length=2, mode="random")
        batch = next(iter(BatchIterator(ds, batch_size=8, times=2)))
        mesh = make_mesh(data=8)
        with mesh:
            state = replicate(state, mesh)
            sbatch = shard_batch(batch, mesh)
            state, metrics = trainer.train_step(state, sbatch, rng)
        assert np.isfinite(float(metrics["loss"]))

    def test_sharded_matches_single_device(self, synth_root):
        cfg = tiny_config(batch_size=8)
        trainer = DDPMTrainer(cfg)
        rng = jax.random.PRNGKey(0)
        ds = ConductorMotionDataset(synth_root, "train", sample_length=2, mode="random")
        batch = next(iter(BatchIterator(ds, batch_size=8, times=2)))

        state1 = trainer.init_state(rng)
        _, m1 = trainer.train_step(state1, batch, rng)

        mesh = make_mesh(data=8)
        state2 = trainer.init_state(rng)
        with mesh:
            state2 = replicate(state2, mesh)
            sbatch = shard_batch(batch, mesh)
            _, m2 = trainer.train_step(state2, sbatch, rng)
        # SPMD sharding must not change the math
        np.testing.assert_allclose(
            float(m1["loss"]), float(m2["loss"]), rtol=2e-4
        )

    def test_graft_dryrun(self):
        import __graft_entry__ as g

        g.dryrun_multichip(8)


class TestCorrelatedSyntheticData:
    """The correlated synthetic stand-in must carry a GENERALIZABLE
    music->motion relationship: the beat->gesture phase offset has to be
    consistent across clips (it is deterministic per joint + small jitter),
    otherwise sync detection on it is clip-specific memorization and
    held-out eval-mode accuracy can never rise above chance (the round-2
    e2e artifact showed exactly that failure)."""

    @staticmethod
    def _clip_phases(folder):
        mel = np.load(f"{folder}/mel.npy")
        motion = np.load(f"{folder}/motion.npy")
        T90, T30 = mel.shape[0], motion.shape[0]
        # beat rate from the mel pulse train (sub-bin precision not needed:
        # pick the peak of the energy envelope's spectrum, then project)
        env = mel.mean(axis=1) - mel.mean()
        freqs = np.fft.rfftfreq(T90, d=1 / 90.0)
        spec = np.abs(np.fft.rfft(env))
        spec[(freqs < 0.5) | (freqs > 2.5)] = 0.0  # beat_hz is in [0.8, 2.3]
        # the pulse train (sin^8) has strong harmonics: take the LOWEST
        # frequency near-peak, not the global argmax
        cand = np.where(spec > 0.6 * spec.max())[0]
        beat_hz = float(freqs[cand[0]])
        # phase of a signal at beat_hz via complex projection
        def phase(x, hz_rate):
            t = np.arange(x.shape[0]) / hz_rate
            z = np.exp(-2j * np.pi * beat_hz * t)
            return np.angle((x * z).sum() if x.ndim == 1 else (x * z[:, None, None]).sum(0))

        mel_phase = phase(env, 90.0)
        motion_phase = np.array([
            [phase(motion[:, j, d] - motion[:, j, d].mean(), 30.0) for d in range(2)]
            for j in range(motion.shape[1])
        ])
        return mel_phase, motion_phase

    def test_phase_offset_consistent_across_clips(self, tmp_path):
        from conductor_tpu.data.dataset import make_synthetic_dataset

        root = str(tmp_path / "corr")
        make_synthetic_dataset(root, "train", num_clips=3, seed=0, correlated=True)
        make_synthetic_dataset(root, "test", num_clips=2, seed=1, correlated=True)
        offsets = []
        for split, n in (("train", 3), ("test", 2)):
            for i in range(n):
                mel_ph, mot_ph = self._clip_phases(f"{root}/{split}/{i}")
                # beat->gesture lag, wrapped to (-pi, pi]
                off = np.angle(np.exp(1j * (mot_ph - mel_ph)))
                offsets.append(off)
        offsets = np.stack(offsets)  # (clips, joints, 2)
        # per-clip jitter is +-0.125 rad by construction; allow estimation
        # slack on top.  Cross-clip spread far below pi means the
        # relationship is shared, not per-clip random (which would give
        # spreads ~uniform on (-pi, pi]).
        spread = np.abs(offsets - offsets.mean(axis=0, keepdims=True)).max()
        assert spread < 0.6, f"phase offsets diverge across clips: {spread:.3f} rad"

    def test_uncorrelated_has_no_shared_phase(self, tmp_path):
        from conductor_tpu.data.dataset import make_synthetic_dataset

        root = str(tmp_path / "uncorr")
        make_synthetic_dataset(root, "train", num_clips=4, seed=0, correlated=False)
        offsets = []
        for i in range(4):
            mel_ph, mot_ph = self._clip_phases(f"{root}/train/{i}")
            offsets.append(np.angle(np.exp(1j * (mot_ph - mel_ph))))
        spread = np.abs(np.stack(offsets) - np.stack(offsets).mean(axis=0)).max()
        assert spread > 0.6  # random phases: no shared structure
