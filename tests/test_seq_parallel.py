"""Context (sequence) parallelism on the virtual 8-device CPU mesh:
shard_map collective attention parity + full GSPMD train step over a
('data', 'seq') mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from conductor_tpu.ops import temporal_linear_attention
from conductor_tpu.parallel import cp_linear_attention, make_mesh, replicate, shard_batch


@pytest.fixture(scope="module")
def mesh24():
    return make_mesh(data=2, seq=4)


class TestCpAttention:
    def test_parity_with_unsharded(self, mesh24):
        b, t, d, h = 2, 64, 32, 4
        rng = jax.random.PRNGKey(0)
        kq, kk, kv = jax.random.split(rng, 3)
        q = jax.random.normal(kq, (b, t, d))
        k = jax.random.normal(kk, (b, t, d))
        v = jax.random.normal(kv, (b, t, d))
        length = jnp.array([64, 40])
        mask = (jnp.arange(t)[None, :] < length[:, None]).astype(jnp.float32)[..., None]

        want = temporal_linear_attention(q, k, v, h, mask, impl="xla")

        spec = P("data", "seq", None)
        fn = shard_map(
            lambda q, k, v, m: cp_linear_attention(q, k, v, h, m),
            mesh=mesh24,
            in_specs=(spec, spec, spec, spec),
            out_specs=spec,
        )
        got = fn(q, k, v, mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_no_mask(self, mesh24):
        b, t, d, h = 1, 32, 16, 2
        rng = jax.random.PRNGKey(1)
        q = jax.random.normal(rng, (b, t, d))
        want = temporal_linear_attention(q, q, q, h, None, impl="xla")
        spec = P(None, "seq", None)
        fn = shard_map(
            lambda q: cp_linear_attention(q, q, q, h, None),
            mesh=mesh24, in_specs=(spec,), out_specs=spec,
        )
        np.testing.assert_allclose(np.asarray(fn(q)), np.asarray(want), atol=1e-5)


class TestGspmdSeqSharding:
    def test_train_step_on_data_seq_mesh(self):
        """The full DDPM train step with batch sharded (B over data, T over
        seq) — GSPMD must insert the cross-shard collectives for the key
        time-softmax, the KV reduction, and the grad psum."""
        from conductor_tpu.config import (
            Config, DenoiserConfig, DiffusionConfig, TrainConfig,
        )
        from conductor_tpu.train.ddpm_trainer import DDPMTrainer

        cfg = Config(
            denoiser=DenoiserConfig(
                num_frames=64, latent_dim=32, ff_size=16, num_layers=2,
                num_heads=4,
            ),
            diffusion=DiffusionConfig(steps=8, schedule="cosine"),
            train=TrainConfig(batch_size=2, sample_length=2),
        )
        mesh = make_mesh(data=2, seq=4)
        trainer = DDPMTrainer(cfg)
        rng = jax.random.PRNGKey(0)
        state = trainer.init_state(rng)
        s = cfg.dataset
        sl = cfg.train.sample_length
        batch = (
            np.random.rand(2, sl * s.mel_hz, s.mel_bins).astype(np.float32),
            np.random.rand(2, sl * s.motion_hz, s.n_joints, s.joint_dim).astype(
                np.float32
            ),
            np.full((2,), s.clip_seconds, np.int32),
        )
        # snapshot before stepping: the train step donates its state arg
        state_snapshot = jax.tree_util.tree_map(np.asarray, state)
        with mesh:
            state = replicate(state, mesh)
            batch = shard_batch(batch, mesh, seq_dims={3: 1, 4: 1})
            assert batch[0].sharding.spec == P("data", "seq")
            state2, metrics = trainer.train_step(state, batch, rng)
            loss = float(metrics["loss"])
        assert np.isfinite(loss)

        # parity with the unsharded step on the same inputs
        state_r = jax.device_put(state_snapshot)
        batch_r = jax.tree_util.tree_map(np.asarray, batch)
        _, metrics_r = trainer.train_step(state_r, batch_r, rng)
        np.testing.assert_allclose(
            loss, float(metrics_r["loss"]), rtol=2e-4
        )

    def test_generate_seq_sharded(self):
        """Batched sampling with mel sharded over ('data', 'seq')."""
        from conductor_tpu.config import (
            Config, DenoiserConfig, DiffusionConfig, TrainConfig,
        )
        from conductor_tpu.train.ddpm_trainer import DDPMTrainer

        cfg = Config(
            denoiser=DenoiserConfig(
                num_frames=64, latent_dim=32, ff_size=16, num_layers=2,
                num_heads=4,
            ),
            diffusion=DiffusionConfig(steps=8, schedule="cosine"),
            train=TrainConfig(batch_size=2, sample_length=2),
        )
        mesh = make_mesh(data=2, seq=4)
        trainer = DDPMTrainer(cfg)
        rng = jax.random.PRNGKey(0)
        state = trainer.init_state(rng)
        mel = np.random.rand(2, 64 * 3, 128).astype(np.float32)
        with mesh:
            state = replicate(state, mesh)
            mel_sh = jax.device_put(
                mel, NamedSharding(mesh, P("data", "seq", None))
            )
            out = trainer.generate(state, mel_sh, rng)
        assert out.shape == (2, 64, 26)
        assert bool(jnp.all(jnp.isfinite(out)))
