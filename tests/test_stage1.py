"""Stage-1 tests: pair building, M2SNet contrastive training, M2SGAN WGAN-GP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conductor_tpu.data.pairs import build_pairs
from conductor_tpu.models import Discriminator1DCNN, Generator
from conductor_tpu.train import M2SGANTrainer, M2SNetTrainer


def _clip_batch(rng, B=2, S=12):
    k1, k2 = jax.random.split(rng)
    music = jax.random.uniform(k1, (B, S * 90, 128))
    motion = jax.random.uniform(k2, (B, S * 30, 13, 2))
    return music, motion


class TestPairBuilder:
    def test_easy_pairs_are_batch_flips(self, rng):
        music, motion = _clip_batch(rng)
        m1, m2, p1, p2 = build_pairs(rng, music, motion, "easy", 12, 4)
        assert m1.shape == (2, 360, 128) and p1.shape == (2, 120, 13, 2)
        np.testing.assert_array_equal(np.asarray(m2), np.asarray(m1)[::-1])
        np.testing.assert_array_equal(np.asarray(p2), np.asarray(p1)[::-1])

    def test_hard_pairs_at_least_10s_apart(self, rng):
        music, motion = _clip_batch(rng, S=30)
        for i in range(5):
            k = jax.random.fold_in(rng, i)
            m1, m2, p1, p2 = build_pairs(k, music, motion, "hard", 30, 10)
            assert m1.shape == (2, 900, 128)
            # windows differ (10s apart guaranteed by construction)
            assert not np.array_equal(np.asarray(p1), np.asarray(p2))

    def test_super_hard_small_shift(self, rng):
        music, motion = _clip_batch(rng, S=30)
        m1, m2, p1, p2 = build_pairs(rng, music, motion, "super_hard", 30, 10)
        assert p1.shape == p2.shape == (2, 300, 13, 2)

    def test_music_motion_alignment(self, rng):
        # mel index must be exactly 3x the motion index: embed a marker
        music, motion = _clip_batch(rng, S=12)
        marked_music = music.at[:, :, 0].set(jnp.arange(12 * 90)[None, :] / (12 * 90))
        marked_motion = motion.at[:, :, 0, 0].set(jnp.arange(12 * 30)[None, :] / (12 * 30))
        m1, _, p1, _ = build_pairs(rng, marked_music, marked_motion, "hard", 12, 4)
        music_start = float(m1[0, 0, 0]) * 12 * 90
        motion_start = float(p1[0, 0, 0, 0]) * 12 * 30
        assert abs(music_start - 3 * motion_start) < 0.5

    def test_clip_too_long_raises(self, rng):
        music, motion = _clip_batch(rng)
        with pytest.raises(ValueError):
            build_pairs(rng, music, motion, "easy", 12, 5)


class TestM2SNetTrainer:
    def test_bce_decreases_on_fixed_batch(self, rng):
        trainer = M2SNetTrainer(sample_length=12, clip_length=4)
        state = trainer.init_state(rng)
        batch = _clip_batch(rng, B=4, S=12)
        losses = []
        for i in range(6):
            state, metrics = trainer.train_step(state, batch, rng, strategy="easy")
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]

    def test_all_strategies_run(self, rng):
        trainer = M2SNetTrainer(sample_length=30, clip_length=10)
        state = trainer.init_state(rng)
        batch = _clip_batch(rng, B=2, S=30)
        for s in ("easy", "hard", "super_hard"):
            state, metrics = trainer.train_step(state, batch, rng, strategy=s)
            assert np.isfinite(float(metrics["loss"]))
            assert 0.0 <= float(metrics["accuracy"]) <= 1.0

    def test_evaluate(self, rng):
        trainer = M2SNetTrainer(sample_length=12, clip_length=4)
        state = trainer.init_state(rng)
        batch = _clip_batch(rng, B=2, S=12)
        out = trainer.evaluate(state, batch, rng, "easy")
        assert set(out) == {"accuracy", "sync_prob", "non_sync_prob"}

    def test_share_encodes_eval_parity(self, rng):
        """With frozen BN stats the shared-encode forward is the same
        function as the reference's 4-forward chain — predictions match."""
        base = M2SNetTrainer(sample_length=12, clip_length=4)
        shared = M2SNetTrainer(sample_length=12, clip_length=4, share_encodes=True)
        state = base.init_state(rng)
        batch = _clip_batch(rng, B=2, S=12)
        from conductor_tpu.data.pairs import build_pairs

        pairs = build_pairs(rng, batch[0], batch[1], "easy", 12, 4)
        preds_a, _ = base._forward4(state.params, state.batch_stats, pairs, train=False)
        preds_b, _ = shared._forward4(state.params, state.batch_stats, pairs, train=False)
        for a, b in zip(preds_a, preds_b):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_remat_step_parity(self, rng):
        """remat=True is the same math — identical loss, and gradients equal
        up to float reassociation (the recomputed backward may schedule conv
        reductions differently; measured ~0.1% of grad scale)."""
        base = M2SNetTrainer(sample_length=12, clip_length=4)
        remat = M2SNetTrainer(sample_length=12, clip_length=4, remat=True)
        state = base.init_state(rng)
        music, motion = _clip_batch(rng, B=2, S=12)
        pairs = build_pairs(rng, music, motion, "hard", 12, 4)

        def mk_loss(tr):
            def loss(params):
                (p11, p12, p22, p21), _ = tr._forward4(
                    params, state.batch_stats, pairs, train=True
                )
                return (tr._bce(p11, 1.0) + tr._bce(p12, 0.0)
                        + tr._bce(p22, 1.0) + tr._bce(p21, 0.0))
            return loss

        (la, ga) = jax.value_and_grad(mk_loss(base))(state.params)
        (lb, gb) = jax.value_and_grad(mk_loss(remat))(state.params)
        np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
        leaves_a = jax.tree_util.tree_leaves(ga)
        leaves_b = jax.tree_util.tree_leaves(gb)
        gmax = max(float(np.abs(np.asarray(g)).max()) for g in leaves_a)
        for a, b in zip(leaves_a, leaves_b):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=0.005 * gmax
            )

    def test_bn_recalibration_aligns_eval_mode(self, rng):
        """Precise-BN recalibration: with running stats replaced by the
        calibration batch's exact batch statistics, an eval-mode forward on
        that batch equals the train-mode forward — every BN layer normalizes
        by the same statistics — so eval-mode accuracy reflects what the
        weights learned instead of momentum-lagged init stats."""
        trainer = M2SNetTrainer(sample_length=6, clip_length=2)
        state = trainer.init_state(rng)
        music, motion = _clip_batch(rng, B=2, S=6)
        for _ in range(2):  # let running stats lag behind the weights
            state, _ = trainer.train_step(state, (music, motion), rng, "easy")

        recal = trainer.recalibrate_batch_stats(state, [(music, motion)])
        variables = {"params": recal.params, "batch_stats": recal.batch_stats}
        out_train, _ = trainer.model.apply(
            variables, music, motion, True, mutable=["batch_stats"]
        )
        out_eval = trainer.model.apply(variables, music, motion, False)
        # the (new - m*old)/(1-m) stat recovery amplifies float rounding
        # ~100x (m = 0.99); outputs agree to that scale
        np.testing.assert_allclose(
            np.asarray(out_train), np.asarray(out_eval), atol=2e-4
        )
        # two-batch aggregation stays finite and var-positive
        recal2 = trainer.recalibrate_batch_stats(
            state, [(music, motion), (music * 1.5, motion)]
        )
        for leaf in jax.tree_util.tree_leaves(recal2.batch_stats):
            assert np.isfinite(np.asarray(leaf)).all()

    def test_microbatch_grad_parity(self, rng):
        """microbatch=2 accumulates the exact full-batch mean gradient when
        BN sees the same statistics — checked by comparing against k=1 with
        a loose bound (BN batch stats are per-chunk by design, the
        reference's DataParallel per-GPU semantics), plus exact loss
        decrease over steps."""
        base = M2SNetTrainer(sample_length=12, clip_length=4)
        micro = M2SNetTrainer(sample_length=12, clip_length=4, microbatch=2)
        state_a = base.init_state(rng)
        state_b = micro.init_state(rng)
        batch = _clip_batch(rng, B=4, S=12)
        state_a, m_a = base.train_step(state_a, batch, rng, strategy="easy")
        state_b, m_b = micro.train_step(state_b, batch, rng, strategy="easy")
        # per-chunk BN stats shift the forward slightly; losses must agree
        # to a few percent at init
        np.testing.assert_allclose(
            float(m_a["loss"]), float(m_b["loss"]), rtol=0.05
        )
        losses = [float(m_b["loss"])]
        for _ in range(5):
            state_b, m_b = micro.train_step(state_b, batch, rng, strategy="easy")
            losses.append(float(m_b["loss"]))
        assert all(np.isfinite(losses)) and losses[-1] < losses[0]

    def test_microbatch_rejects_indivisible(self, rng):
        micro = M2SNetTrainer(sample_length=12, clip_length=4, microbatch=3)
        state = micro.init_state(rng)
        batch = _clip_batch(rng, B=4, S=12)
        with pytest.raises(ValueError, match="not divisible"):
            micro.train_step(state, batch, rng, strategy="easy")

    def test_share_encodes_bf16_trains(self, rng):
        trainer = M2SNetTrainer(
            sample_length=12, clip_length=4,
            compute_dtype="bfloat16", share_encodes=True,
        )
        state = trainer.init_state(rng)
        batch = _clip_batch(rng, B=4, S=12)
        losses = []
        for i in range(6):
            state, metrics = trainer.train_step(state, batch, rng, strategy="easy")
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]


class TestGANModels:
    def test_generator_shapes_and_range(self, rng):
        G = Generator()
        mel = jax.random.uniform(rng, (2, 6 * 90, 128))
        noise = jax.random.normal(jax.random.fold_in(rng, 1), (2, 6, 8))
        variables = G.init(rng, mel, noise)
        out = G.apply(variables, mel, noise)
        assert out.shape == (2, 180, 13, 2)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    def test_discriminator_scalar(self, rng):
        D = Discriminator1DCNN()
        motion = jax.random.uniform(rng, (3, 180, 13, 2))
        variables = D.init(rng, motion)
        out = D.apply(variables, motion)
        assert out.shape == (3, 1)


class TestM2SGANTrainer:
    def test_wgan_step_runs_and_is_finite(self, rng):
        trainer = M2SGANTrainer(sample_length=6, critic_iters=2)
        state = trainer.init_state(rng)
        mel = jax.random.uniform(rng, (2, 6 * 90, 128))
        real = jax.random.uniform(jax.random.fold_in(rng, 1), (2, 180, 13, 2))
        state, metrics = trainer.train_step(state, (mel, real), rng)
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k
        assert int(state.step) == 1

    def test_critic_learns_separation(self, rng):
        # a few steps of critic training should increase W-distance estimate
        trainer = M2SGANTrainer(sample_length=6, critic_iters=3)
        state = trainer.init_state(rng)
        mel = jax.random.uniform(rng, (4, 6 * 90, 128))
        # real data: smooth; the generator's early output will differ
        t = jnp.arange(180)[None, :, None, None] / 30.0
        real = 0.5 + 0.2 * jnp.sin(2 * jnp.pi * t) * jnp.ones((4, 1, 13, 2))
        w = []
        for i in range(5):
            state, metrics = trainer.train_step(state, (mel, real), jax.random.fold_in(rng, i))
            w.append(float(metrics["w_distance"]))
        assert all(np.isfinite(w))

    def test_generate(self, rng):
        trainer = M2SGANTrainer(sample_length=6)
        state = trainer.init_state(rng)
        mel = jax.random.uniform(rng, (1, 540, 128))
        out = trainer.generate(state, mel, rng)
        assert out.shape == (1, 180, 13, 2)

    def test_fused_encoder_and_bf16_sync_step(self, rng):
        """The opt-in fast paths (fused bf16 frozen encoder + bf16 SyncLoss
        ST-GCN) run a finite step that tracks the exact path closely."""
        mel = jax.random.uniform(rng, (2, 6 * 90, 128))
        real = jax.random.uniform(jax.random.fold_in(rng, 1), (2, 180, 13, 2))

        ref = M2SGANTrainer(sample_length=6, critic_iters=2)
        fast = M2SGANTrainer(
            sample_length=6, critic_iters=2,
            music_encoder_impl="pallas", sync_encoder_dtype="bfloat16",
            sync_encoder_impl="pallas",
        )
        s_ref = ref.init_state(rng)
        s_fast = fast.init_state(rng)
        s_ref, m_ref = ref.train_step(s_ref, (mel, real), rng)
        s_fast, m_fast = fast.train_step(s_fast, (mel, real), rng)
        for k in m_ref:
            assert np.isfinite(float(m_fast[k])), k
        # same init, same data: the adversarial losses should be close
        assert abs(float(m_ref["w_distance"]) - float(m_fast["w_distance"])) < 0.05

    def test_train_music_encoder_flag(self, rng):
        """Reference `--train_music_encoder` (`M2SGAN_train.py:63-64,179`):
        unfrozen, the transferred encoder receives generator updates; frozen
        (default), it stays bit-identical."""
        mel = jax.random.uniform(rng, (2, 6 * 90, 128))
        real = jax.random.uniform(jax.random.fold_in(rng, 1), (2, 180, 13, 2))

        def first_leaf(state):
            return np.asarray(
                jax.tree_util.tree_leaves(state.g_params["music_encoder"])[0]
            )

        frozen = M2SGANTrainer(sample_length=6, critic_iters=1)
        s = frozen.init_state(rng)
        before = first_leaf(s)
        s, _ = frozen.train_step(s, (mel, real), rng)
        np.testing.assert_array_equal(first_leaf(s), before)

        trainable = M2SGANTrainer(
            sample_length=6, critic_iters=1, train_music_encoder=True
        )
        s = trainable.init_state(rng)
        before = first_leaf(s)
        s, metrics = trainable.train_step(s, (mel, real), rng)
        assert np.abs(first_leaf(s) - before).max() > 0
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k

    def test_train_music_encoder_bf16_packed_step(self, rng):
        """The TPU-first trainable-encoder configuration (what "auto"
        resolves to on TPU: bf16 generator + packed conv kernels — the f32
        conv temps at the reference batch exceed v5e HBM, see the trainer's
        compute_dtype note): one step is finite, updates the encoder, and
        its w_distance tracks the f32/lax step from the same init."""
        mel = jax.random.uniform(rng, (2, 6 * 90, 128))
        real = jax.random.uniform(jax.random.fold_in(rng, 1), (2, 180, 13, 2))

        ref = M2SGANTrainer(
            sample_length=6, critic_iters=1, train_music_encoder=True
        )
        fast = M2SGANTrainer(
            sample_length=6, critic_iters=1, train_music_encoder=True,
            music_conv_impl="pallas_train", compute_dtype="bfloat16",
        )
        assert str(fast.G.dtype) == "bfloat16"
        s_ref = ref.init_state(rng)
        s_fast = fast.init_state(rng)

        def first_leaf(state):
            return np.asarray(
                jax.tree_util.tree_leaves(state.g_params["music_encoder"])[0]
            )

        before = first_leaf(s_fast)
        s_ref, m_ref = ref.train_step(s_ref, (mel, real), rng)
        s_fast, m_fast = fast.train_step(s_fast, (mel, real), rng)
        for k, v in m_fast.items():
            assert np.isfinite(float(v)), k
        assert np.abs(first_leaf(s_fast) - before).max() > 0
        assert abs(float(m_ref["w_distance"]) - float(m_fast["w_distance"])) < 0.05

    def test_train_music_encoder_rejects_pallas_encoder(self, rng):
        import pytest

        with pytest.raises(ValueError):
            M2SGANTrainer(train_music_encoder=True, music_encoder_impl="pallas")

    def test_cached_features_step_matches_uncached(self, rng):
        """`cached_features=True` feeds the precomputed frozen-encoder
        output directly (the stage-2 cache design applied to the GAN stage,
        r4); with identical init and the SAME features the step must
        reproduce the uncached step's metrics to float tolerance — the
        cache boundary sits strictly before everything trainable."""
        mel = jax.random.uniform(rng, (2, 6 * 90, 128))
        real = jax.random.uniform(jax.random.fold_in(rng, 1), (2, 180, 13, 2))

        ref = M2SGANTrainer(sample_length=6, critic_iters=2)
        cached = M2SGANTrainer(sample_length=6, critic_iters=2,
                               cached_features=True)
        s_ref = ref.init_state(rng)
        s_cached = cached.init_state(rng)
        g_vars = {"params": s_ref.g_params, "batch_stats": s_ref.g_batch_stats}
        feats = ref._music_features(g_vars, mel)

        s_ref, m_ref = ref.train_step(s_ref, (mel, real), rng)
        s_cached, m_cached = cached.train_step(s_cached, (feats, real), rng)
        for k in m_ref:
            np.testing.assert_allclose(
                float(m_cached[k]), float(m_ref[k]), rtol=1e-5, atol=1e-6,
            )
        # and the updated generator parameters agree
        la = jax.tree_util.tree_leaves(s_ref.g_params)
        lb = jax.tree_util.tree_leaves(s_cached.g_params)
        for a, b in zip(la, lb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_cached_features_rejects_trainable_encoder(self):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            M2SGANTrainer(cached_features=True, train_music_encoder=True)

    def test_cached_sync_latents_step_matches_uncached(self, rng):
        """`cached_sync_latents=True` feeds precomputed frozen SyncLoss
        latents of the REAL motion (the other data-deterministic frozen
        forward in the step, r4); with the cache produced by the trainer's
        own `sync_latent_fn` the step must reproduce the uncached metrics
        and generator update to float tolerance."""
        mel = jax.random.uniform(rng, (2, 6 * 90, 128))
        real = jax.random.uniform(jax.random.fold_in(rng, 1), (2, 180, 13, 2))

        ref = M2SGANTrainer(sample_length=6, critic_iters=2)
        cached = M2SGANTrainer(sample_length=6, critic_iters=2,
                               cached_sync_latents=True)
        s_ref = ref.init_state(rng)
        s_cached = cached.init_state(rng)
        # the cache stores f32 of the latent fn's output (numpy cannot hold
        # bf16) — replicate that round trip here
        lat = jnp.asarray(np.asarray(
            ref.sync_latent_fn(s_ref.sync_variables)(real), np.float32
        ))

        s_ref, m_ref = ref.train_step(s_ref, (mel, real), rng)
        s_cached, m_cached = cached.train_step(s_cached, (mel, real, lat), rng)
        for k in m_ref:
            np.testing.assert_allclose(
                float(m_cached[k]), float(m_ref[k]), rtol=1e-5, atol=1e-6,
            )
        la = jax.tree_util.tree_leaves(s_ref.g_params)
        lb = jax.tree_util.tree_leaves(s_cached.g_params)
        for a, b in zip(la, lb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_generate_from_features_matches_full(self, rng):
        """`generate(..., from_features=True)` (the cached-features training
        loop's plotting path) equals the full mel path given that path's own
        frozen-encoder output.  Regression: the CLI used to hand cached
        features to the raw-mel entry point, which crashes on shape."""
        trainer = M2SGANTrainer(sample_length=6)
        state = trainer.init_state(rng)
        mel = jax.random.uniform(rng, (2, 6 * 90, 128))
        g_vars = {"params": state.g_params, "batch_stats": state.g_batch_stats}
        feats = trainer._music_features(g_vars, mel)
        full = trainer.generate(state, mel, rng)
        from_feats = trainer.generate(state, feats, rng, from_features=True)
        np.testing.assert_allclose(
            np.asarray(from_feats), np.asarray(full), rtol=1e-6, atol=1e-7
        )
