"""Diffusion engine unit tests: schedules, q/p math, samplers, respacing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conductor_tpu.diffusion import (
    MeanType,
    VarType,
    ddim_reverse_sample_loop,
    ddim_sample_loop,
    get_named_beta_schedule,
    make_schedule,
    p_sample_loop,
    predict_eps_from_xstart,
    predict_xstart_from_eps,
    q_posterior_mean_variance,
    q_sample,
    respaced_schedule,
    schedule_from_betas,
    space_timesteps,
    training_losses,
)
from conductor_tpu.diffusion import timestep_samplers as ts


class TestSchedules:
    def test_linear_schedule_endpoints(self):
        betas = get_named_beta_schedule("linear", 1000)
        assert betas.shape == (1000,)
        np.testing.assert_allclose(betas[0], 1e-4, rtol=1e-12)
        np.testing.assert_allclose(betas[-1], 0.02, rtol=1e-12)

    def test_linear_schedule_scales_with_steps(self):
        betas = get_named_beta_schedule("linear", 100)
        np.testing.assert_allclose(betas[0], 1e-3, rtol=1e-12)
        np.testing.assert_allclose(betas[-1], 0.2, rtol=1e-12)

    def test_cosine_schedule_bounds(self):
        betas = get_named_beta_schedule("cosine", 1000)
        assert (betas > 0).all() and (betas <= 0.999).all()

    def test_posterior_identities(self):
        sched = make_schedule("linear", 1000)
        # posterior_variance[t] = beta_t (1 - acp_{t-1}) / (1 - acp_t)
        betas = np.asarray(sched.betas)
        acp = np.asarray(sched.alphas_cumprod)
        acp_prev = np.append(1.0, acp[:-1])
        np.testing.assert_allclose(
            np.asarray(sched.posterior_variance),
            betas * (1 - acp_prev) / (1 - acp),
            rtol=1e-3,  # f32 tables vs f64 recompute
        )
        # coef1 + coef2*sqrt(alpha_t) relationship: posterior mean of x0=xt=1 is 1
        # (the posterior mean coefficients sum appropriately at x0 == xt == c)
        m, _, _ = q_posterior_mean_variance(
            sched, jnp.ones((1, 1)), jnp.ones((1, 1)), jnp.array([500])
        )
        assert np.isfinite(float(m[0, 0]))

    def test_alphas_monotone(self):
        sched = make_schedule("linear", 1000)
        acp = np.asarray(sched.alphas_cumprod)
        assert (np.diff(acp) < 0).all()
        assert acp[-1] < 1e-4  # near-pure noise at t=T


class TestQSample:
    def test_q_sample_statistics(self, rng):
        sched = make_schedule("linear", 1000)
        x0 = jnp.ones((4096, 8))
        t = jnp.full((4096,), 500)
        noise = jax.random.normal(rng, x0.shape)
        xt = q_sample(sched, x0, t, noise)
        mean = float(xt.mean())
        expected_mean = float(sched.sqrt_alphas_cumprod[500])
        assert abs(mean - expected_mean) < 0.02
        expected_std = float(sched.sqrt_one_minus_alphas_cumprod[500])
        assert abs(float(xt.std()) - expected_std) < 0.02

    def test_x0_eps_roundtrip(self, rng):
        sched = make_schedule("linear", 1000)
        k1, k2 = jax.random.split(rng)
        x0 = jax.random.normal(k1, (8, 16))
        eps = jax.random.normal(k2, (8, 16))
        t = jnp.arange(8) * 100
        xt = q_sample(sched, x0, t, eps)
        x0_rec = predict_xstart_from_eps(sched, xt, t, eps)
        np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-3)
        eps_rec = predict_eps_from_xstart(sched, xt, t, x0)
        np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(eps), atol=1e-3)


class TestSamplers:
    def _identity_model(self, x, t):
        # A "perfect" x0-predicting model for a zero target.
        return jnp.zeros_like(x)

    def test_ddim_converges_to_model_x0(self, rng):
        sched = make_schedule("linear", 50)
        out = ddim_sample_loop(
            sched, self._identity_model, (2, 16, 4), rng,
            mean_type=MeanType.START_X, var_type=VarType.FIXED_SMALL,
        )
        # With x0_pred = 0 everywhere, DDIM converges toward 0.
        assert float(jnp.abs(out).max()) < 0.05

    def test_ancestral_runs_and_shrinks(self, rng):
        sched = make_schedule("linear", 50)
        out = p_sample_loop(
            sched, self._identity_model, (2, 16, 4), rng,
            mean_type=MeanType.START_X, var_type=VarType.FIXED_SMALL,
        )
        assert out.shape == (2, 16, 4)
        assert float(jnp.abs(out).mean()) < 0.5

    def test_ddim_deterministic(self, rng):
        sched = make_schedule("linear", 20)
        noise = jax.random.normal(rng, (1, 8, 4))
        a = ddim_sample_loop(sched, self._identity_model, (1, 8, 4), rng, noise=noise)
        b = ddim_sample_loop(sched, self._identity_model, (1, 8, 4), rng, noise=noise)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_ddim_respacing_close_to_full(self, rng):
        # Exact x0-posterior denoiser for Gaussian data x0 ~ N(0, s^2):
        # E[x0|xt] = s^2 sqrt(acp_t) / (s^2 acp_t + 1 - acp_t) * xt.  DDIM has
        # O(step) discretization error, so the respaced 50-step ladder lands
        # near (not on) the 1000-step result.
        full = make_schedule("linear", 1000)
        s2 = 0.25

        def model(x, t):
            acp = full.alphas_cumprod[t].reshape((-1,) + (1,) * (x.ndim - 1))
            return s2 * jnp.sqrt(acp) / (s2 * acp + 1 - acp) * x

        spaced = respaced_schedule("linear", 1000, space_timesteps(1000, "ddim50"))
        noise = jax.random.normal(rng, (1, 8, 4))
        out_full = ddim_sample_loop(full, model, (1, 8, 4), rng, noise=noise)
        out_spaced = ddim_sample_loop(spaced, model, (1, 8, 4), rng, noise=noise)
        np.testing.assert_allclose(
            np.asarray(out_spaced), np.asarray(out_full), atol=0.1
        )

    def test_respaced_timestep_map_feeds_model_original_scale(self, rng):
        seen = []

        def spy_model(x, t):
            seen.append(t)
            return jnp.zeros_like(x)

        spaced = respaced_schedule("linear", 1000, space_timesteps(1000, "ddim10"))
        _ = ddim_sample_loop(spaced, spy_model, (1, 4, 2), rng)
        # under scan the t values are traced; check the map itself instead
        tmap = np.asarray(spaced.timestep_map)
        assert tmap.min() == 0 and tmap.max() > 800 and len(tmap) == 10

    def test_inpainting_keeps_known_values(self, rng):
        sched = make_schedule("linear", 50)
        known = jnp.ones((1, 8, 4)) * 0.7
        mask = jnp.zeros((1, 8, 4)).at[:, :4].set(1.0)
        out = ddim_sample_loop(
            sched, self._identity_model, (1, 8, 4), rng,
            known_mask=mask, known_x0=known,
        )
        assert out.shape == (1, 8, 4)

    def test_ddim_reverse_then_forward_roundtrip(self, rng):
        model = lambda x, t: 0.9 * x  # contraction, stable both ways
        sched = make_schedule("linear", 100)
        x0 = jax.random.normal(rng, (1, 8, 4)) * 0.1
        xT = ddim_reverse_sample_loop(sched, model, x0)
        x0_rec = ddim_sample_loop(sched, model, (1, 8, 4), rng, noise=xT)
        np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=0.05)


class TestTrainingLosses:
    def test_start_x_target_and_velocity_terms(self, rng):
        sched = make_schedule("linear", 1000)
        B, T = 4, 32
        x0 = jax.random.normal(rng, (B, T, 13, 2)) * 0.1 + 0.5
        noise = jax.random.normal(jax.random.fold_in(rng, 1), (B, T, 13, 2))
        t = jnp.array([0, 100, 500, 999])
        model = lambda x, tt: x.reshape(B, T, 26) * 0.0  # predicts zeros
        terms = training_losses(
            sched, model, x0, t, noise, mean_type=MeanType.START_X
        )
        assert terms["target"].shape == (B, T, 26)
        assert terms["pred"].shape == (B, T, 26)
        np.testing.assert_allclose(
            np.asarray(terms["target"]), np.asarray(x0.reshape(B, T, 26)), rtol=1e-6
        )
        # model output constant zero => its velocity is 0
        assert float(terms["velocity_body"]) == 0.0
        assert float(terms["velocity_elbow"]) == 0.0
        assert float(terms["velocity_head"]) == 0.0
        # mse = mean over (T, C) of x0^2 per batch elem
        expected = np.mean(np.asarray(x0.reshape(B, T, 26)) ** 2, axis=(1, 2))
        np.testing.assert_allclose(np.asarray(terms["mse"]), expected, rtol=1e-5)

    def test_epsilon_target(self, rng):
        sched = make_schedule("linear", 1000)
        x0 = jax.random.normal(rng, (2, 8, 13, 2))
        noise = jax.random.normal(jax.random.fold_in(rng, 1), x0.shape)
        t = jnp.array([10, 20])
        model = lambda x, tt: x * 0.0
        terms = training_losses(sched, model, x0, t, noise, mean_type=MeanType.EPSILON)
        np.testing.assert_allclose(
            np.asarray(terms["target"]), np.asarray(noise.reshape(2, 8, 26)), rtol=1e-6
        )


class TestTimestepSamplers:
    def test_uniform(self, rng):
        t, w = ts.uniform_sample(rng, 1000, 512)
        assert t.shape == (512,) and w.shape == (512,)
        assert int(t.min()) >= 0 and int(t.max()) < 1000
        np.testing.assert_array_equal(np.asarray(w), np.ones(512, np.float32))

    def test_loss_aware_uniform_until_warm(self, rng):
        state = ts.init_state(10, history_per_term=2)
        t, w = ts.loss_aware_sample(state, rng, 1000)
        # before warm-up, sampling is uniform => all weights 1
        np.testing.assert_allclose(np.asarray(w), np.ones(1000), rtol=1e-5)

    def test_update_and_importance(self, rng):
        state = ts.init_state(4, history_per_term=2)
        # fill history: timestep 0 has big losses, others small
        t = jnp.array([0, 0, 1, 1, 2, 2, 3, 3])
        losses = jnp.array([10.0, 10.0, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1])
        state = ts.update_state(state, t, losses)
        assert int(state.loss_counts.sum()) == 8
        tt, w = ts.loss_aware_sample(state, rng, 4096)
        frac0 = float((tt == 0).mean())
        assert frac0 > 0.5  # timestep 0 dominates the importance distribution

    def test_ring_buffer_shifts(self):
        state = ts.init_state(2, history_per_term=2)
        state = ts.update_state(state, jnp.array([0, 0, 0]), jnp.array([1.0, 2.0, 3.0]))
        np.testing.assert_allclose(np.asarray(state.loss_history[0]), [2.0, 3.0])
        assert int(state.loss_counts[0]) == 2


class TestVLBTooling:
    """`_prior_bpd` / `calc_bpd_loop` / LossKind wiring
    (`gaussian_diffusion.py:1002-1165`)."""

    def _sched(self, steps=16):
        return make_schedule("cosine", steps)

    def test_prior_bpd_small_for_standard_normal_data(self, rng):
        from conductor_tpu.diffusion import prior_bpd

        sched = self._sched(64)
        x = jax.random.normal(rng, (4, 30, 26))
        pb = prior_bpd(sched, x)
        assert pb.shape == (4,)
        # q(x_T | x_0) is near-standard-normal after the full ladder, so the
        # prior KL in bits should be tiny
        assert float(pb.mean()) < 0.05

    def test_prior_bpd_matches_hand_kl(self, rng):
        from conductor_tpu.diffusion import prior_bpd

        sched = self._sched(8)
        x = jax.random.normal(rng, (2, 5, 4)) * 2.0
        # hand formula: KL(N(sqrt(acp) x, 1-acp) || N(0, 1))
        acp = float(sched.alphas_cumprod[-1])
        mean = np.sqrt(acp) * np.asarray(x)
        var = 1.0 - acp
        kl = 0.5 * (-1.0 - np.log(var) + var + mean**2)
        expected = kl.reshape(2, -1).mean(axis=1) / np.log(2.0)
        np.testing.assert_allclose(np.asarray(prior_bpd(sched, x)), expected, rtol=1e-5)

    def test_calc_bpd_loop_shapes_and_consistency(self, rng):
        from conductor_tpu.diffusion import calc_bpd_loop

        sched = self._sched(12)
        x = jax.random.uniform(rng, (3, 10, 26))

        def perfect_model(x_t, t):
            # an oracle that always predicts the true x0
            return jnp.broadcast_to(x, x_t.shape)

        out = calc_bpd_loop(
            sched, perfect_model, x, rng,
            mean_type=MeanType.START_X, clip_denoised=False,
        )
        assert out["vb"].shape == (3, 12)
        assert out["xstart_mse"].shape == (3, 12)
        assert out["mse"].shape == (3, 12)
        assert out["total_bpd"].shape == (3,)
        np.testing.assert_allclose(
            np.asarray(out["total_bpd"]),
            np.asarray(out["vb"].sum(axis=1) + out["prior_bpd"]),
            rtol=1e-5,
        )
        # the oracle's x0 MSE is exactly zero at every step
        np.testing.assert_allclose(np.asarray(out["xstart_mse"]), 0.0, atol=1e-10)

    def test_calc_bpd_loop_better_model_lower_bpd(self, rng):
        from conductor_tpu.diffusion import calc_bpd_loop

        sched = self._sched(12)
        x = jax.random.uniform(rng, (3, 10, 26))

        good = calc_bpd_loop(
            sched, lambda x_t, t: jnp.broadcast_to(x, x_t.shape), x, rng,
            clip_denoised=False,
        )
        bad = calc_bpd_loop(
            sched, lambda x_t, t: jnp.zeros_like(x_t), x, rng,
            clip_denoised=False,
        )
        assert float(good["total_bpd"].mean()) < float(bad["total_bpd"].mean())

    def test_kl_loss_kinds(self, rng):
        from conductor_tpu.diffusion import LossKind

        sched = self._sched(16)
        x = jax.random.uniform(rng, (2, 10, 26))
        t = jnp.array([3, 9])
        noise = jax.random.normal(jax.random.fold_in(rng, 1), x.shape)

        def model(x_t, tt):
            return x_t * 0.9  # arbitrary but deterministic

        kl = training_losses(
            sched, model, x, t, noise, loss_kind=LossKind.KL
        )
        rkl = training_losses(
            sched, model, x, t, noise, loss_kind=LossKind.RESCALED_KL
        )
        assert kl["loss"].shape == (2,)
        np.testing.assert_allclose(
            np.asarray(rkl["loss"]),
            np.asarray(kl["loss"]) * sched.num_timesteps,
            rtol=1e-6,
        )

    def test_learned_range_vb_term(self, rng):
        """LEARNED_RANGE: output splits in half, the vb term trains the
        variance head, and the mse sees only the mean half
        (`gaussian_diffusion.py:1037-1057`)."""
        from conductor_tpu.diffusion import LossKind

        sched = self._sched(16)
        x = jax.random.uniform(rng, (2, 10, 26))
        t = jnp.array([3, 9])
        noise = jax.random.normal(jax.random.fold_in(rng, 1), x.shape)

        def model(x_t, tt):
            mean = x_t * 0.9
            var_frac = jnp.zeros_like(x_t)  # mid-range interpolation
            return jnp.concatenate([mean, var_frac], axis=-1)

        terms = training_losses(
            sched, model, x, t, noise,
            var_type=VarType.LEARNED_RANGE, loss_kind=LossKind.MSE,
        )
        assert "vb" in terms and terms["vb"].shape == (2,)
        assert terms["pred"].shape == x.shape
        np.testing.assert_allclose(
            np.asarray(terms["mse"]),
            np.asarray(
                ((x - q_sample(sched, x, t, noise) * 0.9) ** 2)
                .reshape(2, -1)
                .mean(axis=1)
            ),
            rtol=1e-5,
        )

        rescaled = training_losses(
            sched, model, x, t, noise,
            var_type=VarType.LEARNED_RANGE, loss_kind=LossKind.RESCALED_MSE,
        )
        np.testing.assert_allclose(
            np.asarray(rescaled["vb"]),
            np.asarray(terms["vb"]) * (sched.num_timesteps / 1000.0),
            rtol=1e-6,
        )
