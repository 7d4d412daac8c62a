"""Fused whole-layer Pallas sampling path: parity with the flax denoiser
(interpret mode on CPU — same kernel code path as TPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conductor_tpu.config import Config, DenoiserConfig
from conductor_tpu.train.ddpm_trainer import DDPMTrainer, make_denoiser
from conductor_tpu.train.fused_denoiser import FusedDenoiser, expand_block_diag


@pytest.fixture(scope="module")
def setup():
    cfg = Config(
        denoiser=DenoiserConfig(
            num_frames=40, latent_dim=32, ff_size=16, num_layers=2, num_heads=4
        )
    )
    model = make_denoiser(cfg)
    rng = jax.random.PRNGKey(0)
    B, T = 2, 40
    mel = jax.random.uniform(jax.random.PRNGKey(1), (B, T * 3, 128))
    x = jax.random.normal(jax.random.PRNGKey(2), (B, T, 26))
    t = jnp.array([7, 900])
    variables = model.init({"params": rng}, mel, x, t, method=model.init_with_music)
    return cfg, model, variables, mel, x, t


def test_expand_block_diag():
    kv = jnp.arange(2 * 2 * 3 * 3, dtype=jnp.float32).reshape(2, 2, 3, 3)
    full = expand_block_diag(kv)
    assert full.shape == (2, 6, 6)
    np.testing.assert_array_equal(np.asarray(full[0, :3, :3]), np.asarray(kv[0, 0]))
    np.testing.assert_array_equal(np.asarray(full[0, 3:, 3:]), np.asarray(kv[0, 1]))
    assert float(jnp.abs(full[0, :3, 3:]).max()) == 0.0


def test_fused_matches_flax_denoise(setup):
    cfg, model, variables, mel, x, t = setup
    xf_proj, xf_out = model.apply(variables, mel, method=model.encode_music)
    cond = model.apply(variables, xf_proj, xf_out, method=model.precompute_cond)
    want = model.apply(variables, x, t, cond, None, method=model.denoise)

    fused = FusedDenoiser(variables["params"], cfg)
    got = fused(x, t, fused.prepare_cond(cond))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_fused_generate_end_to_end():
    """DDPMTrainer.generate with layer_impl=pallas_fused matches the flax
    path bit-for-bit-ish on the same rng."""
    base = Config(
        denoiser=DenoiserConfig(
            num_frames=32, latent_dim=32, ff_size=16, num_layers=2, num_heads=4
        ),
    )
    base = base.replace(
        diffusion=dataclasses.replace(base.diffusion, steps=8, schedule="cosine"),
        train=dataclasses.replace(base.train, sample_length=1),
    )
    rng = jax.random.PRNGKey(0)
    mel = jax.random.uniform(jax.random.PRNGKey(1), (1, 96, 128))

    tr_flax = DDPMTrainer(base)
    state = tr_flax.init_state(rng)
    out_flax = tr_flax.generate(state, mel, rng)

    cfg_fused = base.replace(
        denoiser=dataclasses.replace(base.denoiser, layer_impl="pallas_fused")
    )
    tr_fused = DDPMTrainer(cfg_fused)
    out_fused = tr_fused.generate(state, mel, rng)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_flax), atol=5e-4
    )


def test_fused_generate_respaced_matches_flax():
    """DDIM respacing (generate(num_steps=K)) through the fused all-kernel
    path must match the flax sampler on the same rng.  Regression: the
    respaced schedule used to be built inside the jitted generate, turning
    its tables into tracers and crashing ddim_affine_tables' numpy math."""
    base = Config(
        denoiser=DenoiserConfig(
            num_frames=32, latent_dim=32, ff_size=16, num_layers=2, num_heads=4
        ),
    )
    base = base.replace(
        diffusion=dataclasses.replace(base.diffusion, steps=16, schedule="cosine"),
        train=dataclasses.replace(base.train, sample_length=1),
    )
    rng = jax.random.PRNGKey(0)
    mel = jax.random.uniform(jax.random.PRNGKey(1), (1, 96, 128))

    tr_flax = DDPMTrainer(base)
    state = tr_flax.init_state(rng)
    out_flax = tr_flax.generate(state, mel, rng, num_steps=4)

    cfg_fused = base.replace(
        denoiser=dataclasses.replace(base.denoiser, layer_impl="pallas_fused")
    )
    out_fused = DDPMTrainer(cfg_fused).generate(state, mel, rng, num_steps=4)
    assert np.asarray(out_fused).shape == np.asarray(out_flax).shape
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_flax), atol=5e-4
    )


def test_affine_tables_match_ddim_step():
    """alpha*x0 + beta*x_t must equal the generic ddim_step (eta=0, START_X)."""
    from conductor_tpu.diffusion.gaussian import MeanType
    from conductor_tpu.diffusion.sampling import ddim_step
    from conductor_tpu.diffusion.schedule import make_schedule
    from conductor_tpu.ops.pallas_sampler import ddim_affine_tables

    sched = make_schedule("cosine", 16)
    alpha, beta = ddim_affine_tables(sched)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 8, 26))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 26))

    for t_scalar in (0, 7, 15):
        t = jnp.full((2,), t_scalar)
        want, _ = ddim_step(
            sched, lambda xx, tt: x0, x, t, rng, mean_type=MeanType.START_X
        )
        got = alpha[t_scalar] * x0 + beta[t_scalar] * x
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_ddim_fast_path_matches_generic():
    """The all-kernel ddim_sample must equal the generic scan sampler driving
    FusedDenoiser.__call__ (same rng)."""
    base = Config(
        denoiser=DenoiserConfig(
            num_frames=32, latent_dim=32, ff_size=16, num_layers=2, num_heads=4,
            layer_impl="pallas_fused",
        ),
    )
    base = base.replace(
        diffusion=dataclasses.replace(base.diffusion, steps=8, schedule="cosine"),
        train=dataclasses.replace(base.train, sample_length=1),
    )
    rng = jax.random.PRNGKey(0)
    mel = jax.random.uniform(jax.random.PRNGKey(1), (1, 96, 128))

    tr = DDPMTrainer(base)
    state = tr.init_state(rng)
    out_fast = tr.generate(state, mel, rng)  # ddim + guidance 1 -> fast path

    # the flax path through the generic scan sampler is the oracle
    cfg_flax = base.replace(
        denoiser=dataclasses.replace(base.denoiser, layer_impl="flax")
    )
    out_ref = DDPMTrainer(cfg_flax).generate(state, mel, rng)
    np.testing.assert_allclose(
        np.asarray(out_fast), np.asarray(out_ref), atol=5e-4
    )


def test_fused_int8_adaln_bounded_drift(setup):
    """sampler_adaln_int8 (serving fast path): the AdaLN modulation matmul on
    the MXU int8 path must stay within a small bounded drift of the exact
    path — weights quantized per-column, activations per-row (measured on
    v5e: ~0.8% of output scale at the real shapes, 1.33x step speedup)."""
    cfg, model, variables, mel, x, t = setup
    xf_proj, xf_out = model.apply(variables, mel, method=model.encode_music)
    cond = model.apply(variables, xf_proj, xf_out, method=model.precompute_cond)

    exact = FusedDenoiser(variables["params"], cfg)
    int8_cfg = cfg.replace(
        denoiser=dataclasses.replace(cfg.denoiser, sampler_adaln_int8=True)
    )
    fast = FusedDenoiser(variables["params"], int8_cfg)
    assert fast.adaln_w.dtype == jnp.int8

    ref = np.asarray(exact(x, t, exact.prepare_cond(cond)))
    got = np.asarray(fast(x, t, fast.prepare_cond(cond)))
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() <= 0.02 * scale, (
        f"int8-adaln drift {np.abs(got - ref).max():.4g} vs scale {scale:.4g}"
    )


def test_fused_ddim_int8_adaln_bounded_drift():
    """The all-kernel DDIM ladder with int8 AdaLN (prologue-quantized
    activations) stays within a bounded drift of the flax sampler."""
    base = Config(
        denoiser=DenoiserConfig(
            num_frames=32, latent_dim=32, ff_size=16, num_layers=2, num_heads=4,
        ),
    )
    base = base.replace(
        diffusion=dataclasses.replace(base.diffusion, steps=8, schedule="cosine"),
        train=dataclasses.replace(base.train, sample_length=1),
    )
    rng = jax.random.PRNGKey(0)
    mel = jax.random.uniform(jax.random.PRNGKey(1), (1, 96, 128))

    tr_ref = DDPMTrainer(base)
    state = tr_ref.init_state(rng)
    out_ref = np.asarray(tr_ref.generate(state, mel, rng))

    cfg_int8 = base.replace(
        denoiser=dataclasses.replace(
            base.denoiser, layer_impl="pallas_fused", sampler_adaln_int8=True
        )
    )
    out_int8 = np.asarray(DDPMTrainer(cfg_int8).generate(state, mel, rng))
    scale = np.abs(out_ref).max()
    assert np.abs(out_int8 - out_ref).max() <= 0.03 * scale, (
        f"int8 ladder drift {np.abs(out_int8 - out_ref).max():.4g} "
        f"vs scale {scale:.4g}"
    )


def test_fused_bf16_vpu_bounded_drift(setup):
    """sampler_vpu_dtype='bfloat16' (serving fast path): the denoiser output
    must stay within bf16-resolution drift of the exact f32-VPU path —
    transcendentals run packed-bf16 while LN stats and the time softmax stay
    f32 (ops/pallas_layer._layer_body docstring)."""
    cfg, model, variables, mel, x, t = setup
    xf_proj, xf_out = model.apply(variables, mel, method=model.encode_music)
    cond = model.apply(variables, xf_proj, xf_out, method=model.precompute_cond)

    exact = FusedDenoiser(variables["params"], cfg)
    fast_cfg = cfg.replace(
        denoiser=dataclasses.replace(cfg.denoiser, sampler_vpu_dtype="bfloat16")
    )
    fast = FusedDenoiser(variables["params"], fast_cfg)

    ref = np.asarray(exact(x, t, exact.prepare_cond(cond)))
    got = np.asarray(fast(x, t, fast.prepare_cond(cond)))
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() <= 0.02 * scale, (
        f"bf16-vpu drift {np.abs(got - ref).max():.4g} vs scale {scale:.4g}"
    )
