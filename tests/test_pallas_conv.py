"""Fused conv-block kernel + FusedMusicEncoder: parity with the flax module
(interpret mode on CPU — same kernel code path as TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conductor_tpu.models.music_encoder import Conv2dResBlock, FusedMusicEncoder, MusicEncoder
from conductor_tpu.ops.pallas_conv import fold_bn, fused_conv_block


@pytest.mark.parametrize(
    "cin,cout,residual,res_mode",
    [(1, 16, False, 0), (16, 16, True, 1), (16, 32, True, 2)],
)
def test_block_matches_flax(cin, cout, residual, res_mode):
    rng = jax.random.PRNGKey(cin * 100 + cout)
    # F must be divisible by G = 128 // cin; use 2x the real stage widths
    f = {1: 128, 16: 64, 32: 32}[cin] * 2
    blk = Conv2dResBlock(cout, residual=residual)
    x = jax.random.normal(rng, (2, 12, f, cin))
    variables = blk.init({"params": rng}, x, False)
    # randomize BN stats so folding is actually exercised
    stats = jax.tree_util.tree_map(
        lambda a: a + jax.random.uniform(rng, a.shape) * 0.3 + 0.1,
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}
    want = blk.apply(variables, x, False)

    p, s = variables["params"], variables["batch_stats"]
    scale, bias = fold_bn(
        p["Conv_0"]["bias"], s["BatchNorm_0"]["mean"], s["BatchNorm_0"]["var"],
        p["BatchNorm_0"]["scale"], p["BatchNorm_0"]["bias"],
    )
    kw = dict(kernel=p["Conv_0"]["kernel"], scale=scale, bias=bias, res_mode=res_mode)
    if res_mode == 2:
        rs, rb = fold_bn(
            p["Conv_1"]["bias"], s["BatchNorm_1"]["mean"], s["BatchNorm_1"]["var"],
            p["BatchNorm_1"]["scale"], p["BatchNorm_1"]["bias"],
        )
        kw.update(res_kernel=p["Conv_1"]["kernel"][0, 0], res_scale=rs, res_bias=rb)
    got = fused_conv_block(x, mxu_dtype=jnp.float32, tile=4, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_fused_encoder_matches_flax():
    enc = MusicEncoder()
    rng = jax.random.PRNGKey(0)
    mel = jax.random.uniform(rng, (2, 90, 128))  # 1 s at 90 Hz
    variables = enc.init({"params": rng}, mel, False)
    # run a train step's worth of BN updates so running stats are non-trivial
    _, mutated = enc.apply(variables, mel, True, mutable=["batch_stats"])
    variables = {"params": variables["params"], **mutated}
    want = enc.apply(variables, mel, False)

    fused = FusedMusicEncoder(variables, mxu_dtype=jnp.float32)
    got = fused(mel)
    assert got.shape == want.shape == (2, 30, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4)


def test_generate_with_fused_encoder():
    """End-to-end generate with music_encoder_impl=pallas stays close to the
    flax-encoder path (frozen conditioning tolerates the kernel's rounding)."""
    import dataclasses

    from conductor_tpu.config import Config, DenoiserConfig, DiffusionConfig, TrainConfig
    from conductor_tpu.train.ddpm_trainer import DDPMTrainer

    base = Config(
        denoiser=DenoiserConfig(
            num_frames=32, latent_dim=32, ff_size=16, num_layers=2, num_heads=4
        ),
        diffusion=DiffusionConfig(steps=8, schedule="cosine"),
        train=TrainConfig(batch_size=2, sample_length=1),
    )
    rng = jax.random.PRNGKey(0)
    mel = jax.random.uniform(jax.random.PRNGKey(1), (1, 96, 128))

    tr = DDPMTrainer(base)
    state = tr.init_state(rng)
    out_flax = tr.generate(state, mel, rng)

    cfg_p = base.replace(
        denoiser=dataclasses.replace(base.denoiser, music_encoder_impl="pallas")
    )
    out_pallas = DDPMTrainer(cfg_p).generate(state, mel, rng)
    assert out_pallas.shape == out_flax.shape
    # untrained denoiser amplifies conditioning differences; just bound it
    np.testing.assert_allclose(
        np.asarray(out_pallas), np.asarray(out_flax), atol=0.1
    )
