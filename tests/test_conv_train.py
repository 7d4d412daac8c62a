"""Trainable packed conv/pool kernels: forward AND gradient parity with the
XLA reference ops, plus whole-encoder and trainer-step parity for the
`conv_impl="pallas_train"` path (interpret mode on CPU — same kernel code
path as TPU).

Reference semantics: reflect-padded Conv2d(3,3) + BN + ReLU + residual and
the three max-pool stages of `Contrastive_Stage/models/MusicEncoder.py:5-53`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from conductor_tpu.models.music_encoder import MusicEncoder
from conductor_tpu.ops.conv_train import conv3x3_train
from conductor_tpu.ops.pallas_pool import max_pool_train


def _ref_conv(x4, kernel):
    xp = jnp.pad(x4, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        xp, kernel, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


CONV_CASES = [
    # (B, T, F, Cin, Cout) — first block, mid block, widening block
    (1, 8, 128, 1, 16),
    (2, 12, 16, 16, 16),
    (2, 12, 16, 16, 32),
    (2, 10, 32, 32, 32),
]


@pytest.mark.parametrize("b,t,f,cin,cout", CONV_CASES)
def test_conv_forward_matches_xla(b, t, f, cin, cout):
    ks = jax.random.split(jax.random.PRNGKey(f + cin), 2)
    x = jax.random.normal(ks[0], (b, t, f, cin))
    kernel = jax.random.normal(ks[1], (3, 3, cin, cout)) * 0.2
    want = _ref_conv(x, kernel)
    got = conv3x3_train(x.reshape(b, t, f * cin), kernel)
    np.testing.assert_allclose(
        np.asarray(got.reshape(b, t, f, cout)), np.asarray(want),
        atol=1e-5, rtol=1e-5,
    )


@pytest.mark.parametrize("b,t,f,cin,cout", CONV_CASES)
def test_conv_vjp_matches_xla(b, t, f, cin, cout):
    """d(input) (transposed conv + reflect-adjoint edge folds) and d(kernel)
    (packed matmuls + offset-eye fold) against XLA's conv gradients."""
    ks = jax.random.split(jax.random.PRNGKey(13 * f + cin), 3)
    x = jax.random.normal(ks[0], (b, t, f, cin))
    kernel = jax.random.normal(ks[1], (3, 3, cin, cout)) * 0.2
    dy = jax.random.normal(ks[2], (b, t, f, cout))

    _, vjp_ref = jax.vjp(_ref_conv, x, kernel)
    dx_want, dw_want = vjp_ref(dy)
    _, vjp_got = jax.vjp(conv3x3_train, x.reshape(b, t, f * cin), kernel)
    dx_got, dw_got = vjp_got(dy.reshape(b, t, f * cout))

    scale = float(np.abs(np.asarray(dx_want)).max())
    np.testing.assert_allclose(
        np.asarray(dx_got.reshape(b, t, f, cin)), np.asarray(dx_want),
        atol=1e-5 * max(scale, 1.0), rtol=2e-5,
    )
    wscale = float(np.abs(np.asarray(dw_want)).max())
    np.testing.assert_allclose(
        np.asarray(dw_got), np.asarray(dw_want),
        atol=2e-5 * max(wscale, 1.0), rtol=2e-5,
    )


@pytest.mark.parametrize("b,t,f,cin,cout", CONV_CASES[:2])
def test_dkernel_pallas_matches_xla_impl(b, t, f, cin, cout):
    """The grid-accumulated Pallas d(kernel) contraction (the default) and
    the materialized-halo XLA einsum fallback must produce identical dWbig —
    both reduce sum_{B,T,FB} halo(x)[t+dt]^T dy[t] over the same reflect-
    extended grid, differing only in where the halo tensor lives."""
    from conductor_tpu.ops import conv_train

    ks = jax.random.split(jax.random.PRNGKey(7 * f + cout), 3)
    x = jax.random.normal(ks[0], (b, t, f * cin))
    kernel = jax.random.normal(ks[1], (3, 3, cin, cout)) * 0.2
    dy = jax.random.normal(ks[2], (b, t, f * cout))

    grads = {}
    for impl in ("pallas", "xla"):
        conv_train.set_dkernel_impl(impl)
        try:
            _, vjp = jax.vjp(conv3x3_train, x, kernel)
            grads[impl] = np.asarray(vjp(dy)[1])
        finally:
            conv_train.set_dkernel_impl("pallas")
    scale = max(float(np.abs(grads["xla"]).max()), 1.0)
    np.testing.assert_allclose(
        grads["pallas"], grads["xla"], atol=1e-5 * scale, rtol=1e-5
    )


POOLS = [
    # (C, F, T, window, strides, padding) — the encoder's three pool stages
    (16, 128, 36, (5, 5), (1, 2), ((2, 2), (2, 2))),
    (32, 64, 36, (5, 5), (3, 2), ((2, 2), (2, 2))),
    (32, 32, 12, (3, 3), (1, 2), ((1, 1), (1, 1))),
]


@pytest.mark.parametrize("c,f,t,window,strides,padding", POOLS)
def test_pool_train_forward_matches_flax(c, f, t, window, strides, padding):
    x = jax.random.normal(jax.random.PRNGKey(c + t), (2, t, f, c))
    want = nn.max_pool(x, window, strides=strides, padding=padding)
    got = max_pool_train(
        x.reshape(2, t, f * c), f, c, window, strides, padding
    )
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(want.reshape(2, -1, (f // 2) * c))
    )


@pytest.mark.parametrize("c,f,t,window,strides,padding", POOLS)
def test_pool_train_grad_matches_flax(c, f, t, window, strides, padding):
    """Backward parity on untied inputs (continuous random values — every
    window has a unique max, so tie order can't differ)."""
    ks = jax.random.split(jax.random.PRNGKey(3 * c + t), 2)
    x = jax.random.normal(ks[0], (2, t, f, c))

    ref = lambda x4: nn.max_pool(x4, window, strides=strides, padding=padding)
    y_want, vjp_ref = jax.vjp(ref, x)
    dy = jax.random.normal(ks[1], y_want.shape)
    (dx_want,) = vjp_ref(dy)

    op = lambda xf: max_pool_train(xf, f, c, window, strides, padding)
    _, vjp_got = jax.vjp(op, x.reshape(2, t, f * c))
    (dx_got,) = vjp_got(dy.reshape(2, dy.shape[1], -1))
    np.testing.assert_allclose(
        np.asarray(dx_got.reshape(x.shape)), np.asarray(dx_want),
        atol=1e-6, rtol=1e-6,
    )


def test_pool_train_grad_ties_conservative():
    """On tied plateaus (post-ReLU zeros) the first-max backward routes each
    output cotangent to exactly ONE input — the gradient mass is conserved,
    where compare-add schemes would multiply-count every tied element."""
    c, f, t = 16, 128, 12
    window, strides, padding = (5, 5), (1, 2), ((2, 2), (2, 2))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, t, f, c))
    x = jnp.round(jnp.maximum(x, 0.0) * 2) / 2  # heavy exact ties incl. 0

    op = lambda xf: max_pool_train(xf, f, c, window, strides, padding)
    y, vjp = jax.vjp(op, x.reshape(1, t, f * c))
    dy = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), y.shape))
    (dx,) = vjp(dy)
    np.testing.assert_allclose(
        float(dx.sum()), float(dy.sum()), rtol=1e-6
    )


class TestPackedEncoder:
    def _mel(self, b=2, t=18):
        return jax.random.normal(jax.random.PRNGKey(7), (b, t, 128))

    def _encoders(self):
        return MusicEncoder(), MusicEncoder(conv_impl="pallas_train")

    def test_init_trees_identical(self, rng):
        """Same module paths -> flax derives the same param RNGs: the packed
        path initializes to the SAME values, so checkpoints and the torch
        importer are impl-agnostic."""
        lax_enc, packed = self._encoders()
        mel = self._mel()
        va = lax_enc.init(rng, mel)
        vb = packed.init(rng, mel)
        ja, jb = jax.tree_util.tree_structure(va), jax.tree_util.tree_structure(vb)
        assert ja == jb
        for a, b in zip(jax.tree_util.tree_leaves(va), jax.tree_util.tree_leaves(vb)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_train_forward_and_stats_parity(self, rng):
        lax_enc, packed = self._encoders()
        mel = self._mel()
        variables = lax_enc.init(rng, mel)
        ya, mut_a = lax_enc.apply(variables, mel, True, mutable=["batch_stats"])
        yb, mut_b = packed.apply(variables, mel, True, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), atol=2e-4)
        for a, b in zip(
            jax.tree_util.tree_leaves(mut_a), jax.tree_util.tree_leaves(mut_b)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_eval_forward_parity(self, rng):
        lax_enc, packed = self._encoders()
        mel = self._mel()
        variables = lax_enc.init(rng, mel)
        ya = lax_enc.apply(variables, mel, False)
        yb = packed.apply(variables, mel, False)
        np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), atol=2e-4)

    def test_features_parity(self, rng):
        """features() (GAN feature-matching + logging consumer) flattens to
        the same (freq-major, channel-minor) order on both impls."""
        lax_enc, packed = self._encoders()
        mel = self._mel()
        variables = lax_enc.init(rng, mel)
        fa = lax_enc.apply(variables, mel, False, method=lax_enc.features)
        fb = packed.apply(variables, mel, False, method=packed.features)
        assert len(fa) == len(fb)
        for a, b in zip(fa, fb):
            assert a.shape == b.shape
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

    def test_grad_parity(self, rng):
        """End-to-end gradient through conv+BN(batch stats)+relu+residual+
        pool stack matches the lax path to float-reassociation tolerance."""
        lax_enc, packed = self._encoders()
        mel = self._mel()
        variables = lax_enc.init(rng, mel)
        tgt = jax.random.normal(jax.random.PRNGKey(3), (2, 6, 64))

        def mk_loss(enc):
            def loss(params):
                y, _ = enc.apply(
                    {"params": params, "batch_stats": variables["batch_stats"]},
                    mel, True, mutable=["batch_stats"],
                )
                return jnp.mean((y - tgt) ** 2)
            return loss

        la, ga = jax.value_and_grad(mk_loss(lax_enc))(variables["params"])
        lb, gb = jax.value_and_grad(mk_loss(packed))(variables["params"])
        np.testing.assert_allclose(float(la), float(lb), rtol=1e-5)
        leaves_a = jax.tree_util.tree_leaves(ga)
        leaves_b = jax.tree_util.tree_leaves(gb)
        gmax = max(float(np.abs(np.asarray(g)).max()) for g in leaves_a)
        for a, b in zip(leaves_a, leaves_b):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=0.002 * gmax
            )

    def test_bf16_runs_and_tracks_f32(self, rng):
        """The bf16 packed path (the production training config) stays within
        bf16 resolution of the f32 packed path."""
        f32 = MusicEncoder(conv_impl="pallas_train")
        b16 = MusicEncoder(conv_impl="pallas_train", dtype=jnp.bfloat16)
        mel = self._mel()
        variables = f32.init(rng, mel)
        ya, _ = f32.apply(variables, mel, True, mutable=["batch_stats"])
        yb, _ = b16.apply(variables, mel, True, mutable=["batch_stats"])
        scale = float(np.abs(np.asarray(ya)).max())
        diff = np.abs(np.asarray(ya) - np.asarray(yb, dtype=np.float32))
        # bf16 drift through 7 conv+BN blocks: small on average, bounded at
        # the tail (BN's std division amplifies relative error pointwise)
        assert float(diff.mean()) < 0.02 * scale
        assert float(diff.max()) < 0.15 * scale


class TestMeshParity:
    def test_packed_encoder_sharded_matches_single(self, rng):
        """The packed Pallas encoder under data-parallel GSPMD sharding on
        the virtual 8-device mesh reproduces the single-device forward —
        pallas_call partitions along the batch grid dimension.  (The full
        trainer step was validated the same way off-CI: one M2SNet
        train_step on a 2-device CPU mesh matches single-device loss
        exactly; interpret-mode grad makes that too slow for the suite.)"""
        from conductor_tpu.parallel import make_mesh, replicate, shard_batch

        assert len(jax.devices()) == 8
        enc = MusicEncoder(conv_impl="pallas_train")
        mel = jax.random.normal(jax.random.PRNGKey(5), (8, 18, 128))
        variables = enc.init(rng, mel)
        want = enc.apply(variables, mel, False)

        mesh = make_mesh(data=8)
        with mesh:
            v_rep = replicate(variables, mesh)
            (mel_s,) = shard_batch((mel,), mesh)
            got = jax.jit(
                lambda v, m: enc.apply(v, m, False)
            )(v_rep, mel_s)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5
        )


class TestTrainerStepParity:
    def test_m2snet_step_parity(self, rng):
        """One jitted M2SNetTrainer step with music_conv_impl='pallas_train'
        matches the lax step: same loss/metrics, params equal to
        reassociation tolerance after the Adam update."""
        from conductor_tpu.train.m2snet_trainer import M2SNetTrainer

        base = M2SNetTrainer(sample_length=6, clip_length=2)
        packed = M2SNetTrainer(
            sample_length=6, clip_length=2, music_conv_impl="pallas_train"
        )
        state_a = base.init_state(rng)
        state_b = packed.init_state(rng)
        for a, b in zip(
            jax.tree_util.tree_leaves(state_a.params),
            jax.tree_util.tree_leaves(state_b.params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

        ks = jax.random.split(jax.random.PRNGKey(11), 2)
        music = jax.random.normal(ks[0], (2, 6 * 90, 128))
        motion = jax.random.normal(ks[1], (2, 6 * 30, 13, 2))
        sa, ma = base.train_step(state_a, (music, motion), rng, "easy")
        sb, mb = packed.train_step(state_b, (music, motion), rng, "easy")
        np.testing.assert_allclose(
            float(ma["loss"]), float(mb["loss"]), rtol=1e-4
        )
        np.testing.assert_allclose(
            float(ma["accuracy"]), float(mb["accuracy"]), atol=1e-6
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(sa.params),
            jax.tree_util.tree_leaves(sb.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-3
            )
