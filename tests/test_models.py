"""Model zoo tests: shape contracts, graph properties, attention parity,
frozen-encoder gradients, mask semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conductor_tpu.models import (
    M2SNet,
    MotionEncoderSTGCN,
    MotionTransformer,
    MusicEncoder,
    build_adjacency,
    generate_src_mask,
    timestep_embedding,
)
from conductor_tpu.ops import linear_attention, qk_softmax, quadratic_self_attention


class TestGraph:
    def test_uniform_adjacency(self):
        A = build_adjacency("ConductorMotionX", "uniform")
        assert A.shape == (1, 13, 13)
        # column-normalized: every column of the hop<=1 adjacency sums to 1
        np.testing.assert_allclose(A[0].sum(axis=0), np.ones(13), atol=1e-6)

    def test_spatial_partitions(self):
        A = build_adjacency("ConductorMotionX", "spatial")
        assert A.shape[0] == 3  # root, root+close, further
        # partitions sum back to the normalized adjacency
        A_uni = build_adjacency("ConductorMotionX", "uniform")
        np.testing.assert_allclose(A.sum(axis=0), A_uni[0], atol=1e-6)

    def test_distance_partitions(self):
        A = build_adjacency("ConductorMotionX", "distance")
        assert A.shape[0] == 2  # hop 0 and hop 1
        A_uni = build_adjacency("ConductorMotionX", "uniform")
        np.testing.assert_allclose(A.sum(axis=0), A_uni[0], atol=1e-6)

    def test_symmetric_edges(self):
        A = build_adjacency("ConductorMotionX", "uniform")[0]
        assert ((A > 0) == (A > 0).T).all()


class TestMusicEncoder:
    def test_shapes_90_to_30hz(self, rng):
        model = MusicEncoder()
        # 6-s window: 540 mel frames -> 180 motion frames
        mel = jnp.zeros((2, 540, 128))
        variables = model.init(rng, mel)
        out = model.apply(variables, mel)
        assert out.shape == (2, 180, 64)

    def test_features_list(self, rng):
        model = MusicEncoder()
        mel = jnp.zeros((1, 90, 128))
        variables = model.init(rng, mel)
        feats = model.apply(variables, mel, method=model.features)
        assert len(feats) == 5
        assert feats[0].shape == (1, 90, 128)
        assert feats[-1].shape == (1, 30, 64)

    def test_batch_stats_update_in_train(self, rng):
        model = MusicEncoder()
        mel = jax.random.normal(rng, (2, 90, 128))
        variables = model.init(rng, mel)
        _, mutated = model.apply(variables, mel, True, mutable=["batch_stats"])
        # training mode must update running statistics
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(mutated["batch_stats"])
        changed = any(
            not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(before, after)
        )
        assert changed


class TestMotionEncoder:
    def test_shapes(self, rng):
        model = MotionEncoderSTGCN()
        motion = jnp.zeros((2, 180, 13, 2))
        variables = model.init(rng, motion)
        out = model.apply(variables, motion)
        assert out.shape == (2, 180, 64)

    def test_features_stack(self, rng):
        model = MotionEncoderSTGCN()
        motion = jax.random.normal(rng, (1, 60, 13, 2))
        variables = model.init(rng, motion)
        feats = model.apply(variables, motion, method=model.features)
        # input + 10 blocks + final projection = 12
        assert len(feats) == 12
        assert feats[0].shape == (1, 60, 26)
        assert feats[-2].shape == (1, 60, 32 * 13)
        assert feats[-1].shape == (1, 60, 64)

    def test_features_last_matches_forward(self, rng):
        model = MotionEncoderSTGCN()
        motion = jax.random.normal(rng, (1, 30, 13, 2))
        variables = model.init(rng, motion)
        out = model.apply(variables, motion)
        feats = model.apply(variables, motion, method=model.features)
        np.testing.assert_allclose(np.asarray(feats[-1]), np.asarray(out), atol=1e-5)


class TestM2SNet:
    def test_sync_probabilities(self, rng):
        model = M2SNet()
        mel = jax.random.normal(rng, (2, 180, 128))
        motion = jax.random.normal(jax.random.fold_in(rng, 1), (2, 60, 13, 2))
        variables = model.init(rng, mel, motion)
        out = model.apply(variables, mel, motion)
        assert out.shape == (2, 60, 1)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


class TestAttentionOps:
    def test_linear_attention_shapes(self, rng):
        B, T, H, D = 2, 16, 4, 8
        q = jax.nn.softmax(jax.random.normal(rng, (B, T, H, D)), axis=-1)
        k = jax.nn.softmax(jax.random.normal(jax.random.fold_in(rng, 1), (B, T, H, D)), axis=1)
        v = jax.random.normal(jax.random.fold_in(rng, 2), (B, T, H, D))
        y = linear_attention(q, k, v)
        assert y.shape == (B, T, H * D)

    def test_key_mask_zeroes_contribution(self, rng):
        # with mask = 0 beyond T/2, masked positions must not affect output
        B, T, H, D = 1, 8, 2, 4
        q_raw = jax.random.normal(rng, (B, T, H * D))
        k_raw = jax.random.normal(jax.random.fold_in(rng, 1), (B, T, H * D))
        v_raw = jax.random.normal(jax.random.fold_in(rng, 2), (B, T, H * D))
        mask = jnp.ones((B, T, 1)).at[:, T // 2:].set(0.0)

        def run(k_tail):
            k_mod = k_raw.at[:, T // 2:].set(k_tail)
            q, k = qk_softmax(q_raw, k_mod, H, mask)
            v = (v_raw * mask).reshape(B, T, H, D)
            return linear_attention(q, k, v)

        y1 = run(jnp.zeros((B, T - T // 2, H * D)))
        y2 = run(jnp.ones((B, T - T // 2, H * D)) * 5.0)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)

    def test_quadratic_mask(self, rng):
        B, T, D, H = 1, 8, 8, 2
        q = jax.random.normal(rng, (B, T, D))
        k = jax.random.normal(jax.random.fold_in(rng, 1), (B, T, D))
        v = jax.random.normal(jax.random.fold_in(rng, 2), (B, T, D))
        mask = jnp.ones((B, T, 1)).at[:, 4:].set(0.0)
        y1 = quadratic_self_attention(q, k, v, H, mask)
        v2 = v.at[:, 4:].set(99.0)
        y2 = quadratic_self_attention(q, k, v2, H, mask)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-4)


@pytest.fixture(scope="module")
def built_transformer():
    rng = jax.random.PRNGKey(7)
    T = 16
    model = MotionTransformer(
        num_frames=32, latent_dim=32, ff_size=16, num_layers=2, num_heads=4,
    )
    mel = jax.random.normal(rng, (2, T * 3, 128))
    x = jax.random.normal(jax.random.fold_in(rng, 1), (2, T, 26))
    t = jnp.array([10, 500])
    variables = model.init({"params": rng}, mel, x, t, method=model.init_with_music)
    xf_proj, xf_out = model.apply(variables, mel, method=model.encode_music)
    return model, variables, mel, x, t, xf_proj, xf_out


class TestMotionTransformer:
    def _build(self, rng, efficient=True, T=16):
        model = MotionTransformer(
            num_frames=32, latent_dim=32, ff_size=16, num_layers=2, num_heads=4,
            efficient=efficient,
        )
        mel = jax.random.normal(rng, (2, T * 3, 128))
        x = jax.random.normal(jax.random.fold_in(rng, 1), (2, T, 26))
        t = jnp.array([10, 500])
        variables = model.init({"params": rng}, mel, x, t, method=model.init_with_music)
        xf_proj, xf_out = model.apply(variables, mel, method=model.encode_music)
        return model, variables, mel, x, t, xf_proj, xf_out

    def test_forward_shapes(self, built_transformer):
        model, variables, mel, x, t, xf_proj, xf_out = built_transformer
        assert xf_proj.shape == (2, 16, 64)
        out = model.apply(variables, x, t, xf_proj, xf_out)
        assert out.shape == (2, 16, 26)

    def test_zero_init_output_at_start(self, built_transformer):
        # zero-initialized out layer + zero-init stylization/FFN layers mean
        # a fresh model predicts exactly 0 (identity residual stream -> out=0)
        model, variables, mel, x, t, xf_proj, xf_out = built_transformer
        out = model.apply(variables, x, t, xf_proj, xf_out)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)

    def test_quadratic_variant_runs(self, rng):
        model, variables, mel, x, t, xf_proj, xf_out = self._build(rng, efficient=False)
        out = model.apply(variables, x, t, xf_proj, xf_out)
        assert out.shape == (2, 16, 26)

    def test_4d_input_flattened(self, built_transformer):
        model, variables, mel, x, t, xf_proj, xf_out = built_transformer
        x4 = x.reshape(2, 16, 13, 2)
        out = model.apply(variables, x4, t, xf_proj, xf_out)
        assert out.shape == (2, 16, 26)

    def test_music_encoder_frozen(self, built_transformer):
        # gradients through encode_music must be zero for music_encoder params
        model, variables, mel, x, t, xf_proj, xf_out = built_transformer

        def loss(params):
            xf_p, xf_o = model.apply(
                {**variables, "params": params}, mel, method=model.encode_music
            )
            out = model.apply({**variables, "params": params}, x, t, xf_p, xf_o)
            return (out**2).sum() + (xf_p**2).sum()

        g = jax.grad(loss)(variables["params"])
        enc_grads = jax.tree_util.tree_leaves(g["music_encoder"])
        assert all(float(jnp.abs(x).max()) == 0.0 for x in enc_grads)

    def test_cond_dropout_needs_rng_and_changes_output(self, built_transformer):
        model, variables, mel, x, t, xf_proj, xf_out = built_transformer
        p1 = model.apply(
            variables, mel, True, method=model.encode_music,
            rngs={"cond": jax.random.PRNGKey(1)},
        )
        p2 = model.apply(
            variables, mel, True, method=model.encode_music,
            rngs={"cond": jax.random.PRNGKey(2)},
        )
        # different dropout masks -> different conditioning (prob ~1)
        assert not np.allclose(np.asarray(p1[1]), np.asarray(p2[1]))

    def test_src_mask(self):
        m = generate_src_mask(5, jnp.array([2, 5]))
        np.testing.assert_array_equal(
            np.asarray(m[..., 0]), [[1, 1, 0, 0, 0], [1, 1, 1, 1, 1]]
        )

    def test_timestep_embedding_cos_first(self):
        emb = timestep_embedding(jnp.array([0]), 8)
        # at t=0: cos(0)=1 for first half, sin(0)=0 for second half
        np.testing.assert_allclose(np.asarray(emb[0, :4]), np.ones(4), atol=1e-6)
        np.testing.assert_allclose(np.asarray(emb[0, 4:]), np.zeros(4), atol=1e-6)


class TestDenseLaneFormulations:
    """The merged-lane ST-GCN math must equal the direct conv/einsum forms."""

    def test_graph_conv_composition(self, rng):
        from conductor_tpu.models.stgcn import GraphConv

        B, T, V, Cin, K, C = 2, 16, 13, 8, 3, 8
        gc = GraphConv(features=C, spatial_kernel=K)
        x = jax.random.normal(rng, (B, T, V, Cin))
        A = jax.random.uniform(jax.random.PRNGKey(1), (K, V, V))
        variables = gc.init(rng, x, A)
        got = gc.apply(variables, x, A)

        kernel = variables["params"]["kernel"]  # (Cin, K*C)
        bias = variables["params"]["bias"]
        y = jnp.einsum("btvc,ck->btvk", x, kernel) + bias  # pointwise conv
        y = y.reshape(B, T, V, K, C)
        want = jnp.einsum("btvkc,kvw->btwc", y, A)  # reference tgcn.py:64
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    def test_temporal_conv_matches_lax_conv(self, rng):
        from conductor_tpu.models.stgcn import TemporalConv

        B, T, V, Cin, C, kt, stride = 2, 30, 13, 8, 8, 3, 3
        tc = TemporalConv(features=C, kernel_size=kt, stride=stride)
        x = jax.random.normal(rng, (B, T, V, Cin))
        variables = tc.init(rng, x)
        got = tc.apply(variables, x)

        kernel = variables["params"]["kernel"]  # (kt, Cin, C)
        bias = variables["params"]["bias"]
        want = jax.lax.conv_general_dilated(
            x, kernel[:, None],  # (kt, 1, Cin, C)
            window_strides=(stride, 1),
            padding=((1, 1), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4
        )


class TestLSTMGenerators:
    """CVPR-baseline LSTM alternates (`Generator.py:7-31,89-100`)."""

    def test_pose_decoder_bilstm_shapes(self, rng):
        from conductor_tpu.models.generator import PoseDecoderBiLSTM

        model = PoseDecoderBiLSTM(26)
        x = jnp.zeros((2, 30, 128))
        variables = model.init(rng, x)
        y = model.apply(variables, x)
        assert y.shape == (2, 30, 26)
        assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0  # sigmoid

    def test_generator_cvpr_lstm(self, rng):
        from conductor_tpu.models.generator import GeneratorCVPRLSTM

        model = GeneratorCVPRLSTM()
        x = jnp.zeros((3, 60, 20))
        variables = model.init(rng, x)
        y = model.apply(variables, x)
        assert y.shape == (3, 60, 13, 2)

    def test_generator_bilstm_decoder(self, rng):
        from conductor_tpu.models.generator import Generator

        model = Generator(decoder_kind="bilstm")
        mel = jnp.zeros((2, 90, 128))   # 1 s of mel -> T30 = 30
        noise = jnp.zeros((2, 1, 8))    # one noise vector per second
        variables = model.init(rng, mel, noise)
        y = model.apply(variables, mel, noise)
        assert y.shape == (2, 30, 13, 2)

    def test_bilstm_dropout_needs_rng_only_in_train(self, rng):
        from conductor_tpu.models.generator import PoseDecoderBiLSTM

        model = PoseDecoderBiLSTM(26)
        x = jnp.ones((1, 10, 16))
        variables = model.init(rng, x)
        y1 = model.apply(variables, x, True, rngs={"dropout": rng})
        y2 = model.apply(variables, x, True, rngs={"dropout": jax.random.fold_in(rng, 1)})
        assert not np.allclose(np.asarray(y1), np.asarray(y2))  # dropout active
