"""D13 replicated evaluation protocol (R-precision/Matching/FID/Div/MM + CI)."""

import numpy as np

from conductor_tpu.eval.protocol import (
    EvaluationProtocol,
    M2SNetCoEmbedding,
    ProtocolConfig,
    get_metric_statistics,
)


class IdentityWrapper:
    """cond and motion embed to their row means -> perfect matching when the
    generator copies the paired motion."""

    def embed(self, cond, motion):
        return cond.reshape(cond.shape[0], -1), motion.reshape(motion.shape[0], -1)

    def embed_motion(self, motion):
        return motion.reshape(motion.shape[0], -1)


def _batches_fn():
    rs = np.random.RandomState(0)
    data = []
    for _ in range(3):
        motion = rs.rand(8, 6).astype(np.float64)
        data.append((motion.copy(), motion))  # cond == motion embedding space
    return lambda: iter(data)


def test_perfect_generator_protocol():
    batches = _batches_fn()
    stored = [b for b in batches()]
    lookup = {id(c): m for c, m in stored}

    protocol = EvaluationProtocol(
        IdentityWrapper(), ProtocolConfig(replication_times=2, diversity_times=10)
    )
    result = protocol.run(
        lambda: iter(stored),
        {"perfect": lambda cond: cond.copy(), "noise": lambda cond: cond + 10.0},
    )
    summary = result.summary()

    # perfect generator: matching score 0, R-precision top-1 == 1, FID ~ 0
    mean, conf = summary["MatchingScore"]["perfect"]
    assert abs(mean) < 1e-6 and abs(conf) < 1e-6
    rp_mean, _ = summary["R_precision"]["perfect"]
    assert rp_mean[0] == 1.0
    fid_mean, _ = summary["FID"]["perfect"]
    assert abs(fid_mean) < 1e-6

    # noise generator: strictly worse matching, nonzero FID
    assert summary["MatchingScore"]["noise"][0] > 1.0
    assert summary["FID"]["noise"][0] > 1.0

    report = result.format_report()
    assert "R_precision Summary" in report and "[perfect]" in report


def test_multimodality_path():
    rs = np.random.RandomState(1)
    stored = [(rs.rand(6, 4), rs.rand(6, 4))]
    protocol = EvaluationProtocol(
        IdentityWrapper(),
        ProtocolConfig(replication_times=1, diversity_times=3, mm_num_times=4),
    )

    def mm_generate(cond):
        return np.stack([cond + rs.rand(*cond.shape) * 0.1 for _ in range(6)])

    result = protocol.run(
        lambda: iter(stored),
        {"m": lambda c: c},
        mm_generate=mm_generate,
        mm_conds=[stored[0][0][i] for i in range(3)],
    )
    mm_mean, _ = result.summary()["MultiModality"]["model"]
    assert mm_mean > 0


def test_metric_statistics():
    mean, conf = get_metric_statistics(np.array([1.0, 2.0, 3.0]))
    assert mean == 2.0
    assert conf == np.float64(1.96 * np.std([1.0, 2.0, 3.0]) / np.sqrt(3))


def test_m2snet_co_embedding_pools_time():
    w = M2SNetCoEmbedding(
        music_fn=lambda mel: np.ones((2, 10, 64)) * mel.mean(),
        motion_fn=lambda m: np.ones((2, 10, 64)) * 2.0,
    )
    c, m = w.embed(np.ones((2, 30, 128)), np.zeros((2, 10, 13, 2)))
    assert c.shape == (2, 64) and m.shape == (2, 64)
    assert np.allclose(m, 2.0)


def test_pregenerated_samples():
    from conductor_tpu.eval.protocol import PregeneratedSamples

    rs = np.random.RandomState(0)
    conds = [rs.rand(6).astype(np.float32) for _ in range(7)]
    calls = {"n": 0, "mm": 0}

    def generate_fn(chunk, repeats=1):
        calls["n"] += 1
        if repeats > 1:
            calls["mm"] += 1
            return np.repeat(chunk[:, None], repeats, axis=1) + 0.01
        return chunk + 1.0

    pre = PregeneratedSamples(
        generate_fn, conds, mm_num_samples=3, mm_num_repeats=4, batch_size=3
    )
    assert len(pre) == 7
    cond0, fake0 = pre[0]
    np.testing.assert_allclose(fake0, conds[0] + 1.0)
    assert pre.mm_fakes.shape == (3, 4, 6)

    # replay through the protocol: generation happens zero extra times
    n_before = calls["n"]
    batches = [(np.stack(conds[i : i + 3]),) * 2 for i in (0, 3)]
    gen = pre.generator()
    for cond, _ in batches:
        out = gen(cond)
        np.testing.assert_allclose(out, cond + 1.0)
    assert calls["n"] == n_before

    mm_generate, mm_conds = pre.mm_args()
    assert len(mm_conds) == 3
    assert mm_generate(mm_conds[0]).shape == (4, 6)


def test_pregenerated_cursor_wraps_across_replications():
    """Regression: replication_times > 1 re-iterates the batches; the replay
    cursor must restart instead of running off the end of the cache."""
    from conductor_tpu.eval.protocol import PregeneratedSamples

    rs = np.random.RandomState(2)
    conds = [rs.rand(4).astype(np.float32) for _ in range(6)]
    pre = PregeneratedSamples(lambda c, repeats=1: c + 1.0, conds, batch_size=3)
    gen = pre.generator()
    batches = [np.stack(conds[0:3]), np.stack(conds[3:6])]
    for _rep in range(3):  # three replications replay identically
        for cond in batches:
            out = gen(cond)
            assert out.shape == cond.shape  # pre-fix: empty past rep 0
            np.testing.assert_allclose(out, cond + 1.0)

    # mm cursor wraps the same way
    pre2 = PregeneratedSamples(
        lambda c, repeats=1: np.repeat(c[:, None], repeats, axis=1),
        conds, mm_num_samples=2, mm_num_repeats=3, batch_size=3,
    )
    mm_generate, mm_conds = pre2.mm_args()
    first_pass = [mm_generate(c) for c in mm_conds]
    second_pass = [mm_generate(c) for c in mm_conds]
    for a, b in zip(first_pass, second_pass):
        np.testing.assert_allclose(a, b)

    # misaligned batch boundaries fail loudly rather than replaying garbage
    gen2 = pre.generator()
    gen2(np.stack(conds[0:2]))
    try:
        gen2(np.stack(conds[0:5]))  # [2:7) crosses the end (6)
        assert False, "expected IndexError"
    except IndexError:
        pass


def test_make_generator_fresh_noise_per_call():
    """Regression for the degenerate-CI bug: every generate call (every batch
    of every replication) must draw a distinct key — a fixed key made all
    replications identical (committed artifact showed conf == 0.0)."""
    import jax

    from conductor_tpu.cli.evaluate_protocol import make_generator

    seen_keys = []

    class StubTrainer:
        def generate(self, state, mel, rng, num_steps=None):
            seen_keys.append(np.asarray(jax.random.key_data(rng)).tolist())
            # noise depends on the key -> replications differ
            return np.asarray(
                jax.random.normal(rng, (mel.shape[0], 4 * 13 * 2))
            )

    gen = make_generator(
        StubTrainer(), state=None, rng=jax.random.PRNGKey(0),
        num_steps=None, n_joints=13, joint_dim=2,
    )
    cond = np.zeros((2, 9, 128), np.float32)
    rep0 = [gen(cond), gen(cond)]  # two batches, replication 0
    rep1 = [gen(cond), gen(cond)]  # same batches, replication 1
    assert len({tuple(k) for k in seen_keys}) == 4  # all keys distinct
    assert rep0[0].shape == (2, 4, 13, 2)
    assert not np.allclose(rep0[0], rep1[0])
    assert not np.allclose(rep0[0], rep0[1])


def test_reshuffled_replications_give_nonzero_gt_ci():
    """Regression (r3 VERDICT missing #1): the reference reshuffles batch
    composition every replication (`tools/evaluation.py:160-200` +
    epoch-seeded sampler `datasets/dataloader.py:33-37`), so ground-truth
    MatchingScore/R-precision — computed within each batch's distance
    matrix — must vary across replications.  A one-argument batches_fn
    receives the replication index; two replications must see different
    batch compositions and the ground-truth CIs must be nonzero."""
    rs = np.random.RandomState(3)
    pool = rs.rand(24, 6)
    seen_orders = []

    def batches_fn(rep):
        order = np.random.default_rng((42, rep)).permutation(len(pool))
        seen_orders.append(order.copy())
        for b0 in range(0, len(pool), 8):
            chunk = pool[order[b0 : b0 + 8]]
            yield chunk.copy(), chunk

    protocol = EvaluationProtocol(
        IdentityWrapper(), ProtocolConfig(replication_times=4, diversity_times=5)
    )
    result = protocol.run(batches_fn, {"noisy": lambda c: c + rs.rand(*c.shape)})

    # the protocol consumed a different composition each replication
    assert len(seen_orders) == 4
    assert not np.array_equal(seen_orders[0], seen_orders[1])

    summary = result.summary()
    # ground truth embeds cond==motion -> MatchingScore stays 0 regardless of
    # composition, but R-precision ties depend on who shares a batch: with a
    # continuous pool R@k is exactly 1 at every composition too. The real
    # composition-sensitivity check: the noisy model's within-batch matching
    # varies across replications -> nonzero CI.
    _, ms_conf = summary["MatchingScore"]["noisy"]
    _, rp_conf = summary["R_precision"]["noisy"]
    assert float(ms_conf) > 0.0
    assert np.any(np.asarray(rp_conf) > 0.0)

    # and ground truth R-precision/Matching vary once embeddings are noisy
    class NoisyWrapper(IdentityWrapper):
        def embed(self, cond, motion):
            c, m = super().embed(cond, motion)
            return c, m + np.random.RandomState(m.shape[0]).rand(*m.shape) * 0.5

    result2 = EvaluationProtocol(
        NoisyWrapper(), ProtocolConfig(replication_times=4, diversity_times=5)
    ).run(batches_fn, {"m": lambda c: c})
    _, gt_ms_conf = result2.summary()["MatchingScore"]["ground truth"]
    _, gt_rp_conf = result2.summary()["R_precision"]["ground truth"]
    assert float(gt_ms_conf) > 0.0
    assert np.any(np.asarray(gt_rp_conf) > 0.0)


def test_zero_arg_batches_fn_still_supported():
    """Fixed-composition (zero-arg) batches_fn keeps working for replay."""
    rs = np.random.RandomState(4)
    stored = [(rs.rand(6, 4), rs.rand(6, 4))]
    protocol = EvaluationProtocol(
        IdentityWrapper(), ProtocolConfig(replication_times=2, diversity_times=3)
    )
    result = protocol.run(lambda: iter(stored), {"m": lambda c: c.copy()})
    assert "FID" in result.summary()


def test_lookup_generator_survives_reshuffled_batches():
    """PregeneratedSamples.lookup_generator resolves fakes by condition, so a
    reshuffling batches_fn(rep) gets the right (cond, fake) pairs in any
    composition — the reference's shuffled EvaluationDataset semantics."""
    from conductor_tpu.eval.protocol import PregeneratedSamples

    rs = np.random.RandomState(5)
    conds = [rs.rand(4).astype(np.float32) for _ in range(8)]
    pre = PregeneratedSamples(lambda c, repeats=1: c * 2.0, conds, batch_size=3)
    gen = pre.lookup_generator()

    perm = np.random.default_rng(0).permutation(8)
    shuffled = np.stack([conds[i] for i in perm[:5]])
    np.testing.assert_allclose(gen(shuffled), shuffled * 2.0)

    # unknown condition fails loudly
    try:
        gen(np.ones((1, 4), np.float32) * 123.0)
        assert False, "expected KeyError"
    except KeyError:
        pass


def test_cli_batches_fn_reshuffles_per_replication(tmp_path):
    """The protocol CLI's batches_fn(rep) must yield a different batch
    composition per replication (epoch-seeded shuffle), mirroring the
    reference loader rebuild."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from conductor_tpu.data import BatchIterator
    from conductor_tpu.data.dataset import ConductorMotionDataset, make_synthetic_dataset

    root = str(tmp_path / "cm")
    make_synthetic_dataset(root, "test", num_clips=6, seed=0)
    ds = ConductorMotionDataset(root, "test", sample_length=10, mode="sequential")
    loader = BatchIterator(ds, 3, shuffle=True, seed=0)

    def batches_fn(rep=0):
        loader.epoch = rep
        for mel, motion, _ in loader:
            yield np.asarray(mel), np.asarray(motion)

    rep0 = [m for m, _ in batches_fn(0)]
    rep0_again = [m for m, _ in batches_fn(0)]
    rep1 = [m for m, _ in batches_fn(1)]
    # deterministic per replication index...
    for a, b in zip(rep0, rep0_again):
        np.testing.assert_array_equal(a, b)
    # ...but a different composition across replications
    assert any(
        a.shape != b.shape or not np.array_equal(a, b) for a, b in zip(rep0, rep1)
    )


def test_protocol_with_pregenerated():
    from conductor_tpu.eval.protocol import PregeneratedSamples

    rs = np.random.RandomState(1)
    stored = [(rs.rand(6, 4), rs.rand(6, 4))]
    conds = [c for batch in stored for c in batch[0]]
    pre = PregeneratedSamples(lambda c, repeats=1: c.copy(), conds, batch_size=6)
    protocol = EvaluationProtocol(
        IdentityWrapper(), ProtocolConfig(replication_times=1, diversity_times=3)
    )
    result = protocol.run(lambda: iter(stored), {"pregen": pre.generator()})
    assert "FID" in result.summary()
