"""D14 retrieval metric math (T2M protocol, reference `utils/metrics.py:5-145`)."""

import numpy as np
import pytest

from conductor_tpu.eval.metrics import (
    calculate_activation_statistics,
    calculate_diversity,
    calculate_frechet_distance,
    calculate_matching_score,
    calculate_multimodality,
    calculate_r_precision,
    calculate_top_k,
    euclidean_distance_matrix,
)


class TestDistanceMatrix:
    def test_matches_bruteforce(self):
        rs = np.random.RandomState(0)
        a, b = rs.rand(5, 7), rs.rand(4, 7)
        got = euclidean_distance_matrix(a, b)
        want = np.sqrt(((a[:, None] - b[None]) ** 2).sum(-1))
        np.testing.assert_allclose(got, want, atol=1e-10)

    def test_zero_diagonal_on_self(self):
        rs = np.random.RandomState(1)
        a = rs.rand(6, 3)
        d = euclidean_distance_matrix(a, a)
        np.testing.assert_allclose(np.diag(d), 0, atol=1e-6)


class TestTopK:
    def test_cumulative_hits(self):
        # row 0 ranks gt first; row 1 ranks gt second; row 2 ranks gt third
        argsorted = np.array([[0, 1, 2], [2, 1, 0], [1, 0, 2]])
        mat = calculate_top_k(argsorted, 3)
        assert mat.tolist() == [
            [True, True, True],
            [False, True, True],
            [False, False, True],
        ]

    def test_r_precision_perfect_embeddings(self):
        rs = np.random.RandomState(2)
        emb = rs.rand(10, 8)
        hits = calculate_r_precision(emb, emb, top_k=3, sum_all=True)
        assert hits.tolist() == [10, 10, 10]


class TestMatchingScore:
    def test_identical_is_zero(self):
        rs = np.random.RandomState(3)
        e = rs.rand(5, 4)
        assert calculate_matching_score(e, e, sum_all=True) == 0.0

    def test_rowwise_norm(self):
        a = np.zeros((2, 3))
        b = np.ones((2, 3))
        np.testing.assert_allclose(
            calculate_matching_score(a, b), np.sqrt(3) * np.ones(2)
        )


class TestFrechet:
    def test_identical_stats_zero(self):
        rs = np.random.RandomState(4)
        act = rs.rand(200, 16)
        mu, sigma = calculate_activation_statistics(act)
        assert calculate_frechet_distance(mu, sigma, mu, sigma) == pytest.approx(
            0.0, abs=1e-6
        )

    def test_mean_shift(self):
        rs = np.random.RandomState(5)
        act = rs.randn(500, 4)
        mu, sigma = calculate_activation_statistics(act)
        shift = np.full(4, 2.0)
        d = calculate_frechet_distance(mu, sigma, mu + shift, sigma)
        assert d == pytest.approx(float(shift @ shift), rel=1e-5)


class TestDiversityMultimodality:
    def test_diversity_deterministic_and_positive(self):
        rs = np.random.RandomState(6)
        act = rs.rand(50, 8)
        d1 = calculate_diversity(act, 20, seed=0)
        d2 = calculate_diversity(act, 20, seed=0)
        assert d1 == d2 and d1 > 0

    def test_multimodality_zero_for_identical_repeats(self):
        rs = np.random.RandomState(7)
        base = rs.rand(5, 1, 8)
        act = np.repeat(base, 12, axis=1)  # every repeat identical
        assert calculate_multimodality(act, 6, seed=0) == 0.0
