"""Metric tests: hand-computed goldens + a brute-force oracle implementing
the reference's loop-based algorithms (visdial_metrics.py)."""

import math

import numpy as np

from gstx.eval.metrics import NDCG, SparseGTMetrics, scores_to_ranks


def brute_scores_to_ranks(scores):
    """Reference visdial_metrics.py:21-39 loop algorithm."""
    b, r, n = scores.shape
    flat = scores.reshape(-1, n)
    ranks = np.zeros_like(flat, dtype=np.int64)
    for i in range(flat.shape[0]):
        order = sorted(range(n), key=lambda j: -flat[i, j])
        for pos, j in enumerate(order):
            ranks[i, j] = pos + 1
    return ranks.reshape(b, r, n)


def test_scores_to_ranks_matches_bruteforce():
    rng = np.random.RandomState(0)
    scores = rng.randn(3, 4, 7)
    np.testing.assert_array_equal(scores_to_ranks(scores),
                                  brute_scores_to_ranks(scores))


def test_scores_to_ranks_golden():
    scores = np.asarray([[[0.1, 0.9, 0.5]]])
    np.testing.assert_array_equal(scores_to_ranks(scores), [[[3, 1, 2]]])


def test_sparse_metrics_golden():
    m = SparseGTMetrics()
    # 2 samples x 1 round x 4 options; gt at index 0
    scores = np.asarray([
        [[5.0, 1.0, 2.0, 3.0]],   # gt rank 1
        [[1.0, 5.0, 2.0, 0.0]],   # gt rank 3
    ])
    m.observe(scores, np.asarray([[0], [0]]))
    got = m.retrieve()
    assert got["r@1"] == 0.5
    assert got["r@5"] == 1.0
    assert got["mean"] == 2.0
    np.testing.assert_allclose(got["mrr"], (1.0 + 1.0 / 3.0) / 2)


def test_ndcg_golden():
    # hand-computed: relevance [1, 0.5, 0, 0], predictions rank them
    # [opt2, opt0, opt1, opt3] -> k=2, top-2 predicted = opts {2, 0}
    m = NDCG()
    scores = np.asarray([[1.0, 0.2, 3.0, 0.1]])
    rel = np.asarray([[1.0, 0.5, 0.0, 0.0]])
    m.observe(scores, rel)
    got = m.retrieve()["ndcg"]
    dcg = 0.0 / math.log2(2) + 1.0 / math.log2(3)
    # top-2 predicted options are 2 (rel 0) and 0 (rel 1)
    dcg = rel[0, 2] / math.log2(2) + rel[0, 0] / math.log2(3)
    ideal = 1.0 / math.log2(2) + 0.5 / math.log2(3)
    np.testing.assert_allclose(got, dcg / ideal, rtol=1e-6)


def test_ndcg_perfect_prediction():
    m = NDCG()
    rel = np.asarray([[0.0, 1.0, 0.5, 0.0, 0.3]])
    scores = np.asarray([[0.0, 10.0, 5.0, 0.0, 3.0]])
    m.observe(scores, rel)
    np.testing.assert_allclose(m.retrieve()["ndcg"], 1.0, rtol=1e-6)


def test_ndcg_batch_accumulation():
    m = NDCG()
    rel = np.asarray([[1.0, 0.0], [0.0, 1.0]])
    scores = np.asarray([[2.0, 1.0], [2.0, 1.0]])  # first perfect, second not
    m.observe(scores, rel)
    got = m.retrieve()["ndcg"]
    np.testing.assert_allclose(got, (1.0 + 0.0) / 2, rtol=1e-6)
