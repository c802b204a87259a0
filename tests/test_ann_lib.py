"""ANN library: exactness of brute force, IVF recall, loadtest harness."""

import numpy as np
import pytest

from the_algorithm_tpu.ann_lib import (
    BruteForceIndex,
    ClusteredScanIndex,
    LoadTestRecorder,
    Metric,
    run_loadtest,
)


def corpus(n=2000, d=32, seed=0):
    rng = np.random.default_rng(seed)
    # clustered corpus so IVF has structure to exploit
    centers = rng.normal(size=(16, d)) * 3
    assign = rng.integers(0, 16, n)
    x = centers[assign] + rng.normal(size=(n, d))
    ids = np.arange(n) + 1000
    return x.astype(np.float32), ids


class TestBruteForce:
    @pytest.mark.parametrize("metric", list(Metric))
    def test_exact_vs_numpy(self, metric):
        x, ids = corpus(n=300)
        idx = BruteForceIndex(32, metric)
        idx.append(ids, x)
        q = x[:5] + 0.01
        got_ids, got_dist = idx.query(q, k=10)

        for i in range(5):
            if metric == Metric.L2:
                d = np.linalg.norm(x - q[i], axis=1)
                order = np.argsort(d)[:10]
            elif metric == Metric.COSINE:
                xn = x / np.linalg.norm(x, axis=1, keepdims=True)
                qn = q[i] / np.linalg.norm(q[i])
                order = np.argsort(-(xn @ qn))[:10]
            else:
                order = np.argsort(-(x @ q[i]))[:10]
            np.testing.assert_array_equal(got_ids[i], ids[order])

    def test_append_extends(self):
        idx = BruteForceIndex(4)
        idx.append([1], np.ones((1, 4)))
        idx.append([2], 2 * np.ones((1, 4)))
        assert len(idx) == 2
        got_ids, _ = idx.query(np.ones((1, 4)), k=2)
        assert set(got_ids[0]) == {1, 2}

    def test_l2_distance_values(self):
        idx = BruteForceIndex(2, Metric.L2)
        idx.append([1, 2], np.array([[0, 0], [3, 4]], np.float32))
        got_ids, got_dist = idx.query(np.zeros((1, 2)), k=2)
        assert got_ids[0].tolist() == [1, 2]
        np.testing.assert_allclose(got_dist[0], [0.0, 5.0], atol=1e-5)


class TestClusteredScan:
    def test_high_recall_with_enough_probes(self):
        x, ids = corpus()
        truth = BruteForceIndex(32)
        truth.append(ids, x)
        ivf = ClusteredScanIndex(32, n_clusters=16, n_probes=8)
        ivf.append(ids, x)
        q = x[:50]
        t_ids, _ = truth.query(q, 10)
        g_ids, _ = ivf.query(q, 10)
        recall = np.mean([
            len(set(t_ids[i]) & set(g_ids[i])) / 10 for i in range(50)
        ])
        assert recall > 0.9, recall

    def test_fewer_probes_lower_recall_but_fast(self):
        x, ids = corpus()
        ivf1 = ClusteredScanIndex(32, n_clusters=32, n_probes=1, seed=1)
        ivf1.append(ids, x)
        ivf8 = ClusteredScanIndex(32, n_clusters=32, n_probes=16, seed=1)
        ivf8.append(ids, x)
        truth = BruteForceIndex(32)
        truth.append(ids, x)
        q = x[:30]
        t_ids, _ = truth.query(q, 10)

        def recall(idx):
            g, _ = idx.query(q, 10)
            return np.mean([
                len(set(t_ids[i]) & set(g[i])) / 10 for i in range(30)
            ])

        assert recall(ivf8) >= recall(ivf1)


class TestLoadtest:
    def test_harness_perfect_recall_for_bruteforce(self):
        x, ids = corpus(n=500)
        idx = BruteForceIndex(32)
        idx.append(ids, x)
        q = x[:20] + 0.01
        res = run_loadtest(idx, q, k=20, truth_vectors=x, truth_ids=ids)
        assert res.recall_at_1 == 1.0
        assert res.overall_recall == 1.0
        assert res.num_queries == 20
        assert res.p99_latency_us >= res.p50_latency_us > 0
        assert res.avg_rps > 0
        assert len(res.row().split("\t")) == 8

    def test_harness_detects_imperfect_recall(self):
        x, ids = corpus(n=500)
        ivf = ClusteredScanIndex(32, n_clusters=64, n_probes=1)
        ivf.append(ids, x)
        res = run_loadtest(ivf, x[:20], k=20, truth_vectors=x, truth_ids=ids)
        assert res.overall_recall < 1.0  # 1 probe can't be exact here
