"""HNSW engine tests: recall vs. brute force, metrics, serialization."""

import numpy as np
import pytest

from the_algorithm_tpu.ann_lib.hnsw import HnswIndex
from the_algorithm_tpu.ann_lib.index import BruteForceIndex, Metric


def make_data(n=2000, dim=32, seed=0):
    rng = np.random.default_rng(seed)
    # clustered data (ANN-friendly, like real embeddings)
    centers = rng.normal(size=(20, dim))
    assign = rng.integers(0, 20, n)
    x = centers[assign] + 0.3 * rng.normal(size=(n, dim))
    ids = np.arange(10_000, 10_000 + n, dtype=np.int64)
    return ids.astype(np.int64), x.astype(np.float32)


@pytest.mark.parametrize(
    "metric", [Metric.L2, Metric.COSINE, Metric.INNER_PRODUCT]
)
def test_recall_vs_bruteforce(metric):
    ids, x = make_data()
    hnsw = HnswIndex(x.shape[1], metric, m=16, ef_construction=200, ef=200)
    hnsw.append(ids, x)
    bf = BruteForceIndex(x.shape[1], metric)
    bf.append(ids, x)

    rng = np.random.default_rng(1)
    q = x[rng.choice(len(x), 32, replace=False)] + 0.05 * rng.normal(
        size=(32, x.shape[1])
    ).astype(np.float32)
    got, _ = hnsw.query(q, 10)
    want, _ = bf.query(q, 10)
    hits = sum(
        len(set(got[i].tolist()) & set(want[i].tolist())) for i in range(32)
    )
    recall = hits / (32 * 10)
    assert recall >= 0.9, f"recall@10 {recall} too low for {metric}"


def test_distances_are_sorted_and_match_reference_convention():
    ids, x = make_data(n=500)
    hnsw = HnswIndex(x.shape[1], Metric.L2, ef=100)
    hnsw.append(ids, x)
    got_ids, got_d = hnsw.query(x[:4], 5)
    assert (np.diff(got_d, axis=1) >= -1e-6).all()
    # first result of an exact-member query is the member itself, distance 0
    assert (got_ids[:, 0] == ids[:4]).all()
    np.testing.assert_allclose(got_d[:, 0], 0.0, atol=1e-4)


def test_incremental_append():
    ids, x = make_data(n=600)
    hnsw = HnswIndex(x.shape[1], Metric.COSINE)
    hnsw.append(ids[:300], x[:300])
    assert len(hnsw) == 300
    hnsw.append(ids[300:], x[300:])
    assert len(hnsw) == 600
    got, _ = hnsw.query(x[450:451], 1)
    assert got[0, 0] == ids[450]


def test_save_load_roundtrip(tmp_path):
    ids, x = make_data(n=400)
    hnsw = HnswIndex(x.shape[1], Metric.COSINE, ef=150)
    hnsw.append(ids, x)
    path = str(tmp_path / "index.hnsw")
    hnsw.save(path)
    loaded = HnswIndex.load(path, x.shape[1], Metric.COSINE, ef=150)
    assert len(loaded) == len(hnsw)
    q = x[:8]
    a, _ = hnsw.query(q, 5)
    b, _ = loaded.query(q, 5)
    np.testing.assert_array_equal(a, b)


def test_short_index_pads_with_minus_one():
    hnsw = HnswIndex(8, Metric.L2)
    hnsw.append(np.asarray([7]), np.ones((1, 8), np.float32))
    got, d = hnsw.query(np.zeros((1, 8), np.float32), 3)
    assert got[0, 0] == 7 and (got[0, 1:] == -1).all()
    assert np.isinf(d[0, 1:]).all()


class TestConcurrentBuild:
    """r4: lock-striped concurrent inserts + wait-free searches
    (≡ HnswIndex.java:153-226 per-item striping + volatile entry point)."""

    def test_parallel_insert_recall_and_search_during_build(self):
        import threading

        from the_algorithm_tpu.ann_lib.index import Metric
        from the_algorithm_tpu.ann_lib.hnsw import HnswIndex

        rng = np.random.default_rng(0)
        N, D, THREADS = 4000, 16, 8
        data = rng.normal(size=(N, D)).astype(np.float32)
        idx = HnswIndex(dim=D, metric=Metric.L2, m=12, ef_construction=80)

        errors = []

        def insert_range(lo, hi):
            try:
                idx.append(np.arange(lo, hi), data[lo:hi])
            except Exception as e:  # pragma: no cover
                errors.append(e)

        def search_while_building(stop):
            try:
                while not stop.is_set():
                    if len(idx) > 0:
                        idx.query(data[0], 5, ef=40)
            except Exception as e:  # pragma: no cover
                errors.append(e)

        stop = threading.Event()
        searcher = threading.Thread(target=search_while_building,
                                    args=(stop,))
        searcher.start()
        chunk = N // THREADS
        threads = [threading.Thread(target=insert_range,
                                    args=(i * chunk, (i + 1) * chunk))
                   for i in range(THREADS)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        stop.set()
        searcher.join()
        assert not errors, errors
        assert len(idx) == N

        # the concurrently built graph must search well: recall@10 vs
        # brute force on held-out queries
        queries = rng.normal(size=(50, D)).astype(np.float32)
        hits = total = 0
        for q in queries:
            d2 = np.sum((data - q) ** 2, axis=1)
            want = set(np.argsort(d2)[:10].tolist())
            ids_out, _ = idx.query(q, 10, ef=128)
            hits += len(want & set(int(i) for i in ids_out[0]))
            total += 10
        assert hits / total >= 0.9, hits / total
