"""Retrieval-op golden-parity tests: XLA scan vs. the JVM-style hashmap oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from the_algorithm_tpu.ops import retrieval
from the_algorithm_tpu.ops.retrieval import ClusterTweetIndex, ScoringAlgorithm
from the_algorithm_tpu.ops.sparse import PAD_ID, SparseEmbedding


def make_index(C=32, M=16, T=200, seed=0):
    """Random cluster→tweet index where tweets appear in multiple clusters."""
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, T, size=(C, M)).astype(np.int32)
    # dedup within each row (a tweet appears at most once per cluster row)
    for c in range(C):
        seen = set()
        for m in range(M):
            while int(ids[c, m]) in seen:
                ids[c, m] = rng.integers(0, T)
            seen.add(int(ids[c, m]))
    scores = rng.uniform(0.1, 1.0, size=(C, M)).astype(np.float32)
    ts = rng.integers(100, 1000, size=(C, M)).astype(np.int32)
    # pad a few tail slots
    ids[:, M - 2 :] = int(PAD_ID)
    scores[:, M - 2 :] = 0
    order = np.argsort(-scores, axis=1)
    ids = np.take_along_axis(ids, order, axis=1)
    scores = np.take_along_axis(scores, order, axis=1)
    ts = np.take_along_axis(ts, order, axis=1)
    return ids, scores, ts


def make_source(C=32, N=8, seed=1):
    rng = np.random.default_rng(seed)
    cids = rng.choice(C, size=N, replace=False).astype(np.int32)
    cscores = rng.uniform(0.2, 1.0, size=N).astype(np.float32)
    return cids, cscores


@pytest.mark.parametrize(
    "algo",
    [
        ScoringAlgorithm.DOT_PRODUCT,
        ScoringAlgorithm.COSINE,
        ScoringAlgorithm.LOG_COSINE,
        ScoringAlgorithm.COSINE_NO_SOURCE_NORM,
    ],
)
def test_matches_hashmap_oracle(algo):
    ids, scores, ts = make_index()
    cids, cscores = make_source()
    index = ClusterTweetIndex(jnp.asarray(ids), jnp.asarray(scores), jnp.asarray(ts))
    source = SparseEmbedding(jnp.asarray(cids), jnp.asarray(cscores))

    # max_results > #unique tweets so float32-vs-float64 tie ordering at the
    # top-K cut can't change the returned set; truncation itself is tested in
    # test_truncation_returns_top_scores.
    got_ids, got_scores = retrieval.approximate_cosine_similarity(
        index, source, max_results=256, algorithm=algo
    )
    want = retrieval.approximate_cosine_similarity_reference(
        ids, scores, ts, cids, cscores, max_results=256, algorithm=algo
    )
    got = [
        (int(i), float(s))
        for i, s in zip(got_ids, got_scores)
        if int(i) != int(PAD_ID)
    ]
    assert len(got) == len(want)
    got_map = dict(got)
    for tid, s in want:
        assert got_map[tid] == pytest.approx(s, rel=2e-5), tid


def test_truncation_returns_top_scores():
    ids, scores, ts = make_index()
    cids, cscores = make_source()
    index = ClusterTweetIndex(jnp.asarray(ids), jnp.asarray(scores), jnp.asarray(ts))
    source = SparseEmbedding(jnp.asarray(cids), jnp.asarray(cscores))
    full_ids, full_scores = retrieval.approximate_cosine_similarity(
        index, source, max_results=256
    )
    top_ids, top_scores = retrieval.approximate_cosine_similarity(
        index, source, max_results=20
    )
    np.testing.assert_array_equal(np.asarray(top_ids), np.asarray(full_ids[:20]))
    np.testing.assert_allclose(
        np.asarray(top_scores), np.asarray(full_scores[:20]), rtol=1e-6
    )
    # scores descending
    fs = np.asarray(top_scores)
    assert np.all(np.diff(fs[np.isfinite(fs)]) <= 1e-7)


def test_age_filter():
    ids, scores, ts = make_index()
    cids, cscores = make_source()
    index = ClusterTweetIndex(jnp.asarray(ids), jnp.asarray(scores), jnp.asarray(ts))
    source = SparseEmbedding(jnp.asarray(cids), jnp.asarray(cscores))
    got_ids, got_scores = retrieval.approximate_cosine_similarity(
        index,
        source,
        max_results=50,
        earliest_ts=jnp.int32(400),
        latest_ts=jnp.int32(800),
    )
    want = retrieval.approximate_cosine_similarity_reference(
        ids, scores, ts, cids, cscores, max_results=50, earliest_ts=400, latest_ts=800
    )
    got = {int(i) for i in got_ids if int(i) != int(PAD_ID)}
    assert got == {t for t, _ in want}


def test_min_score_filter():
    ids, scores, ts = make_index()
    cids, cscores = make_source()
    index = ClusterTweetIndex(jnp.asarray(ids), jnp.asarray(scores), jnp.asarray(ts))
    source = SparseEmbedding(jnp.asarray(cids), jnp.asarray(cscores))
    got_ids, got_scores = retrieval.approximate_cosine_similarity(
        index, source, max_results=50, min_score=0.5,
        algorithm=ScoringAlgorithm.COSINE,
    )
    finite = [float(s) for s in got_scores if np.isfinite(s)]
    assert all(s >= 0.5 for s in finite)


def test_exclude_source_tweet():
    ids, scores, ts = make_index()
    cids, cscores = make_source()
    index = ClusterTweetIndex(jnp.asarray(ids), jnp.asarray(scores), jnp.asarray(ts))
    source = SparseEmbedding(jnp.asarray(cids), jnp.asarray(cscores))
    exclude = int(ids[cids[0], 0])
    got_ids, _ = retrieval.approximate_cosine_similarity(
        index, source, max_results=100, exclude_tweet_id=jnp.int32(exclude)
    )
    assert exclude not in {int(i) for i in got_ids}


def test_batched_matches_single():
    ids, scores, ts = make_index()
    index = ClusterTweetIndex(jnp.asarray(ids), jnp.asarray(scores), jnp.asarray(ts))
    srcs = [make_source(seed=s) for s in range(4)]
    batch = SparseEmbedding(
        jnp.stack([jnp.asarray(c) for c, _ in srcs]),
        jnp.stack([jnp.asarray(s) for _, s in srcs]),
    )
    bi, bs = retrieval.approximate_cosine_similarity_batch(
        index, batch, max_results=20
    )
    for q, (cids, cscores) in enumerate(srcs):
        si, ss = retrieval.approximate_cosine_similarity(
            index,
            SparseEmbedding(jnp.asarray(cids), jnp.asarray(cscores)),
            max_results=20,
        )
        np.testing.assert_array_equal(np.asarray(bi[q]), np.asarray(si))
        np.testing.assert_allclose(np.asarray(bs[q]), np.asarray(ss), rtol=1e-6)


class TestExactCosineScan:
    """Product-grade exact mode: full-corpus cosine top-K, recall 1.0 by
    construction (the corpus-in-HBM lever over the reference's index scan)."""

    def test_matches_naive_numpy(self):
        rng = np.random.default_rng(0)
        T, K, C, Q, N, topk = 64, 4, 32, 5, 6, 8
        corpus_ids = rng.integers(0, C, (T, K)).astype(np.int32)
        corpus_scores = rng.uniform(0.1, 1.0, (T, K)).astype(np.float32)
        # pad a few rows empty
        corpus_ids[60:] = int(PAD_ID)
        q_ids = np.stack([rng.choice(C, N, replace=False)
                          for _ in range(Q)]).astype(np.int32)
        q_scores = rng.uniform(0.2, 1.0, (Q, N)).astype(np.float32)

        rows, scores = retrieval.exact_cosine_scan(
            jnp.asarray(corpus_ids), jnp.asarray(corpus_scores),
            SparseEmbedding(jnp.asarray(q_ids), jnp.asarray(q_scores)),
            num_clusters=C, max_results=topk, block=16,
        )
        rows, scores = np.asarray(rows), np.asarray(scores)

        # naive dense truth
        for q in range(Q):
            qd = np.zeros(C, np.float64)
            qd[q_ids[q]] = q_scores[q]
            qd /= np.linalg.norm(qd)
            truth = np.full(T, -np.inf)
            for t in range(60):
                acc = sum(float(s) * qd[c]
                          for c, s in zip(corpus_ids[t], corpus_scores[t]))
                truth[t] = acc / max(
                    np.linalg.norm(corpus_scores[t].astype(np.float64)), 1e-9)
            want = np.argsort(-truth)[:topk]
            np.testing.assert_allclose(
                scores[q], truth[want], rtol=1e-4)
            assert set(rows[q].tolist()) == set(want.tolist())

    def test_rejects_unaligned_corpus(self):
        with pytest.raises(ValueError):
            retrieval.exact_cosine_scan(
                jnp.zeros((10, 2), jnp.int32), jnp.zeros((10, 2)),
                SparseEmbedding(jnp.zeros((1, 2), jnp.int32),
                                jnp.zeros((1, 2))),
                num_clusters=4, max_results=2, block=4,
            )


class TestHybridSharding:
    """Query × index hybrid SANN: exact parity with the batch path."""

    def test_hybrid_matches_single_device(self):
        import numpy as np

        from the_algorithm_tpu.core.mesh import MeshSpec, make_mesh
        from the_algorithm_tpu.simclusters import ann

        rng = np.random.default_rng(5)
        C, M, Q, N, X = 64, 16, 8, 8, 16
        ids = rng.integers(0, 1 << 18, (C, M)).astype(np.int32)
        scores = rng.uniform(0.1, 1.0, (C, M)).astype(np.float32)
        ts = np.zeros((C, M), np.int32)
        index = ClusterTweetIndex(
            jnp.asarray(ids), jnp.asarray(scores), jnp.asarray(ts))
        q_ids = np.stack([rng.choice(C, N, replace=False)
                          for _ in range(Q)]).astype(np.int32)
        q_scores = rng.uniform(0.2, 1.0, (Q, N)).astype(np.float32)
        sources = SparseEmbedding(jnp.asarray(q_ids), jnp.asarray(q_scores))
        cfg = ann.SimClustersANNConfig(
            max_scan_clusters=N, max_top_tweets_per_cluster=M,
            max_num_results=X, max_tweet_candidate_age_hours=10**6)

        want_ids, want_scores = ann.get_tweet_candidates_batch(
            index, sources, cfg)

        want_ids_np = np.asarray(want_ids)
        want_scores_np = np.asarray(want_scores)
        for (d, m) in ((2, 4), (4, 2), (1, 8), (8, 1)):
            mesh = make_mesh(MeshSpec(data=d, model=m))
            sh = ann.shard_index(mesh, index)
            got_ids, got_scores = ann.get_tweet_candidates_hybrid(
                mesh, sh, sources, cfg)
            got_ids_np = np.asarray(got_ids)
            got_scores_np = np.asarray(got_scores)
            # cross-shard partial sums change fp accumulation ORDER, so
            # tied scores may swap; require per-id score parity and full
            # set overlap up to one boundary swap
            for qi in range(Q):
                ws = dict(zip(want_ids_np[qi].tolist(),
                              want_scores_np[qi].tolist()))
                gs = dict(zip(got_ids_np[qi].tolist(),
                              got_scores_np[qi].tolist()))
                common = set(ws) & set(gs)
                assert len(common) >= X - 1, (d, m, qi, ws.keys(), gs.keys())
                for i in common:
                    assert abs(ws[i] - gs[i]) < 1e-5, (d, m, qi, i)
                # ranking by score agrees where scores are separated
                order_ok = sorted(gs.values(), reverse=True)
                np.testing.assert_allclose(
                    got_scores_np[qi], order_ok, atol=1e-6)
