"""RMS facade, score facade, and SimClusters candidate-source tests."""

import jax
import jax.numpy as jnp
import numpy as np

from the_algorithm_tpu.core.config import Params
from the_algorithm_tpu.ops import sparse
from the_algorithm_tpu.ops.retrieval import ClusterTweetIndex
from the_algorithm_tpu.ops.sparse import PAD_ID, SparseEmbedding
from the_algorithm_tpu.simclusters import ann, candidate_source
from the_algorithm_tpu.simclusters.candidate_source import (
    ClusterRankStrategy,
    SimClustersANNWrapperCandidateSource,
    SimClustersANNWrapperConfig,
    index_fill_counts,
    rank_clusters,
)
from the_algorithm_tpu.simclusters.representation_manager import (
    CachedEmbeddingStore,
    EmbeddingId,
    EmbeddingKind,
    EntityKind,
    RepresentationManager,
    TableEmbeddingStore,
    store_from_pairs,
)
from the_algorithm_tpu.simclusters.score_facade import (
    PAIR_ALGORITHMS,
    PairScoreId,
    ScoreFacadeStore,
    WeightedSumSpec,
)

USER_II = EmbeddingId(
    EmbeddingKind.FAV_BASED_USER_INTERESTED_IN, EntityKind.USER
)
TWEET_EMB = EmbeddingId(EmbeddingKind.LOG_FAV_BASED_TWEET, EntityKind.TWEET)


def make_store(n=10, k=4, seed=0, ids_start=100):
    rng = np.random.default_rng(seed)
    entity_ids = list(range(ids_start, ids_start + n))
    cids = rng.integers(0, 64, size=(n, k)).astype(np.int32)
    scores = rng.uniform(0.1, 1.0, size=(n, k)).astype(np.float32)
    return entity_ids, cids, scores


class TestTableStore:
    def test_multiget_roundtrip(self):
        entity_ids, cids, scores = make_store()
        store = store_from_pairs(entity_ids, cids, scores)
        got = store.multiget(np.asarray([102, 100]))
        np.testing.assert_array_equal(np.asarray(got.ids), cids[[2, 0]])
        np.testing.assert_allclose(np.asarray(got.scores), scores[[2, 0]])

    def test_missing_id_is_padded(self):
        entity_ids, cids, scores = make_store()
        store = store_from_pairs(entity_ids, cids, scores)
        got = store.multiget(np.asarray([100, 999]))
        assert (np.asarray(got.ids)[1] == int(PAD_ID)).all()
        assert (np.asarray(got.scores)[1] == 0).all()
        np.testing.assert_array_equal(np.asarray(got.ids)[0], cids[0])


class TestCachedStore:
    def test_hit_miss_and_ttl(self):
        entity_ids, cids, scores = make_store()

        calls = []

        class Counting:
            def multiget(self, ids):
                calls.append(list(np.asarray(ids)))
                return TableEmbeddingStore(
                    jnp.asarray(cids),
                    jnp.asarray(scores),
                    {int(e): i for i, e in enumerate(entity_ids)},
                ).multiget(ids)

        t = [0.0]
        cache = CachedEmbeddingStore(
            Counting(), ttl_s=10.0, clock=lambda: t[0]
        )
        a = cache.multiget(np.asarray([100, 101]))
        b = cache.multiget(np.asarray([101, 100]))  # pure hit
        assert len(calls) == 1
        np.testing.assert_array_equal(
            np.asarray(a.ids)[0], np.asarray(b.ids)[1]
        )
        t[0] = 11.0  # expire
        cache.multiget(np.asarray([100]))
        assert len(calls) == 2

    def test_lru_eviction(self):
        entity_ids, cids, scores = make_store()
        inner = store_from_pairs(entity_ids, cids, scores)
        cache = CachedEmbeddingStore(inner, max_items=2, clock=lambda: 0.0)
        cache.multiget(np.asarray([100, 101, 102]))
        assert len(cache._cache) == 2


class TestRepresentationManager:
    def test_registry_and_get(self):
        entity_ids, cids, scores = make_store()
        rms = RepresentationManager()
        rms.register(USER_II, store_from_pairs(entity_ids, cids, scores))
        assert rms.has(USER_II) and not rms.has(TWEET_EMB)
        emb = rms.get(USER_II, 103)
        np.testing.assert_array_equal(np.asarray(emb.ids), cids[3])


class TestScoreFacade:
    def _facade(self):
        a_ids, a_c, a_s = make_store(seed=1, ids_start=100)
        b_ids, b_c, b_s = make_store(seed=2, ids_start=200)
        rms = RepresentationManager()
        rms.register(USER_II, store_from_pairs(a_ids, a_c, a_s))
        rms.register(TWEET_EMB, store_from_pairs(b_ids, b_c, b_s))
        return ScoreFacadeStore(rms), (a_c, a_s), (b_c, b_s)

    def test_pair_scores_match_direct_ops(self):
        facade, (a_c, a_s), (b_c, b_s) = self._facade()
        for alg, fn in PAIR_ALGORITHMS.items():
            got = facade.pair_scores(
                alg, USER_II, [100, 101], TWEET_EMB, [200, 201]
            )
            want = jax.vmap(fn)(
                SparseEmbedding(jnp.asarray(a_c[:2]), jnp.asarray(a_s[:2])),
                SparseEmbedding(jnp.asarray(b_c[:2]), jnp.asarray(b_s[:2])),
            )
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-6
            )

    def test_single_get(self):
        facade, _, _ = self._facade()
        s = facade.get(
            PairScoreId(
                "PairEmbeddingCosineSimilarity", USER_II, 100, TWEET_EMB, 200
            )
        )
        assert -1.0001 <= s <= 1.0001

    def test_weighted_sum_aggregate(self):
        facade, _, _ = self._facade()
        facade.register_aggregate(
            WeightedSumSpec(
                "blend",
                (
                    ("PairEmbeddingDotProduct", 0.3),
                    ("PairEmbeddingCosineSimilarity", 0.7),
                ),
            )
        )
        got = facade.aggregate_scores(
            "blend", USER_II, [100, 101], TWEET_EMB, [200, 201]
        )
        dot = facade.pair_scores(
            "PairEmbeddingDotProduct", USER_II, [100, 101], TWEET_EMB, [200, 201]
        )
        cos = facade.pair_scores(
            "PairEmbeddingCosineSimilarity",
            USER_II, [100, 101], TWEET_EMB, [200, 201],
        )
        np.testing.assert_allclose(
            np.asarray(got), 0.3 * np.asarray(dot) + 0.7 * np.asarray(cos),
            rtol=1e-6,
        )


class TestClusterRanker:
    def test_by_score_matches_truncate(self):
        emb = SparseEmbedding(
            jnp.asarray([5, 3, 9, PAD_ID], jnp.int32),
            jnp.asarray([0.2, 0.9, 0.5, 0.0], jnp.float32),
        )
        got = rank_clusters(emb, 2, ClusterRankStrategy.BY_SCORE)
        assert set(np.asarray(got.ids).tolist()) == {3, 9}

    def test_index_popularity_changes_selection(self):
        # cluster 3 has the higher score but an empty index row
        emb = SparseEmbedding(
            jnp.asarray([3, 9], jnp.int32),
            jnp.asarray([0.9, 0.5], jnp.float32),
        )
        fill = jnp.zeros((16,), jnp.int32).at[9].set(100)
        got = rank_clusters(
            emb, 1, ClusterRankStrategy.BY_INDEX_POPULARITY, index_fill=fill
        )
        assert int(got.ids[0]) == 9
        assert float(got.scores[0]) == np.float32(0.5)  # scan score unchanged

    def test_pad_never_selected(self):
        emb = SparseEmbedding(
            jnp.asarray([7, PAD_ID, PAD_ID], jnp.int32),
            jnp.asarray([0.1, 0.0, 0.0], jnp.float32),
        )
        got = rank_clusters(emb, 3, ClusterRankStrategy.BY_LOG_SCORE)
        ids = np.asarray(got.ids)
        assert ids[0] == 7 and (ids[1:] == int(PAD_ID)).all()


class TestWrapperCandidateSource:
    def test_end_to_end(self):
        rng = np.random.default_rng(0)
        C, M, T = 32, 8, 100
        idx_ids = rng.integers(0, T, size=(C, M)).astype(np.int32)
        idx_scores = rng.uniform(0.1, 1.0, size=(C, M)).astype(np.float32)
        index = ClusterTweetIndex(
            jnp.asarray(idx_ids),
            jnp.asarray(idx_scores),
            jnp.zeros((C, M), jnp.int32),
        )
        entity_ids, cids, scores = make_store(n=4, k=6)
        cids = cids % C
        rms = RepresentationManager()
        rms.register(USER_II, store_from_pairs(entity_ids, cids, scores))
        src = SimClustersANNWrapperCandidateSource(
            rms, index,
            SimClustersANNWrapperConfig(
                embedding=USER_II,
                ann_config=ann.SimClustersANNConfig(
                    max_scan_clusters=4, max_top_tweets_per_cluster=M,
                    max_num_results=10,
                ),
                cluster_rank_strategy=ClusterRankStrategy.BY_INDEX_POPULARITY,
            ),
        )
        out = src.get({"user_id": 100}, Params())
        assert 0 < len(out) <= 10
        assert all(c.id != int(PAD_ID) for c in out)
        assert out[0].score >= out[-1].score

    def test_heavy_ranker_hook_reorders(self):
        rng = np.random.default_rng(1)
        C, M, T = 16, 8, 50
        index = ClusterTweetIndex(
            jnp.asarray(rng.integers(0, T, (C, M)).astype(np.int32)),
            jnp.asarray(rng.uniform(0.1, 1, (C, M)).astype(np.float32)),
            jnp.zeros((C, M), jnp.int32),
        )
        entity_ids, cids, scores = make_store(n=2, k=6)
        cids = cids % C
        rms = RepresentationManager()
        rms.register(USER_II, store_from_pairs(entity_ids, cids, scores))

        def invert(_query, ids, scores):
            return -scores  # reverse the ordering

        src = SimClustersANNWrapperCandidateSource(
            rms, index,
            SimClustersANNWrapperConfig(
                embedding=USER_II,
                ann_config=ann.SimClustersANNConfig(
                    max_scan_clusters=4, max_top_tweets_per_cluster=M,
                    max_num_results=8,
                ),
                enable_heavy_ranker=True,
            ),
            heavy_ranker=invert,
        )
        plain = SimClustersANNWrapperCandidateSource(
            rms, index,
            SimClustersANNWrapperConfig(
                embedding=USER_II,
                ann_config=ann.SimClustersANNConfig(
                    max_scan_clusters=4, max_top_tweets_per_cluster=M,
                    max_num_results=8,
                ),
            ),
        )
        a = [c.id for c in src.get({"user_id": 100}, Params())]
        b = [c.id for c in plain.get({"user_id": 100}, Params())]
        # heavy ranker inverted the scores → reversed candidate order
        real = [t for t in b if t in set(a)]
        assert a == real[::-1] or a == b[::-1]
