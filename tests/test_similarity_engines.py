"""CR-mixer engine catalog tests: diffusion, QIG, topic/skit, UAG, UTG/UVG.

≡ ``cr-mixer/server/.../similarity_engine/*.scala`` engines absent from
round 1 (VERDICT item 9), with dict oracles for the offline builders.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from the_algorithm_tpu.core.config import Params
from the_algorithm_tpu.graph import graphjet, uteg
from the_algorithm_tpu.mixers import cr_mixer, similarity_engines as SE
from the_algorithm_tpu.ops.retrieval import ClusterTweetIndex
from the_algorithm_tpu.ops import sparse as sparse_mod
from the_algorithm_tpu.ops.sparse import PAD_ID, SparseEmbedding
from the_algorithm_tpu.pipeline.component import Candidate
from the_algorithm_tpu.simclusters import ann

P = Params()


class TestDiffusion:
    def test_diffusion_index_oracle_and_engine(self):
        # 2 retweeters with known InterestedIn; retweets of tweets 5 and 6
        emb = SparseEmbedding(
            jnp.asarray([[0, 1], [1, 2]], jnp.int32),
            jnp.asarray([[1.0, 0.5], [0.8, 0.2]], jnp.float32),
        )
        idx = SE.build_diffusion_index(
            emb,
            retweet_tweet_ids=np.asarray([5, 6, 5]),
            retweet_user_rows=np.asarray([0, 1, 1]),
            num_clusters=4,
            tweets_per_cluster=4,
        )
        ids_np = np.asarray(idx.tweet_ids)
        sc_np = np.asarray(idx.scores)
        # cluster 1 mass: tweet5 = 0.5 (u0) + 0.8 (u1) = 1.3; tweet6 = 0.8
        assert ids_np[1, 0] == 5 and sc_np[1, 0] == pytest.approx(1.3)
        assert ids_np[1, 1] == 6 and sc_np[1, 1] == pytest.approx(0.8)

        from the_algorithm_tpu.ops.retrieval import ScoringAlgorithm

        engine = SE.DiffusionEngine(
            idx,
            ann.SimClustersANNConfig(
                max_scan_clusters=2, max_top_tweets_per_cluster=4,
                max_num_results=4,
                scoring_algorithm=ScoringAlgorithm.DOT_PRODUCT,
            ),
            embedding_fn=lambda q: SparseEmbedding(
                jnp.asarray([1, 2], jnp.int32),
                jnp.asarray([1.0, 0.3], jnp.float32),
            ),
        )
        got = engine.get({}, P)
        assert got and got[0].id == 5  # highest diffusion mass first


class TestQIG:
    def test_build_table_cosine_oracle(self):
        clicks = np.asarray(
            [[0, 1], [0, 2], [1, 1], [1, 2], [2, 1], [2, 3]]
        )
        ids, scores = SE.build_qig_table(clicks, num_tweets=5, k=3)
        ids, scores = np.asarray(ids), np.asarray(scores)
        # deg: t1=3, t2=2, t3=1; cooc(1,2)=2, cooc(1,3)=1
        row1 = dict(zip(ids[1], scores[1]))
        assert row1[2] == pytest.approx(2 / np.sqrt(3 * 2))
        assert row1[3] == pytest.approx(1 / np.sqrt(3 * 1))
        # symmetric
        row2 = dict(zip(ids[2], scores[2]))
        assert row2[1] == pytest.approx(2 / np.sqrt(3 * 2))

    def test_engine_thresholds(self):
        clicks = np.asarray([[0, 1], [0, 2], [1, 1], [1, 2], [2, 1], [2, 3]])
        ids, scores = SE.build_qig_table(clicks, num_tweets=5, k=3)
        eng = SE.QIGEngine(
            ids, scores, source_tweet_fn=lambda q: 1, min_score=0.7
        )
        got = eng.get({}, P)
        assert [c.id for c in got] == [2]  # only cos(1,2)=0.816 >= 0.7


class TestTopicTweet:
    def _index(self):
        ids = jnp.asarray(
            [[10, 11, int(PAD_ID)], [20, 21, 22]], jnp.int32
        )
        scores = jnp.asarray([[0.9, 0.5, 0.0], [0.8, 0.7, 0.2]], jnp.float32)
        return ClusterTweetIndex(ids, scores, jnp.zeros_like(ids))

    def test_standard_vs_high_precision(self):
        idx = self._index()
        std = SE.TopicTweetEngine(idx, topic_fn=lambda q: 1, min_relevance=0.3)
        hp = SE.TopicTweetEngine(idx, topic_fn=lambda q: 1, high_precision=True)
        assert [c.id for c in std.get({}, P)] == [20, 21]
        assert [c.id for c in hp.get({}, P)] == [20]


def _engagement_setup():
    left = uteg.init_graph(num_users=8, width=8)
    # users 0,1 both engaged tweets 3 and 4; user 2 engaged tweet 4 only
    left = uteg.record_engagements(
        left,
        user_ids=np.asarray([0, 0, 1, 1, 2]),
        tweet_ids=np.asarray([3, 4, 3, 4, 4]),
        types=np.ones(5, np.int32),
        timestamps=np.arange(5, dtype=np.int64) + 10,
    )
    right = graphjet.init_right_index(num_tweets=8, width=8)
    right = graphjet.record_right(
        right,
        tweet_ids=np.asarray([3, 4, 3, 4, 4]),
        user_ids=np.asarray([0, 0, 1, 1, 2]),
        timestamps=np.arange(5, dtype=np.int64) + 10,
    )
    return left, right


class TestUTGAndUAG:
    def test_utg_engine_related_tweets(self):
        left, right = _engagement_setup()
        eng = SE.UTGEngine(
            left, right, source_tweet_fn=lambda q: 3, max_results=4
        )
        got = eng.get({}, P)
        assert [c.id for c in got] == [4]
        assert got[0].features["cooccurrence"] == 2.0  # users 0 and 1

    def test_uag_engine_flags_promoted(self):
        left, _ = _engagement_setup()
        eng = SE.UAGEngine(
            left, seeds_fn=lambda q: ([0, 1], [1.0, 1.0]), max_results=4
        )
        got = eng.get({}, P)
        assert got and all(c.features.get("promoted") for c in got)
        assert {c.id for c in got} <= {3, 4}


class TestRouterIntegration:
    def test_full_registry_blends_all_engines(self):
        left, right = _engagement_setup()
        clicks = np.asarray([[0, 3], [0, 4], [1, 3], [1, 4]])
        qig_ids, qig_scores = SE.build_qig_table(clicks, num_tweets=8, k=4)
        qig = SE.QIGEngine(qig_ids, qig_scores, source_tweet_fn=lambda s: 3)
        utg = SE.UTGEngine(left, right, source_tweet_fn=lambda s: 3)
        uag = SE.UAGEngine(left, seeds_fn=lambda s: ([0, 1], [1.0, 1.0]))

        specs = [
            cr_mixer.EngineSpec(
                "QIG", cr_mixer.SignalKind.TWEET_ENGAGEMENT,
                lambda sig, p: qig.get(sig.entity_id, p),
            ),
            cr_mixer.EngineSpec(
                "UTG", cr_mixer.SignalKind.TWEET_ENGAGEMENT,
                lambda sig, p: utg.get(sig.entity_id, p),
            ),
            cr_mixer.EngineSpec(
                "UAG", cr_mixer.SignalKind.CONSUMER,
                lambda sig, p: uag.get(sig.entity_id, p),
            ),
        ]
        gen = cr_mixer.CrCandidateGenerator(
            specs, cr_mixer.CrMixerConfig(max_results=10)
        )
        signals = [
            cr_mixer.SourceSignal(
                cr_mixer.SignalKind.TWEET_ENGAGEMENT, 3, 1.0
            ),
            cr_mixer.SourceSignal(cr_mixer.SignalKind.CONSUMER, 0, 1.0),
        ]
        out = gen.generate(signals, P)
        assert out
        # tweet 4 is surfaced by QIG, UTG, and UAG → accumulates top evidence
        assert out[0].id == 4


class TestRoundThreeEngines:
    """r3 engine-class breadth: ConsumersBasedUTG, TwhinCollabFilter,
    Unified (≡ cr-mixer similarity_engine/ variants)."""

    def _graph(self, U=8, W=8):
        import numpy as np

        g = uteg.init_graph(U, width=W)
        # user u engaged tweets {100+u, 200} — 200 is universally popular
        users = np.repeat(np.arange(U), 2).astype(np.int32)
        tweets = np.stack([100 + np.arange(U), np.full(U, 200)],
                          axis=1).reshape(-1).astype(np.int32)
        types = np.full(users.shape, int(uteg.EngagementType.FAVORITE),
                        np.int32)
        ts = np.arange(users.shape[0], dtype=np.int32) + 10
        return uteg.record_engagements(g, users, tweets, types, ts)

    def test_consumers_based_utg_uses_similar_consumers(self):
        g = self._graph()
        eng = SE.ConsumersBasedUTGEngine(
            g, lambda q: ([2, 3], [1.0, 0.5]), max_results=8)
        got = eng.get(object(), None)
        ids = {c.id for c in got}
        assert 200 in ids  # both seeds engaged it
        assert ids <= {102, 103, 200}

    def test_twhin_collab_filter_two_stage(self):
        import numpy as np

        g = self._graph()
        U, D = 8, 4
        emb = np.eye(U, D, dtype=np.float32)
        # viewer vector = e0+e1 → most-similar users are 0 and 1
        eng = SE.TwhinCollabFilterEngine(
            jnp.asarray(emb), g,
            user_vec_fn=lambda q: jnp.asarray([1.0, 1.0, 0.0, 0.0]),
            similar_users=2, max_results=8)
        got = eng.get(object(), None)
        ids = {c.id for c in got}
        assert 200 in ids
        assert ids <= {100, 101, 200}
        top = max(got, key=lambda c: c.score)
        assert top.id == 200  # two similar users engaged → highest mass

    def test_unified_engine_blends_and_dedups(self):
        class Fixed(SE.CandidateSource):
            def __init__(self, name, rows):
                self._n, self._rows = name, rows

            @property
            def name(self):
                return self._n

            def get(self, q, p):
                return [SE.Candidate(id=i, score=s, source=self._n)
                        for i, s in self._rows]

        class Boom(SE.CandidateSource):
            def get(self, q, p):
                raise RuntimeError("engine down")

        uni = SE.UnifiedEngine([
            Fixed("a", [(1, 0.9), (2, 0.5)]),
            Fixed("b", [(2, 0.8), (3, 0.4)]),
            Boom(),
        ], max_results=10)
        got = uni.get(object(), None)
        assert [c.id for c in got] == [1, 2, 3]
        two = next(c for c in got if c.id == 2)
        assert two.score == 0.8  # best copy kept
        assert two.features["unified_sources"] == ["a", "b"]
        assert all(c.source == "Unified" for c in got)


class TestProducerBasedUTG:
    def test_audience_seeds_union_with_producer_weights(self):
        import numpy as np

        g = uteg.init_graph(8, width=8)
        users = np.asarray([2, 3], np.int32)
        tweets = np.asarray([500, 600], np.int32)
        types = np.full(2, int(uteg.EngagementType.FAVORITE), np.int32)
        g = uteg.record_engagements(
            g, users, tweets, types, np.asarray([10, 20], np.int32))
        # producer 7's audience = user 2; producer 9's audience = user 3
        engagers = {7: ([2], [1.0]), 9: ([3], [0.5])}
        eng = SE.ProducerBasedUTGEngine(
            g, lambda p: engagers.get(p, ([], [])),
            lambda q: ([7, 9], [1.0, 1.0]), max_results=8)
        got = eng.get(object(), None)
        by_id = {c.id: c.score for c in got}
        assert set(by_id) == {500, 600}
        assert by_id[500] > by_id[600]  # heavier producer-weighted audience

    def test_no_audience_returns_empty(self):
        g = uteg.init_graph(4, width=4)
        eng = SE.ProducerBasedUTGEngine(
            g, lambda p: ([], []), lambda q: ([1], [1.0]))
        assert eng.get(object(), None) == []


class TestRoundFourEngines:
    """Trip / TwoTower / EarlybirdModelBased / Lookup — the cr-mixer
    engine tail (r4)."""

    def _q(self, uid=3):
        class Q:
            user_id = uid
        return Q()

    def test_trip_engine_interleaves_clusters(self):
        from the_algorithm_tpu.ops import sparse

        def store(uid):
            return sparse.SparseEmbedding(
                jnp.asarray([5, 9, 2], jnp.int32),
                jnp.asarray([0.9, 0.5, 0.2], jnp.float32))

        trip = {
            ("TOP_GEO", 5): [(100, 0.9), (101, 0.8)],
            ("TOP_GEO", 9): [(200, 0.95), (100, 0.1)],
            ("TOP_GEO", 2): [(300, 0.5)],
        }
        eng = SE.TripEngine({"model_a": store}, trip, "model_a",
                            max_results=10)
        got = eng.get(self._q(), None)
        ids = [c.id for c in got]
        # interleave across clusters by rank: level 0 of each cluster first
        assert ids[:3] == [100, 200, 300]
        by_id = {c.id: c.score for c in got}
        assert by_id[100] == pytest.approx(0.9)  # best-score dedup

    def test_trip_engine_unknown_model_raises(self):
        with pytest.raises(KeyError):
            SE.TripEngine({}, {}, "missing")

    def test_two_tower_engine(self):
        items = np.zeros((6, 4), np.float32)
        items[2] = [1, 0, 0, 0]
        items[4] = [0.9, 0.1, 0, 0]
        ids = np.asarray([900, 901, 902, 903, 904, 905])
        eng = SE.TwoTowerEngine(
            lambda uid: np.asarray([1.0, 0, 0, 0], np.float32), items,
            item_ids=ids, max_results=2)
        got = eng.get(self._q(), None)
        assert [c.id for c in got] == [902, 904]
        assert got[0].score > got[1].score

    def test_earlybird_model_based_engine(self):
        import the_algorithm_tpu.search.earlybird as eb

        T = 16
        toks = np.full((T, 4), int(sparse_mod.PAD_ID), np.int32)
        toks[:, 0] = 7
        authors = (np.arange(T) % 4).astype(np.int32)
        feats = np.zeros((T, len(eb.DOC_FEATURES)), np.float32)
        feats[:, 0] = np.arange(T) / T  # model ranks by feature 0
        idx = eb.EarlybirdIndex(
            jnp.asarray(toks), jnp.asarray(authors),
            jnp.asarray(np.full(T, 100, np.int32)), jnp.asarray(feats),
            jnp.asarray(1000 + np.arange(T, dtype=np.int32)), jnp.int32(T))

        def model_score(f):
            return f[:, 0] * 10.0

        # seeds: authors 1 and 2; author 2 gets a +5 adjustment
        eng = SE.EarlybirdModelBasedEngine(
            idx, lambda q: ([1, 2], [0.0, 5.0]), model_score,
            max_results=6)
        got = eng.get(self._q(), None)
        assert got, "no candidates"
        authors_of = {1000 + i: int(authors[i]) for i in range(T)}
        for c in got:
            assert authors_of[c.id] in (1, 2)  # seed-author scan
        # the author-2 adjustment dominates: top candidate is author 2's
        assert authors_of[got[0].id] == 2

    def test_earlybird_model_based_engine_unsorted_seeds(self):
        """Seeds in weight order (NOT sorted by author id): each author must
        still get ITS weight — regression for the r4 sort-authors-only bug."""
        import the_algorithm_tpu.search.earlybird as eb

        T = 16
        toks = np.full((T, 4), int(sparse_mod.PAD_ID), np.int32)
        toks[:, 0] = 7
        authors = (np.arange(T) % 4).astype(np.int32)
        feats = np.zeros((T, len(eb.DOC_FEATURES)), np.float32)
        feats[:, 0] = np.arange(T) / T
        idx = eb.EarlybirdIndex(
            jnp.asarray(toks), jnp.asarray(authors),
            jnp.asarray(np.full(T, 100, np.int32)), jnp.asarray(feats),
            jnp.asarray(1000 + np.arange(T, dtype=np.int32)), jnp.int32(T))

        def model_score(f):
            return f[:, 0] * 10.0

        # top-authors-by-weight order: author 3 (weight 50) before author 1
        # (weight 0). Sorting authors without the weights would hand author
        # 1 the 50 and author 3 the 0.
        eng = SE.EarlybirdModelBasedEngine(
            idx, lambda q: ([3, 1], [50.0, 0.0]), model_score,
            max_results=6)
        got = eng.get(self._q(), None)
        assert got, "no candidates"
        authors_of = {1000 + i: int(authors[i]) for i in range(T)}
        for c in got:
            assert authors_of[c.id] in (1, 3)
        # the +50 adjustment belongs to author 3: every author-3 candidate
        # must outrank every author-1 candidate
        ranks_3 = [r for r, c in enumerate(got) if authors_of[c.id] == 3]
        ranks_1 = [r for r, c in enumerate(got) if authors_of[c.id] == 1]
        assert ranks_3 and ranks_1
        assert max(ranks_3) < min(ranks_1)

    def test_lookup_engine_routes_and_caches(self):
        calls = []

        class Fixed:
            def __init__(self, name, ids):
                self.name, self._ids = name, ids

            def get(self, q, p):
                calls.append(self.name)
                return [Candidate(id=i, score=1.0, source=self.name)
                        for i in self._ids]

        clock = [0.0]
        eng = SE.LookupEngine(
            {"v1": Fixed("v1", [1, 2]), "v2": Fixed("v2", [3])},
            default_model="v1", cache_ttl_s=10.0,
            now_fn=lambda: clock[0])
        got = eng.get(self._q(), None)
        assert [c.id for c in got] == [1, 2]
        assert got[0].features["lookup_model_id"] == "v1"
        # cached within TTL
        eng.get(self._q(), None)
        assert calls == ["v1"]
        clock[0] = 11.0
        eng.get(self._q(), None)
        assert calls == ["v1", "v1"]
        # model routing via params
        from the_algorithm_tpu.core.config import Params

        got2 = eng.get(self._q(), Params({"lookup_model_id": "v2"}))
        assert [c.id for c in got2] == [3]
        assert eng.models() == ["v1", "v2"]

    def test_new_specs_in_catalog_and_products(self):
        from the_algorithm_tpu.mixers import candidate_pipeline_catalog as cpc
        from the_algorithm_tpu.mixers import tweet_mixer_products as tmp

        names = {s.name for s in cpc.catalog_specs()}
        for n in ("trip_geo_popular", "trip_domain_popular",
                  "two_tower_consumer", "earlybird_model_based",
                  "earlybird_tensorflow_based",
                  "offline_simclusters_lookup"):
            assert n in names, n
        assert len(names) >= 60
        home = tmp.PRODUCT_SPECS[
            tmp.TweetMixerProduct.HOME_RECOMMENDED_TWEETS].pipeline_names
        assert "trip_geo_popular" in home
        assert "two_tower_consumer" in home
