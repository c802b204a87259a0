"""FRS flows, topic social proof, timeline ranker tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from the_algorithm_tpu.graph import uteg as uteg_mod
from the_algorithm_tpu.mixers import (
    follow_recommendations as frs,
    timeline_ranker as tlr,
    topic_social_proof as tsps,
)
from the_algorithm_tpu.ops.sparse import PAD_ID, SparseEmbedding
from the_algorithm_tpu.pipeline.component import Candidate
from the_algorithm_tpu.search import earlybird as eb
from the_algorithm_tpu.simclusters.known_for import Graph


def emb_batch(rows, K=4):
    ids = np.full((len(rows), K), int(PAD_ID), np.int32)
    sc = np.zeros((len(rows), K), np.float32)
    for r, d in enumerate(rows):
        for i, (k, v) in enumerate(sorted(d.items(), key=lambda kv: -kv[1])[:K]):
            ids[r, i], sc[r, i] = k, v
    return SparseEmbedding(jnp.asarray(ids), jnp.asarray(sc))


class TestFrsCandidates:
    def test_similar_producers(self):
        # sims: 0~{1,2}, 5~{6}
        D = 2
        ids = np.full((8, D), int(PAD_ID), np.int32)
        w = np.zeros((8, D), np.float32)
        ids[0] = [1, 2]; w[0] = [0.9, 0.5]
        ids[5] = [6, int(PAD_ID)]; w[5] = [0.8, 0]
        sims = Graph(jnp.asarray(ids), jnp.asarray(w))
        got_ids, got_scores = frs.similar_producers_candidates(
            sims, jnp.asarray([0, 5], jnp.int32), max_results=4
        )
        got = {int(i): float(s) for i, s in zip(got_ids, got_scores) if int(i) != int(PAD_ID)}
        assert got == pytest.approx({1: 0.9, 6: 0.8, 2: 0.5})

    def test_triangular_closure(self):
        # user follows 1 and 2; 1 follows {7, 8}; 2 follows {8}
        adj = np.full((4, 2), int(PAD_ID), np.int32)
        adj[1] = [7, 8]
        adj[2] = [8, int(PAD_ID)]
        got_ids, got_counts = frs.triangular_closure_candidates(
            jnp.asarray(adj), jnp.asarray([1, 2], jnp.int32), max_results=4
        )
        got = {int(i): float(c) for i, c in zip(got_ids, got_counts) if int(i) != int(PAD_ID)}
        assert got == {8: 2.0, 7: 1.0}
        assert int(got_ids[0]) == 8  # two paths beats one

    def test_flow_predicates_and_rank(self):
        class Req:
            user_id = 9
            followed_set = {1}
            blocked_set = {2}

        def src(req):
            return [Candidate(id=i, score=float(i)) for i in [1, 2, 3, 9, 4]]

        flow = frs.RecommendationFlow(
            sources=[src],
            predicates=[frs.not_already_followed, frs.not_blocked, frs.not_self],
            max_results=2,
        )
        out = flow.run(Req())
        assert [c.id for c in out] == [4, 3]  # 1 followed, 2 blocked, 9 self


class TestTopicSocialProof:
    TOPICS = emb_batch([{0: 1.0}, {5: 1.0}, {0: 0.7, 5: 0.7}])

    def test_relevance_and_threshold(self):
        tweet = emb_batch([{0: 1.0}])
        ids, scores, followed = tsps.topic_social_proof(
            SparseEmbedding(tweet.ids[0], tweet.scores[0]),
            self.TOPICS,
            config=tsps.TopicSocialProofConfig(min_relevance=0.5, max_topics_per_tweet=3),
        )
        got = {int(i): float(s) for i, s in zip(ids, scores) if int(i) != int(PAD_ID)}
        assert 0 in got and got[0] == pytest.approx(1.0)
        assert 2 in got and got[2] == pytest.approx(0.7 / np.sqrt(0.98), rel=1e-3)
        assert 1 not in got  # orthogonal topic

    def test_not_interested_filtered(self):
        tweet = emb_batch([{0: 1.0}])
        ids, _, _ = tsps.topic_social_proof(
            SparseEmbedding(tweet.ids[0], tweet.scores[0]),
            self.TOPICS,
            not_interested_topics=jnp.asarray([0], jnp.int32),
        )
        assert 0 not in {int(i) for i in ids}

    def test_followed_mask(self):
        tweet = emb_batch([{0: 1.0}])
        ids, _, followed = tsps.topic_social_proof(
            SparseEmbedding(tweet.ids[0], tweet.scores[0]),
            self.TOPICS,
            followed_topics=jnp.asarray([2], jnp.int32),
        )
        m = {int(i): bool(f) for i, f in zip(ids, followed) if int(i) != int(PAD_ID)}
        assert m[2] is True and m[0] is False


class TestTimelineRanker:
    def test_both_streams(self):
        # earlybird: 4 tweets by authors 1, 2, 3, 4
        ebi = eb.init_index(eb.EarlybirdConfig(capacity=16, max_tokens=4))
        toks = jnp.asarray(np.stack([eb.tokenize("some text", 4)] * 4))
        ebi = eb.ingest(
            ebi, toks,
            jnp.asarray([1, 2, 3, 4], jnp.int32),
            jnp.asarray([100, 110, 120, 130], jnp.int32),
            jnp.zeros((4, len(eb.DOC_FEATURES)), jnp.float32),
            jnp.asarray([11, 12, 13, 14], jnp.int32),
        )
        # uteg: seed 1 faved tweet 99
        g = uteg_mod.init_graph(8, width=4)
        g = uteg_mod.record_engagements(
            g, np.array([1]), np.array([99]),
            np.array([int(uteg_mod.EngagementType.FAVORITE)]), np.array([105]),
        )
        out = tlr.get_ranked_timeline(
            ebi, g,
            followed_authors=[1, 2],
            seed_weights=[1.0, 0.5],
            min_ts=0, max_ts=1000,
        )
        in_ids = {int(i) for i in out.in_network_ids if int(i) != int(PAD_ID)}
        assert in_ids == {11, 12}  # only followed authors
        oon = {int(i) for i in out.oon_ids if int(i) != int(PAD_ID)}
        assert oon == {99}


class TestTimelineRankerMultitier:
    def test_recap_spans_tiers(self):
        import numpy as np

        from the_algorithm_tpu.graph import uteg as uteg_mod
        from the_algorithm_tpu.mixers import timeline_ranker as tlr
        from the_algorithm_tpu.search import earlybird as eb
        from the_algorithm_tpu.search import root as rt

        def tier(name, ids_ts, span, author):
            cfg = eb.EarlybirdConfig(capacity=8, max_tokens=4)
            tweets = [eb.RawTweet(tweet_id=i, author_id=author, created_ts=t,
                                  text="x") for i, t in ids_ts]
            idx = eb.ingest(eb.init_index(cfg),
                            *eb.build_documents(tweets, cfg)[:5])
            return rt.Tier(name, idx, span[0], span[1])

        root = rt.SuperRoot([
            tier("realtime", [(10, 900), (11, 950)], (800, 1000), author=5),
            tier("archive", [(5, 100)], (0, 799), author=5),
        ], rt.SuperRootConfig(min_full_results=100))
        graph = uteg_mod.init_graph(8, width=8)
        out = tlr.get_ranked_timeline_multitier(
            root, graph, followed_authors=[5], seed_weights=[1.0],
            min_ts=0, max_ts=1000,
        )
        assert set(out.in_network_ids.tolist()) == {10, 11, 5}


class TestTspsBatch:
    def test_batch_matches_single_and_gates(self):
        import jax.numpy as jnp
        import numpy as np

        from the_algorithm_tpu.mixers import topic_social_proof as tsp
        from the_algorithm_tpu.ops.sparse import PAD_ID, SparseEmbedding

        K = 4
        def emb(ids, scores):
            i = np.full(K, int(PAD_ID), np.int32)
            s = np.zeros(K, np.float32)
            i[:len(ids)] = ids
            s[:len(scores)] = scores
            return i, s

        topics_i, topics_s = zip(emb([0, 1], [1.0, 0.5]), emb([2], [1.0]),
                                 emb([0], [1.0]))
        topics = SparseEmbedding(jnp.asarray(np.stack(topics_i)),
                                 jnp.asarray(np.stack(topics_s)))
        ti, ts = emb([0, 1], [1.0, 0.5])
        tweets = SparseEmbedding(jnp.asarray(np.stack([ti, ti])),
                                 jnp.asarray(np.stack([ts, ts])))

        ids_b, sc_b, fol_b = tsp.topic_social_proof_batch(
            tweets, topics,
            followed_topics=jnp.asarray([0], jnp.int32),
        )
        single = tsp.topic_social_proof(
            SparseEmbedding(jnp.asarray(ti), jnp.asarray(ts)), topics,
            followed_topics=jnp.asarray([0], jnp.int32),
        )
        np.testing.assert_array_equal(np.asarray(ids_b)[0],
                                      np.asarray(single[0]))
        assert bool(np.asarray(fol_b)[0][0])  # topic 0 followed

        # quality gate drops topic 0 (the best match)
        ids_q, _, _ = tsp.topic_social_proof_batch(
            tweets, topics,
            quality_scores=jnp.asarray([0.1, 0.9, 0.9]), min_quality=0.5,
        )
        assert 0 not in np.asarray(ids_q)[0].tolist()

        # language allow-list keeps only topic 2
        ids_l, _, _ = tsp.topic_social_proof_batch(
            tweets, topics,
            topic_allowed=jnp.asarray([False, True, False]),
        )
        got = [t for t in np.asarray(ids_l)[0].tolist() if t != int(PAD_ID)]
        assert got in ([], [1])  # only topic idx 1 allowed (if relevant)
