"""End-to-end For You: retrieval engines → blend → hydrate → MaskNet score →
diversity rescoring → selection, on a small synthetic world."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from the_algorithm_tpu.graph import uteg as uteg_mod
from the_algorithm_tpu.mixers import home_mixer, similarity_engines as se, tweet_mixer
from the_algorithm_tpu.models import masknet
from the_algorithm_tpu.ops.retrieval import ClusterTweetIndex
from the_algorithm_tpu.ops.sparse import PAD_ID, SparseEmbedding
from the_algorithm_tpu.pipeline.component import (
    Candidate,
    CandidatePipeline,
    FeatureHydrator,
)
from the_algorithm_tpu.search import earlybird as eb


class TestInterleaveBlend:
    def test_round_robin_dedup(self):
        a = [Candidate(id=1, score=9.0), Candidate(id=2, score=8.0)]
        b = [Candidate(id=1, score=7.0), Candidate(id=3, score=6.0)]
        out = tweet_mixer.interleave_blend([a, b], max_results=10)
        assert [c.id for c in out] == [1, 3, 2]

    def test_max_results(self):
        a = [Candidate(id=i) for i in range(5)]
        out = tweet_mixer.interleave_blend([a], max_results=3)
        assert len(out) == 3


class TestTweetMixerCache:
    def test_caches_by_key(self):
        calls = []

        class CountingSource(se.CandidateSource):
            def get(self, query, params):
                calls.append(1)
                return [Candidate(id=42, score=1.0)]

        tm = tweet_mixer.TweetMixer([CountingSource()], cache_ttl_s=60)
        q = object()
        out1 = tm.get_candidates(q, cache_key="u1")
        out2 = tm.get_candidates(q, cache_key="u1")
        assert len(calls) == 1
        assert [c.id for c in out2] == [42]

    def test_engine_fail_open(self):
        class Boom(se.CandidateSource):
            def get(self, query, params):
                raise RuntimeError("down")

        class Ok(se.CandidateSource):
            def get(self, query, params):
                return [Candidate(id=7, score=1.0)]

        tm = tweet_mixer.TweetMixer([Boom(), Ok()])
        out = tm.get_candidates(object())
        assert [c.id for c in out] == [7]


def build_world(seed=0):
    """Synthetic world: 64 tweets in 2 topical groups, 8 users."""
    rng = np.random.default_rng(seed)
    T, C = 64, 16

    # SimClusters: tweets 0-31 in clusters {0..3}, 32-63 in {8..11}
    idx_ids = np.full((C, 16), int(PAD_ID), np.int32)
    idx_scores = np.zeros((C, 16), np.float32)
    idx_ts = np.zeros((C, 16), np.int32)
    for c in range(4):
        tw = np.arange(0, 32)[c::4][:16]
        idx_ids[c, : len(tw)] = tw
        idx_scores[c, : len(tw)] = rng.uniform(0.5, 1.0, len(tw))
        idx_ts[c, : len(tw)] = 100
    for c in range(8, 12):
        tw = np.arange(32, 64)[(c - 8)::4][:16]
        idx_ids[c, : len(tw)] = tw
        idx_scores[c, : len(tw)] = rng.uniform(0.5, 1.0, len(tw))
        idx_ts[c, : len(tw)] = 100
    sann_index = ClusterTweetIndex(
        jnp.asarray(idx_ids), jnp.asarray(idx_scores), jnp.asarray(idx_ts)
    )

    # earlybird: all 64 tweets, authors 0-7, text by group
    ebi = eb.init_index(eb.EarlybirdConfig(capacity=128, max_tokens=4))
    texts = ["jax tpu news"] * 32 + ["cooking recipes"] * 32
    toks = jnp.asarray(np.stack([eb.tokenize(t, 4) for t in texts]))
    authors = np.arange(64) % 8
    feats = np.zeros((64, len(eb.DOC_FEATURES)), np.float32)
    feats[:, 0] = rng.uniform(0, 20, 64)  # fav counts
    ebi = eb.ingest(
        ebi, toks, jnp.asarray(authors.astype(np.int32)),
        jnp.full((64,), 100, jnp.int32),
        jnp.asarray(feats), jnp.asarray(np.arange(64, dtype=np.int32)),
    )

    # UTEG: users 1, 2 engaged tweets 3, 7
    graph = uteg_mod.init_graph(8, width=8)
    graph = uteg_mod.record_engagements(
        graph,
        np.array([1, 2, 1]),
        np.array([3, 3, 7]),
        np.array([int(uteg_mod.EngagementType.FAVORITE)] * 3),
        np.array([90, 95, 99]),
    )

    return sann_index, ebi, graph, authors, feats


class AuthorHydrator(FeatureHydrator):
    def __init__(self, authors, feats):
        self.authors = authors
        self.feats = feats

    def hydrate(self, query, candidates, params):
        for c in candidates:
            c.features["author_id"] = int(self.authors[c.id])
            c.features["fav_count"] = float(self.feats[c.id, 0])
            c.features["created_ts"] = 100


class TestForYouEndToEnd:
    def test_full_pipeline(self):
        sann_index, ebi, graph, authors, feats = build_world()

        user_emb = SparseEmbedding(
            jnp.asarray([0, 1, 2, 3] + [int(PAD_ID)] * 4, jnp.int32),
            jnp.asarray([0.9, 0.8, 0.7, 0.6, 0, 0, 0, 0], jnp.float32),
        )
        from the_algorithm_tpu.simclusters import ann

        engines = [
            se.SimClustersANNEngine(
                sann_index,
                ann.SimClustersANNConfig(
                    max_scan_clusters=4, max_top_tweets_per_cluster=16,
                    max_num_results=20,
                ),
                lambda q: user_emb,
            ),
        ]
        tm = tweet_mixer.TweetMixer(engines, max_results=30)

        pipelines = [
            CandidatePipeline(
                se.EarlybirdEngine(
                    ebi,
                    lambda q: eb.SearchQuery(
                        tokens=jnp.asarray(eb.tokenize("tpu", 4)),
                        require_all=False,
                        min_ts=jnp.int32(0),
                        max_ts=jnp.int32(1000),
                        followed_authors=jnp.asarray(
                            sorted(q.followed_authors), jnp.int32
                        ),
                    ),
                    max_results=20,
                )
            ),
            CandidatePipeline(
                se.UTEGEngine(
                    graph, lambda q: (list(q.followed_authors), [1.0] * len(q.followed_authors)),
                )
            ),
            CandidatePipeline(tweet_mixer.TweetMixerSource(tm)),
        ]

        # tiny MaskNet over the default schema
        cfg = masknet.MaskNetConfig(
            num_features=len(home_mixer.DEFAULT_FEATURE_SCHEMA),
            num_heads=len(masknet.DEFAULT_HEAD_NAMES),
            mask_blocks=2, block_dim=16, aggregation_dim=8,
            head_hidden=(16,), dtype="float32",
        )
        model = masknet.MaskNet(cfg)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, cfg.num_features))
        )
        predict = jax.jit(
            lambda x: jax.nn.sigmoid(model.apply(params, jnp.asarray(x)))
        )

        pipeline = home_mixer.build_for_you_pipeline(
            candidate_pipelines=pipelines,
            hydrators=[AuthorHydrator(authors, feats)],
            predict_fn=lambda x: np.asarray(predict(x)),
        )
        query = home_mixer.ForYouQuery(
            user_id=0,
            followed_authors=[1, 2, 3],
            seen_tweet_ids=frozenset({5}),
            max_results=10,
            now=150,
        )
        out = pipeline.run(query)

        ids = [c.id for c in out.candidates]
        assert 0 < len(ids) <= 10
        assert len(set(ids)) == len(ids)  # deduped
        assert 5 not in ids  # seen filter
        assert not out.failures
        # scored + ordered
        scores = [c.score for c in out.candidates]
        assert all(s is not None for s in scores)
        assert scores == sorted(scores, reverse=True)
        # multiple sources contributed
        sources = {c.source for c in out.candidates}
        assert len(sources) >= 2
        # per-head predictions attached (the PREDICTED_IS_* features)
        assert "predicted_fav" in out.candidates[0].features

    def test_author_diversity(self):
        r = home_mixer.AuthorDiversityRescorer(decay=0.5)
        cands = [
            Candidate(id=i, score=10.0 - i, features={"author_id": 1})
            for i in range(3)
        ] + [Candidate(id=9, score=5.0, features={"author_id": 2})]
        out = r.select(object(), cands, None)
        # 3rd tweet by author 1 decays to 8*0.25=2 < author 2's 5
        assert [c.id for c in out].index(9) < 3
