"""Concrete home-mixer hydrator library + side effects."""

import jax.numpy as jnp
import numpy as np

from the_algorithm_tpu.features import aggregation, graph_features
from the_algorithm_tpu.features import representation_scorer as rsx
from the_algorithm_tpu.features import user_signals
from the_algorithm_tpu.mixers import feature_hydrators as fh
from the_algorithm_tpu.ops.sparse import PAD_ID, SparseEmbedding
from the_algorithm_tpu.pipeline.component import Candidate


class Query:
    def __init__(self, user_id=0, now=1000):
        self.user_id = user_id
        self.now = now


def _cands(n, author_base=100):
    return [
        Candidate(id=i, features={"author_id": author_base + (i % 3)})
        for i in range(n)
    ]


def test_earlybird_hydrator_dict_and_callable():
    cands = _cands(3)
    fh.EarlybirdFeatureHydrator(
        {0: {"fav_count": 5.0}, 2: {"fav_count": 7.0, "reply_count": 1.0}}
    ).hydrate(Query(), cands, None)
    assert cands[0].features["fav_count"] == 5.0
    assert "fav_count" not in cands[1].features
    assert cands[2].features["reply_count"] == 1.0

    cands2 = _cands(3)
    fh.EarlybirdFeatureHydrator(
        lambda ids: {"fav_count": ids.astype(np.float32) * 2}
    ).hydrate(Query(), cands2, None)
    assert cands2[2].features["fav_count"] == 4.0


def test_tweepcred_and_realgraph():
    rep = np.zeros(200, np.float32)
    rep[100], rep[101] = 55.0, 80.0
    cands = _cands(3)
    fh.TweepcredFeatureHydrator(rep).hydrate(Query(), cands, None)
    assert cands[0].features["tweepcred"] == 55.0
    assert cands[1].features["tweepcred"] == 80.0
    assert cands[2].features["tweepcred"] == 0.0  # author 102 unknown

    fh.RealGraphFeatureHydrator(
        lambda uid, authors: (authors == 101).astype(np.float32) * 0.9
    ).hydrate(Query(user_id=7), cands, None)
    assert cands[1].features["realgraph_score"] == np.float32(0.9)
    assert cands[0].features["realgraph_score"] == 0.0


def test_gfs_hydrator_counts_follows_who_faved():
    E, U, D = len(graph_features.EdgeType), 8, 4
    nbrs = np.full((E, U, D), int(PAD_ID), np.int32)
    # viewer 0 follows users 1,2; users 1,2 faved author... GFS counts via
    # FOLLOWING(viewer) ∩ FAVORITED_BY(author)
    nbrs[graph_features.EdgeType.FOLLOWING, 0, :2] = [1, 2]
    author = 5
    nbrs[graph_features.EdgeType.FAVORITED_BY, author, :2] = [2, 3]
    tables = graph_features.GraphTables(jnp.asarray(nbrs))

    cands = [Candidate(id=0, features={"author_id": author})]
    fh.GraphFeatureServiceHydrator(tables).hydrate(Query(user_id=0), cands, None)
    feats = cands[0].features
    key = [k for k in feats if "fav" in k and not k.endswith("_normalized")]
    assert key and any(feats[k] == 1.0 for k in key)


def test_rsx_hydrator_block_names_and_range():
    K = 4
    cand_emb = SparseEmbedding(
        jnp.asarray([[0, 1, PAD_ID, PAD_ID], [2, 3, PAD_ID, PAD_ID]], jnp.int32),
        jnp.asarray([[1.0, 0.5, 0, 0], [1.0, 0.5, 0, 0]], jnp.float32),
    )
    eng = rsx.EngagementSet(
        embeddings=SparseEmbedding(
            jnp.asarray([[0, 1, PAD_ID, PAD_ID]], jnp.int32),
            jnp.asarray([[1.0, 0.5, 0, 0]], jnp.float32),
        ),
        signal_type=jnp.asarray([0], jnp.int32),
        timestamp=jnp.asarray([900], jnp.int32),
        valid=jnp.asarray([True]),
    )
    cands = _cands(2)
    fh.SimClustersEngagementSimilarityFeatureHydrator(
        lambda ids: cand_emb, lambda uid: eng
    ).hydrate(Query(now=1000), cands, None)
    # candidate 0 has identical embedding to the engagement -> cosine 1
    sims = [v for k, v in cands[0].features.items() if k.endswith("_max")]
    assert max(sims) > 0.99
    sims1 = [v for k, v in cands[1].features.items() if k.endswith("_max")]
    assert max(sims1) < 0.01


def test_twhin_hydrator_dots():
    U = np.eye(4, 8, dtype=np.float32)
    T = np.eye(6, 8, dtype=np.float32)
    cands = [Candidate(id=0), Candidate(id=1)]
    fh.TwhinEmbeddingFeatureHydrator(U, T, negative_user_table=U * 2).hydrate(
        Query(user_id=0), cands, None
    )
    assert cands[0].features["twhin_user_tweet_dot"] == 1.0
    assert cands[1].features["twhin_user_tweet_dot"] == 0.0
    assert cands[0].features["twhin_user_negative_dot"] == 2.0


def test_aggregates_hydrator_decayed_read():
    group = aggregation.AggregateGroup(
        name="author_agg",
        features=("fav_count",),
        labels=("any",),
        metrics=("count", "sum"),
        half_lives_s=(86400.0,),
    )
    store = aggregation.init_store(group, capacity=8)
    resolver = aggregation.KeyResolver(capacity=8)
    rows = resolver.resolve([(100,)])
    store = aggregation.update(
        group, store, jnp.asarray(rows),
        jnp.asarray([[3.0]]), jnp.asarray([[1.0]]),
        jnp.asarray([0], jnp.int32),
    )
    cands = [Candidate(id=0, features={"author_id": 100}),
             Candidate(id=1, features={"author_id": 999})]
    fh.AggregatesFeatureHydrator(group, store, resolver).hydrate(
        Query(now=86400), cands, None
    )
    names = group.output_names()
    count_name = [n for n in names if ".count." in n][0]
    # one event, one half-life elapsed -> 0.5
    np.testing.assert_allclose(cands[0].features[count_name], 0.5, rtol=1e-5)
    assert cands[1].features[count_name] == 0.0


def test_uss_query_hydrator():
    store = user_signals.init_store(num_users=4, width=8)
    store = user_signals.record(
        store,
        np.asarray([1, 1]),
        np.asarray([int(user_signals.SignalType.TWEET_FAVORITE)] * 2),
        np.asarray([77, 88]),
        np.asarray([10, 20]),
    )
    feats = fh.RecentEngagementsQueryHydrator(store).hydrate(Query(user_id=1), None)
    assert set(feats["recent_engagement_ids"].tolist()) == {77, 88}


def test_scribe_and_bloom_side_effects():
    lines = []
    se = fh.ScribeServedCandidatesSideEffect(lines.append)
    result = [Candidate(id=5, score=1.5, source="sann",
                        features={"predicted_fav": 0.9, "other": 1.0})]
    se.run(Query(user_id=3), result, None)
    import json

    rec = json.loads(lines[0])
    assert rec["user_id"] == 3
    assert rec["candidates"][0]["predicted"] == {"predicted_fav": 0.9}
    assert "other" not in rec["candidates"][0]["predicted"]

    bloom = fh.ImpressionBloomFilterSideEffect()
    bloom.run(Query(user_id=3), result, None)
    assert bloom.seen(3, 5)
    assert not bloom.seen(3, 6)
    assert not bloom.seen(4, 5)
