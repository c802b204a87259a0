"""Streaming updates into the live serve tables — freshness parity.

An event folded by the LiveUpdater must move the very next request's
scores (aggregate features), match the host aggregation framework's fold
bit-for-tolerance, and move retrieval after an index refresh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from the_algorithm_tpu.features import aggregation
from the_algorithm_tpu.mixers import device_hydration as dh
from the_algorithm_tpu.mixers import feature_schema as fsch
from the_algorithm_tpu.mixers import home_mixer
from the_algorithm_tpu.mixers import live_updates as lu
from the_algorithm_tpu.mixers import wide_hydrators as wh
from the_algorithm_tpu.models import masknet
from the_algorithm_tpu.pipeline.component import Candidate

from test_device_hydration import make_candidates, A, NOW


@pytest.fixture(scope="module")
def live_world():
    world = wh.synthetic_world(
        seed=3, num_users=32, num_authors=A, num_tweets=1 << 12,
        engagement_width=8, now=NOW, include_device_spec=True,
    )
    spec = world.pop("device_spec")
    tables, fns, resolvers = dh.build_from_world(world, spec)
    F = fsch.total_width(fsch.WIDE_SCHEMA)
    cfg = masknet.MaskNetConfig(
        num_features=F, num_heads=4, mask_blocks=1, block_dim=32,
        aggregation_dim=16, head_hidden=(16,), dtype="float32",
    )
    model = masknet.MaskNet(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, F)))
    weights = jnp.asarray([1.0, 0.5, 0.25, 0.125])
    scorer = dh.DeviceHydrationScorer(
        tables, fns, resolvers, model, params, weights,
        pad_b=128, compute_dtype=jnp.float32,
    )
    return scorer


def _one_request(scorer, cands, user_id=5):
    q = home_mixer.ForYouQuery(
        user_id=user_id, followed_authors=[1, 2, 3], max_results=50,
        now=NOW)
    return scorer.score_requests([(q, cands)])[0]


def test_event_moves_next_request_scores(live_world):
    """A tweet faved mid-serve changes its score in the next request."""
    scorer = live_world
    updater = lu.LiveUpdater(scorer)
    cands = make_candidates(12)
    target = cands[0]

    probs0, combined0 = _one_request(scorer, cands)

    # 32 favs + retweets for the target tweet between requests
    events = [(7 + i, int(target.id),
               int(target.features["author_id"]),
               "fav" if i % 2 == 0 else "retweet", NOW - 50 + i)
              for i in range(32)]
    counts = updater.apply(lu.batch_from_actions(events))
    assert counts["events"] == 32
    assert counts["tweet_agg"] == 32

    probs1, combined1 = _one_request(scorer, cands)
    assert combined0[0] != combined1[0], "fav burst did not move the score"
    # untouched candidates whose stores the events never keyed stay put
    # (user_agg for the viewer did not change: events came from other users)
    moved = np.abs(combined1 - combined0) > 1e-9
    assert moved[0]


def test_fold_matches_host_aggregation_framework(live_world):
    """The device fold == aggregation.update on the host, read through the
    serve-path decay-expose math."""
    scorer = live_world
    updater = lu.LiveUpdater(scorer)
    si = dh.CAND_KEYED_AGG.index("tweet_agg")
    resolver = scorer.builder.resolvers["tweet_agg"]
    group = updater.group

    tweet = 777_001
    events = [(3, tweet, 9, "fav", NOW - 100),
              (4, tweet, 9, "reply", NOW - 80),
              (5, tweet, 9, "fav", NOW - 60)]
    # host-side expected fold on a copy of the CURRENT store row state
    rows_before = resolver.lookup([(tweet,)])
    store_host = aggregation.AggregateStore(
        jnp.asarray(np.asarray(scorer.tables.agg_values[si])),
        jnp.asarray(np.asarray(scorer.tables.agg_last_ts[si])))

    updater.apply(lu.batch_from_actions(events))
    row = int(resolver.lookup([(tweet,)])[0])
    assert row >= 0

    label_idx = [lu.LABEL_OF_ACTION[a] for a in ("fav", "reply", "fav")]
    onehot = np.zeros((3, len(group.labels)), np.float32)
    onehot[np.arange(3), label_idx] = 1.0
    if rows_before[0] < 0:
        # new key: the updater allocated `row`; fold into the same row
        pass
    want = aggregation.update(
        group, store_host,
        jnp.asarray([row, row, row], jnp.int32),
        jnp.ones((3, 1), jnp.float32), jnp.asarray(onehot),
        jnp.asarray([NOW - 100, NOW - 80, NOW - 60], jnp.int32))
    got_vals = np.asarray(scorer.tables.agg_values[si][row])
    np.testing.assert_allclose(
        got_vals, np.asarray(want.values[row]), rtol=1e-5, atol=1e-6)
    assert int(scorer.tables.agg_last_ts[si][row]) == NOW - 60


def test_uss_and_engagement_rings_advance(live_world):
    scorer = live_world
    updater = lu.LiveUpdater(scorer)
    U_s = scorer.tables.uss_ids.shape[0]
    u = 11
    events = [(u, 555_000 + i, 2, "fav", NOW - 10 + i) for i in range(3)]
    updater.apply(lu.batch_from_actions(events))
    from the_algorithm_tpu.features.user_signals import SignalType

    ring = np.asarray(
        scorer.tables.uss_ids[u % U_s, int(SignalType.TWEET_FAVORITE)])
    # newest first
    assert ring[0] == 555_002 and ring[1] == 555_001 and ring[2] == 555_000
    U_e = scorer.tables.eng_ids.shape[0]
    eng = np.asarray(scorer.tables.eng_ids[u % U_e])
    assert eng[0] == 555_002
    assert int(scorer.tables.eng_type[u % U_e][0]) == lu.ENG_OF_ACTION["fav"]


def test_refresh_moves_retrieval(live_world):
    """Fav burst + refresh_index: the tweet enters the cluster index and
    ranks for users interested in its favers' clusters."""
    from the_algorithm_tpu.simclusters import tweet_embeddings as te
    from the_algorithm_tpu.simclusters import ann

    scorer = live_world
    T, K, U = 256, 8, 16
    rng = np.random.default_rng(0)
    state = te.init_state(
        T, K,
        created_ts=jnp.full((T,), NOW - 3600, jnp.int32),
        author=jnp.asarray(rng.integers(0, 8, T).astype(np.int32)))
    # every user interested in cluster (u % 4) with weight 1
    ui = lu.SparseEmbedding(
        jnp.asarray((np.arange(U)[:, None] % 4).astype(np.int32)),
        jnp.ones((U, 1), np.float32))
    cfg = te.TweetEmbeddingConfig(
        clusters_per_tweet=K, tweets_per_cluster=4, min_favorite_count=2,
        clusters_per_user_contribution=1)
    updater = lu.LiveUpdater(
        scorer, emb_state=state, user_interests=ui, emb_config=cfg,
        num_clusters=4)

    tweet = 99  # favers are users ≡ 1 (mod 4) → mass in cluster 1
    events = [(1 + 4 * i, tweet, 3, "fav", NOW - 30 + i) for i in range(4)]
    updater.apply(lu.batch_from_actions(events))
    index = updater.refresh_index(NOW)
    row = np.asarray(index.tweet_ids[1])
    assert tweet in row, (row, np.asarray(index.scores[1]))

    # and it retrieves for a cluster-1 user
    src = lu.SparseEmbedding(
        jnp.asarray([[1]], jnp.int32), jnp.ones((1, 1), jnp.float32))
    cfg_ann = ann.SimClustersANNConfig(
        max_scan_clusters=1, max_top_tweets_per_cluster=4,
        max_num_results=4, max_tweet_candidate_age_hours=10**6)
    ids, scores = ann.get_tweet_candidates_batch(index, src, cfg_ann)
    assert tweet in set(np.asarray(ids[0]).tolist())
