"""Realtime tweet SimClusters embeddings + cluster→tweet index build.

Reference: the Summingbird/Storm streaming job
(``src/scala/com/twitter/simclusters_v2/summingbird/storm/TweetJob.scala:33-110``):
on each fav event, the faver's InterestedIn vector is added into the tweet's
embedding under an 8-hour-half-life decayed-value monoid
(``summingbird/common/ThriftDecayedValueMonoid.scala``), maintaining
tweet→top-400-clusters and cluster→top-1600-tweets indexes. Constants from
``summingbird/common/Configs.scala:36-69``: topKTweetsPerCluster=1600,
topKClustersPerTweet=400, HalfLife=8h, MinFavoriteCount=8; filters: no
self-favs, tweet age < 3 days (``TweetJob.scala:53-58``).

TPU re-design (SURVEY.md §3.4): the memcache-backed monoid store becomes a
**device-resident sparse tweet table** updated by a ``lax.scan`` over the
event batch (events apply in timestamp order, exactly like the stream), with
decay folded in at update and at index-build time. The cluster→tweet top-K
index is (re)built by one multi-key sort + rank-scatter — no host round
trips (SURVEY.md "hard parts": incremental top-K under decay).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from the_algorithm_tpu.ops import sparse
from the_algorithm_tpu.ops.retrieval import ClusterTweetIndex
from the_algorithm_tpu.ops.sparse import PAD_ID, SparseEmbedding

SECONDS_PER_HOUR = 3600


@dataclasses.dataclass(frozen=True)
class TweetEmbeddingConfig:
    """≡ ``summingbird/common/Configs.scala:36-69`` defaults (scaled-down
    capacities are fine for tests; prod values are the defaults here)."""

    clusters_per_tweet: int = 400  # topKClustersPerTweet
    tweets_per_cluster: int = 1600  # topKTweetsPerCluster
    half_life_s: int = 8 * SECONDS_PER_HOUR  # HalfLife = 8.hours
    min_favorite_count: int = 8  # MinFavoriteCount
    max_tweet_age_s: int = 3 * 24 * SECONDS_PER_HOUR  # age < 3 days
    clusters_per_user_contribution: int = 25  # faver's top clusters used


class TweetEmbeddingState(NamedTuple):
    """Sparse tweet→cluster table with per-tweet decay timestamps."""

    cluster_ids: jnp.ndarray  # [T, Kt] int32, PAD_ID padded
    scores: jnp.ndarray  # [T, Kt] f32, valid at time last_ts[t]
    last_ts: jnp.ndarray  # [T] int32 — last decay reference time
    fav_count: jnp.ndarray  # [T] int32
    created_ts: jnp.ndarray  # [T] int32
    author: jnp.ndarray  # [T] int32 — for the self-fav filter


def init_state(
    num_tweets: int,
    clusters_per_tweet: int,
    created_ts: jnp.ndarray,
    author: jnp.ndarray,
) -> TweetEmbeddingState:
    T, Kt = num_tweets, clusters_per_tweet
    return TweetEmbeddingState(
        cluster_ids=jnp.full((T, Kt), PAD_ID, jnp.int32),
        scores=jnp.zeros((T, Kt), jnp.float32),
        last_ts=jnp.asarray(created_ts, jnp.int32),
        fav_count=jnp.zeros((T,), jnp.int32),
        created_ts=jnp.asarray(created_ts, jnp.int32),
        author=jnp.asarray(author, jnp.int32),
    )


def _decay_factor(dt_s: jnp.ndarray, half_life_s: float) -> jnp.ndarray:
    return jnp.exp2(-jnp.maximum(dt_s, 0).astype(jnp.float32) / half_life_s)


def apply_fav_events(
    state: TweetEmbeddingState,
    user_interests: SparseEmbedding,  # [U, K] per-user InterestedIn table
    user_ids: jnp.ndarray,  # [B] int32
    tweet_ids: jnp.ndarray,  # [B] int32
    timestamps: jnp.ndarray,  # [B] int32, non-decreasing (stream order)
    config: TweetEmbeddingConfig,
) -> TweetEmbeddingState:
    """Fold a batch of fav events into the tweet table (``TweetJob.generate``).

    One ``lax.scan`` step per event: decay the tweet row to the event time,
    merge-add the faver's top clusters, write back. Duplicate tweets within
    the batch compose correctly because steps run in stream order.
    """
    Kc = min(config.clusters_per_user_contribution, user_interests.capacity)

    def step(carry: TweetEmbeddingState, ev):
        u, t, ts = ev
        # filters (TweetJob.scala:53-58): no self-fav, age < 3 days
        age_ok = (ts - carry.created_ts[t]) < config.max_tweet_age_s
        not_self = carry.author[t] != u
        do_apply = age_ok & not_self

        old = SparseEmbedding(carry.cluster_ids[t], carry.scores[t])
        decay = _decay_factor(ts - carry.last_ts[t], config.half_life_s)
        old = sparse.scale(old, decay)
        contrib = SparseEmbedding(
            user_interests.ids[u, :Kc], user_interests.scores[u, :Kc]
        )
        merged = sparse.add(old, contrib, old.capacity)

        new_ids = jnp.where(do_apply, merged.ids, carry.cluster_ids[t])
        new_scores = jnp.where(do_apply, merged.scores, carry.scores[t])
        carry = carry._replace(
            cluster_ids=carry.cluster_ids.at[t].set(new_ids),
            scores=carry.scores.at[t].set(new_scores),
            last_ts=carry.last_ts.at[t].set(
                jnp.where(do_apply, ts, carry.last_ts[t])
            ),
            fav_count=carry.fav_count.at[t].add(
                jnp.where(do_apply, 1, 0)
            ),
        )
        return carry, ()

    out, _ = jax.lax.scan(
        step, state, (user_ids, tweet_ids, timestamps)
    )
    return out


def tweet_embedding_at(
    state: TweetEmbeddingState, tweet_id: jnp.ndarray, now: jnp.ndarray,
    half_life_s: float,
) -> SparseEmbedding:
    """Read one tweet's embedding decayed to ``now`` (read-time decay)."""
    decay = _decay_factor(now - state.last_ts[tweet_id], half_life_s)
    return SparseEmbedding(
        state.cluster_ids[tweet_id], state.scores[tweet_id] * decay
    )


def build_cluster_index(
    state: TweetEmbeddingState,
    num_clusters: int,
    config: TweetEmbeddingConfig,
    now: jnp.ndarray,
) -> ClusterTweetIndex:
    """Build cluster→top-M tweets from the tweet table in one sorted pass.

    ≡ the ClusterTopKTweetsNode maintained by the streaming job
    (``TweetJob.scala:84-99``). Flatten all (cluster, tweet, score) entries,
    decay to ``now``, drop tweets with < MinFavoriteCount favs, multi-key
    sort by (cluster asc, score desc), compute each entry's rank within its
    cluster run, scatter ranks < M into the [C, M] index.
    """
    T, Kt = state.cluster_ids.shape
    M = config.tweets_per_cluster

    decay = _decay_factor(now - state.last_ts, config.half_life_s)  # [T]
    eligible = state.fav_count >= config.min_favorite_count  # [T]
    scores = state.scores * decay[:, None]
    valid = (state.cluster_ids != PAD_ID) & eligible[:, None] & (scores > 0)

    flat_c = jnp.where(valid, state.cluster_ids, jnp.int32(num_clusters)).reshape(-1)
    flat_s = jnp.where(valid, scores, 0.0).reshape(-1)
    flat_t = jnp.broadcast_to(
        jnp.arange(T, dtype=jnp.int32)[:, None], (T, Kt)
    ).reshape(-1)
    flat_ts = jnp.broadcast_to(state.created_ts[:, None], (T, Kt)).reshape(-1)

    # lexicographic sort: cluster ascending, then score descending
    c_sorted, negs_sorted, t_sorted, ts_sorted = jax.lax.sort(
        (flat_c, -flat_s, flat_t, flat_ts), num_keys=2
    )
    s_sorted = -negs_sorted

    n = flat_c.shape[0]
    idx = jnp.arange(n)
    prev_c = jnp.concatenate([jnp.full((1,), -1, jnp.int32), c_sorted[:-1]])
    is_start = c_sorted != prev_c
    run_start = jax.lax.cummax(jnp.where(is_start, idx, 0), axis=0)
    rank = idx - run_start

    ok = (c_sorted < num_clusters) & (rank < M) & (s_sorted > 0)
    # rejected entries get out-of-range indices so mode="drop" discards them
    # (never index 0,0 — that would clobber a real slot)
    out_c = jnp.where(ok, c_sorted, num_clusters)
    out_r = jnp.where(ok, rank, M)

    tweet_ids = jnp.full((num_clusters, M), PAD_ID, jnp.int32)
    out_scores = jnp.zeros((num_clusters, M), jnp.float32)
    out_ts = jnp.zeros((num_clusters, M), jnp.int32)
    tweet_ids = tweet_ids.at[out_c, out_r].set(t_sorted, mode="drop")
    out_scores = out_scores.at[out_c, out_r].set(s_sorted, mode="drop")
    out_ts = out_ts.at[out_c, out_r].set(ts_sorted, mode="drop")
    return ClusterTweetIndex(tweet_ids, out_scores, out_ts)
