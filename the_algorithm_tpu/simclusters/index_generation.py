"""Offline cluster→tweet index generation from engagement event logs.

≡ the scio/BigQuery index jobs (``src/scala/com/twitter/simclusters_v2/scio/
bq_generation/simclusters_index_generation/
EngagementEventBasedClusterToTweetIndexGenerationJob.scala`` and its
video-view variant, plus ``tweets_ann/``, SURVEY.md §2.1): a *batch*
recompute of the realtime index — read a window of UUA engagement events,
join each event with the engaging user's InterestedIn embedding, weight by
event type and time decay, aggregate per tweet, truncate to each tweet's
top clusters, and emit the cluster→top-M-tweets index the SANN scan serves.

TPU design: the whole job is one jitted program — the "join" is a gather
from the user-embedding table; per-(tweet,cluster) aggregation is a global
sort + run-segmented prefix-sum (the sumByKey); the two truncations
(top-K clusters/tweet, top-M tweets/cluster) are ranked scatters — the same
machinery as :func:`the_algorithm_tpu.simclusters.tweet_embeddings.
build_cluster_index`, but sourced from raw logs instead of streaming state.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from the_algorithm_tpu.ops.retrieval import ClusterTweetIndex
from the_algorithm_tpu.ops.sparse import PAD_ID, SparseEmbedding


@dataclasses.dataclass(frozen=True)
class IndexGenerationConfig:
    """≡ the job's config knobs (event weights from the BQ SQL templates)."""

    num_clusters: int
    num_tweets: int
    clusters_per_tweet: int = 20  # tweet-embedding truncation
    tweets_per_cluster: int = 400  # index row width (prod M=400)
    half_life_s: float = 8 * 3600.0
    min_engagements: int = 1  # ≡ minFavoriteCount gate for the batch job
    # per-event-type weights (fav, retweet, reply, video_view, push_open …)
    event_weights: tuple = (1.0, 1.0, 1.0, 0.5, 0.5)


class EventLog(NamedTuple):
    """A window of engagement events (host-or-device arrays)."""

    user_rows: jnp.ndarray  # [E] int32 row into the InterestedIn table
    tweet_ids: jnp.ndarray  # [E] int32 (dense tweet row ids < num_tweets)
    event_type: jnp.ndarray  # [E] int32 index into event_weights
    timestamps: jnp.ndarray  # [E] int32 seconds


def _run_rank(keys: jnp.ndarray) -> jnp.ndarray:
    """Rank of each element within its run of equal (sorted) keys."""
    n = keys.shape[0]
    idx = jnp.arange(n)
    prev = jnp.concatenate([jnp.full((1,), -1, keys.dtype), keys[:-1]])
    is_start = keys != prev
    run_start = jax.lax.cummax(jnp.where(is_start, idx, 0), axis=0)
    return idx - run_start


def generate_cluster_to_tweet_index(
    events: EventLog,
    interested_in_ids: jnp.ndarray,  # [U, K] int32 user InterestedIn clusters
    interested_in_scores: jnp.ndarray,  # [U, K] float32
    config: IndexGenerationConfig,
    now: jnp.ndarray,
) -> ClusterTweetIndex:
    """The full batch job as one XLA program."""
    C, T = config.num_clusters, config.num_tweets
    E = events.user_rows.shape[0]
    K = interested_in_ids.shape[1]
    w_table = jnp.asarray(config.event_weights, jnp.float32)

    # 1. join: every event expands to the user's K (cluster, score) entries
    u_ids = interested_in_ids[events.user_rows]  # [E, K]
    u_scores = interested_in_scores[events.user_rows]
    decay = jnp.exp2(
        -jnp.maximum(now - events.timestamps, 0).astype(jnp.float32)
        / config.half_life_s
    )
    w = (w_table[events.event_type] * decay)[:, None]  # [E, 1]
    valid = u_ids != PAD_ID
    contrib = jnp.where(valid, u_scores * w, 0.0)

    tweet = jnp.broadcast_to(events.tweet_ids[:, None], (E, K))
    # 2. sumByKey over (tweet, cluster): sort by composite key + run segments
    key = jnp.where(
        valid, tweet.astype(jnp.int64) * C + u_ids.astype(jnp.int64),
        jnp.int64(T) * C,
    ).reshape(-1)
    key_s, val_s = jax.lax.sort((key, contrib.reshape(-1)), num_keys=1)
    # run-segmented totals: run r's sum = cumsum at its end − cumsum at the
    # previous run's end; end-of-run cumsums are scattered into dense run
    # slots (run index = cumsum(is_start) − 1)
    n = key_s.shape[0]
    pad_key = jnp.int64(T) * C
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int64), key_s[:-1]])
    is_start = key_s != prev
    is_end = jnp.concatenate([is_start[1:], jnp.ones((1,), bool)])
    csum = jnp.cumsum(val_s)
    run_idx = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    scatter_to = jnp.where(is_end, run_idx, n)
    totals = jnp.zeros(n).at[scatter_to].add(
        jnp.where(is_end, csum, 0.0), mode="drop"
    )
    prev_totals = jnp.concatenate([jnp.zeros(1), totals[:-1]])
    run_sum = totals - prev_totals  # [≤n runs] per-(tweet,cluster) score
    run_keys = jnp.full(n, pad_key, jnp.int64).at[
        jnp.where(is_start, run_idx, n)
    ].set(jnp.where(is_start, key_s, pad_key), mode="drop")

    run_tweet = (run_keys // C).astype(jnp.int32)
    run_cluster = (run_keys % C).astype(jnp.int32)
    real = run_keys < pad_key

    # 3. per-tweet engagement gate (≡ minFavoriteCount): count *events*, not
    # the per-cluster expansions
    tweet_eng = jnp.zeros(T).at[events.tweet_ids].add(1.0, mode="drop")
    gated = real & (
        tweet_eng[jnp.clip(run_tweet, 0, T - 1)] >= config.min_engagements
    )

    # 4. truncate to top-Kt clusters per tweet: sort by (tweet, score desc)
    sort_t = jnp.where(gated, run_tweet, T)
    st, sneg, sc, ssum = jax.lax.sort(
        (sort_t, -run_sum, run_cluster, run_sum), num_keys=2
    )
    rank_t = _run_rank(st)
    keep = (st < T) & (rank_t < config.clusters_per_tweet) & (ssum > 0)

    # 5. build cluster→top-M index: sort kept entries by (cluster, score desc)
    sort_c = jnp.where(keep, sc, C)
    cc, cneg, ct, cs = jax.lax.sort((sort_c, -ssum, st, ssum), num_keys=2)
    rank_c = _run_rank(cc)
    ok = (cc < C) & (rank_c < config.tweets_per_cluster) & (cs > 0)
    out_c = jnp.where(ok, cc, C)
    out_r = jnp.where(ok, rank_c, config.tweets_per_cluster)

    M = config.tweets_per_cluster
    tweet_ids = jnp.full((C, M), PAD_ID, jnp.int32)
    scores = jnp.zeros((C, M), jnp.float32)
    ts = jnp.zeros((C, M), jnp.int32)
    tweet_ids = tweet_ids.at[out_c, out_r].set(ct, mode="drop")
    scores = scores.at[out_c, out_r].set(cs, mode="drop")
    return ClusterTweetIndex(tweet_ids, scores, ts)


def generate_cluster_to_tweet_index_reference(
    events: EventLog,
    interested_in_ids,
    interested_in_scores,
    config: IndexGenerationConfig,
    now: int,
):
    """Literal dict-of-dicts oracle (the BQ SQL semantics) for parity tests."""
    import numpy as np

    u_ids = np.asarray(interested_in_ids)
    u_sc = np.asarray(interested_in_scores)
    acc: dict = {}
    eng: dict = {}
    for e in range(len(np.asarray(events.user_rows))):
        u = int(np.asarray(events.user_rows)[e])
        t = int(np.asarray(events.tweet_ids)[e])
        ty = int(np.asarray(events.event_type)[e])
        ts = int(np.asarray(events.timestamps)[e])
        w = config.event_weights[ty] * 2.0 ** (
            -max(now - ts, 0) / config.half_life_s
        )
        eng[t] = eng.get(t, 0) + 1
        for k in range(u_ids.shape[1]):
            c = int(u_ids[u, k])
            if c == int(PAD_ID):
                continue
            acc.setdefault(t, {})
            acc[t][c] = acc[t].get(c, 0.0) + float(u_sc[u, k]) * w
    index: dict = {}
    for t, clusters in acc.items():
        if eng.get(t, 0) < config.min_engagements:
            continue
        top = sorted(clusters.items(), key=lambda kv: -kv[1])[
            : config.clusters_per_tweet
        ]
        for c, s in top:
            if s > 0:
                index.setdefault(c, []).append((t, s))
    for c in index:
        index[c] = sorted(index[c], key=lambda p: -p[1])[
            : config.tweets_per_cluster
        ]
    return index
