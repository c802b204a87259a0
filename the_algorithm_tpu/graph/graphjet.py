"""GraphJet graph family: UTG / UVG related-tweets + UUG user recs.

≡ ``src/scala/com/twitter/recos/{user_tweet_graph,user_video_graph,
user_user_graph}/`` (GraphJet in-memory bipartite engagement graphs over a
24-48h window, fed by recos-injector): UTEG's siblings. UTG/UVG serve
*tweet-based* queries — "tweets co-engaged with this tweet" via a two-hop
traversal (tweet → engaging users → their other tweets) with
cosine-normalized co-engagement counts (the ``relatedTweets``/
``tweetBasedUserTweetGraph`` similarity used by cr-mixer's
``TweetBasedUserTweetGraphSimilarityEngine``); UVG is the same over
video-only edges; UUG records user→user interactions and answers
"users my circle engaged" (≡ ``UserUserGraph`` recs).

TPU design (same shape as :mod:`the_algorithm_tpu.graph.uteg`): both sides
of the bipartite graph are fixed-width ring-buffered device tables (left:
user → engaged tweets; right: tweet → engaging users); a two-hop query is
gather → gather → flatten → dedup-sum by id → normalize → top-K, one jitted
program.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from the_algorithm_tpu.graph.uteg import EngagementGraph
from the_algorithm_tpu.ops.retrieval import _dedup_sum
from the_algorithm_tpu.ops.sparse import PAD_ID


class RightIndex(NamedTuple):
    """Right side of the bipartite graph: tweet → last-W engaging users."""

    user_ids: jnp.ndarray  # [T, W] int32, PAD_ID padded (newest first)
    timestamps: jnp.ndarray  # [T, W] int32


def init_right_index(num_tweets: int, width: int = 128) -> RightIndex:
    return RightIndex(
        jnp.full((num_tweets, width), PAD_ID, jnp.int32),
        jnp.zeros((num_tweets, width), jnp.int32),
    )


def record_right(
    index: RightIndex,
    tweet_ids: np.ndarray,
    user_ids: np.ndarray,
    timestamps: np.ndarray,
) -> RightIndex:
    """Host-side batch append (mirrors ``uteg.record_engagements``)."""
    u = np.asarray(index.user_ids).copy()
    ts = np.asarray(index.timestamps).copy()
    for t, us, tm in zip(tweet_ids, user_ids, timestamps):
        u[t, 1:] = u[t, :-1]
        ts[t, 1:] = ts[t, :-1]
        u[t, 0] = us
        ts[t, 0] = tm
    return RightIndex(jnp.asarray(u), jnp.asarray(ts))


def degree(rows: jnp.ndarray) -> jnp.ndarray:
    """#real entries per ring-buffer row."""
    return (rows != PAD_ID).sum(axis=-1)


def related_tweets(
    left: EngagementGraph,  # user → tweets
    right: RightIndex,  # tweet → users
    source_tweet_id: jnp.ndarray,  # scalar int32
    *,
    max_results: int,
    min_cooccurrence: int = 1,
    min_timestamp: Optional[jnp.ndarray] = None,
    candidate_mask: Optional[jnp.ndarray] = None,  # [T] bool (UVG: is_video)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Two-hop co-engagement similarity (≡ UTG ``relatedTweets``).

    score(c) = cooc(source, c) / √(deg(source)·deg(c)) — cosine over the
    binary engagement incidence, the GraphJet related-tweet ranking; returns
    (tweet_ids[X], scores[X], cooccurrence_counts[X]). ``candidate_mask``
    restricts candidates (UVG = UTG with a video-tweet mask).
    """
    users = right.user_ids[source_tweet_id]  # [W] engaging users
    u_ts = right.timestamps[source_tweet_id]
    u_valid = users != PAD_ID
    if min_timestamp is not None:
        u_valid &= u_ts >= min_timestamp
    safe_u = jnp.where(u_valid, users, 0)

    rows_t = left.tweet_ids[safe_u]  # [W, Wl] those users' other tweets
    rows_ts = left.timestamps[safe_u]
    valid = (rows_t != PAD_ID) & u_valid[:, None]
    if min_timestamp is not None:
        valid &= rows_ts >= min_timestamp
    valid &= rows_t != source_tweet_id  # don't return the source
    if candidate_mask is not None:
        safe_t = jnp.where(valid, rows_t, 0)
        valid &= candidate_mask[safe_t]

    flat_ids = jnp.where(valid, rows_t, PAD_ID).reshape(-1)
    ones = valid.astype(jnp.float32).reshape(-1)
    uniq, cooc, _ = _dedup_sum(flat_ids, ones, ones)

    deg_src = jnp.maximum(degree(users[None, :])[0], 1).astype(jnp.float32)
    safe_uniq = jnp.where(uniq != PAD_ID, uniq, 0)
    deg_cand = jnp.maximum(degree(right.user_ids[safe_uniq]), 1).astype(
        jnp.float32
    )
    score = cooc / jnp.sqrt(deg_src * deg_cand)

    ok = (uniq != PAD_ID) & (cooc >= min_cooccurrence)
    masked = jnp.where(ok, score, -jnp.inf)
    k = min(max_results, masked.shape[0])
    top_s, idx = jax.lax.top_k(masked, k)
    out_ids = jnp.where(jnp.isfinite(top_s), uniq[idx], PAD_ID)
    out_cooc = jnp.where(jnp.isfinite(top_s), cooc[idx], 0.0)
    return out_ids, top_s, out_cooc


def related_tweets_batch(
    left: EngagementGraph,
    right: RightIndex,
    source_tweet_ids: jnp.ndarray,  # [B]
    **kw,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    return jax.vmap(
        lambda t: related_tweets(left, right, t, **kw)
    )(source_tweet_ids)


# -- UUG ----------------------------------------------------------------------


class UserUserGraph(NamedTuple):
    """user → recently-engaged users (follows/favs/mentions of authors)."""

    user_ids: jnp.ndarray  # [U, W] int32 PAD_ID padded
    interaction_type: jnp.ndarray  # [U, W] int32
    timestamps: jnp.ndarray  # [U, W] int32


def init_user_user(num_users: int, width: int = 64) -> UserUserGraph:
    return UserUserGraph(
        jnp.full((num_users, width), PAD_ID, jnp.int32),
        jnp.zeros((num_users, width), jnp.int32),
        jnp.zeros((num_users, width), jnp.int32),
    )


def record_user_user(
    graph: UserUserGraph,
    src_users: np.ndarray,
    dst_users: np.ndarray,
    types: np.ndarray,
    timestamps: np.ndarray,
) -> UserUserGraph:
    u = np.asarray(graph.user_ids).copy()
    e = np.asarray(graph.interaction_type).copy()
    ts = np.asarray(graph.timestamps).copy()
    for s, d, ty, tm in zip(src_users, dst_users, types, timestamps):
        u[s, 1:] = u[s, :-1]
        e[s, 1:] = e[s, :-1]
        ts[s, 1:] = ts[s, :-1]
        u[s, 0] = d
        e[s, 0] = ty
        ts[s, 0] = tm
    return UserUserGraph(jnp.asarray(u), jnp.asarray(e), jnp.asarray(ts))


def recommend_users(
    graph: UserUserGraph,
    seed_ids: jnp.ndarray,  # [S] the query user's circle
    seed_weights: jnp.ndarray,  # [S]
    *,
    max_results: int,
    exclude_ids: Optional[jnp.ndarray] = None,  # already-followed users
    min_social_proof: int = 1,
    min_timestamp: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """"Users my circle engaged" (≡ ``UserUserGraph`` query path):
    score(u) = Σ_{seed s→u} weight(s), social proof = #distinct seeds."""
    valid_seed = seed_ids != PAD_ID
    safe_seed = jnp.where(valid_seed, seed_ids, 0)
    rows_u = graph.user_ids[safe_seed]  # [S, W]
    rows_ts = graph.timestamps[safe_seed]
    valid = (rows_u != PAD_ID) & valid_seed[:, None]
    if min_timestamp is not None:
        valid &= rows_ts >= min_timestamp
    # never recommend the seeds themselves
    valid &= ~(rows_u[:, :, None] == seed_ids[None, None, :]).any(-1)
    if exclude_ids is not None:
        valid &= ~(rows_u[:, :, None] == exclude_ids[None, None, :]).any(-1)

    w = jnp.where(valid, seed_weights[:, None], 0.0)
    flat_ids = jnp.where(valid, rows_u, PAD_ID).reshape(-1)
    uniq, scores, proof = _dedup_sum(
        flat_ids, w.reshape(-1), valid.astype(jnp.float32).reshape(-1)
    )
    ok = (uniq != PAD_ID) & (proof >= min_social_proof)
    masked = jnp.where(ok, scores, -jnp.inf)
    k = min(max_results, masked.shape[0])
    top_s, idx = jax.lax.top_k(masked, k)
    out_ids = jnp.where(jnp.isfinite(top_s), uniq[idx], PAD_ID)
    out_proof = jnp.where(jnp.isfinite(top_s), proof[idx], 0.0)
    return out_ids, top_s, out_proof
