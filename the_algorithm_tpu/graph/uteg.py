"""UTEG: user-tweet engagement-graph collaborative filtering.

≡ ``src/scala/com/twitter/recos/user_tweet_entity_graph/`` (GraphJet;
README:1-18): an in-memory bipartite user↔tweet graph over the last 24-48h
of engagements, fed by Kafka (via recos-injector); a query seeds from the
user's weighted follow/RealGraph circle, traverses seeds' recent
engagements, and aggregates per-tweet weighted counts → "liked by people
you follow" candidates with social proof.

TPU design: the left-index (user → recent engaged tweets) is a fixed-width
ring-buffered device table; a query is gather(seed rows) → flatten →
dedup-sum by tweet id (``row_dedup_sum`` 1-row) → top-K — the same shape as
the SANN kernel, so it shares its machinery and shards the same way.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from the_algorithm_tpu.ops.retrieval import _dedup_sum
from the_algorithm_tpu.ops.sparse import PAD_ID


class EngagementType(enum.IntEnum):
    """≡ UTEG edge types (tweet side)."""

    CLICK = 0
    FAVORITE = 1
    RETWEET = 2
    REPLY = 3
    TWEET = 4  # original-tweet authorship
    QUOTE = 5


DEFAULT_TYPE_WEIGHTS = np.array(
    [0.25, 1.0, 1.0, 1.0, 1.0, 1.0], np.float32
)  # click discounted, engagement types equal (UTEG config defaults)


class EngagementGraph(NamedTuple):
    """Left index: user → last-W engaged tweets (ring buffer, newest first)."""

    tweet_ids: jnp.ndarray  # [U, W] int32 PAD_ID padded
    engagement_type: jnp.ndarray  # [U, W] int32
    timestamps: jnp.ndarray  # [U, W] int32


def init_graph(num_users: int, width: int = 64) -> EngagementGraph:
    return EngagementGraph(
        jnp.full((num_users, width), PAD_ID, jnp.int32),
        jnp.zeros((num_users, width), jnp.int32),
        jnp.zeros((num_users, width), jnp.int32),
    )


def record_engagements(
    graph: EngagementGraph,
    user_ids: np.ndarray,
    tweet_ids: np.ndarray,
    types: np.ndarray,
    timestamps: np.ndarray,
) -> EngagementGraph:
    """Host-side batch append (the Kafka/recos-injector feed)."""
    t = np.asarray(graph.tweet_ids).copy()
    e = np.asarray(graph.engagement_type).copy()
    ts = np.asarray(graph.timestamps).copy()
    for u, tw, ty, tm in zip(user_ids, tweet_ids, types, timestamps):
        t[u, 1:] = t[u, :-1]
        e[u, 1:] = e[u, :-1]
        ts[u, 1:] = ts[u, :-1]
        t[u, 0] = tw
        e[u, 0] = ty
        ts[u, 0] = tm
    return EngagementGraph(jnp.asarray(t), jnp.asarray(e), jnp.asarray(ts))


def recommend(
    graph: EngagementGraph,
    seed_ids: jnp.ndarray,  # [S] int32 (user's follows / RealGraph top-K)
    seed_weights: jnp.ndarray,  # [S] float32 (RealGraph edge weights)
    *,
    max_results: int,
    type_weights: jnp.ndarray = None,
    min_timestamp: jnp.ndarray = None,
    min_social_proof: int = 1,
    exclude_types=(),
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Left-seeded traversal + weighted aggregation.

    Returns (tweet_ids[X], scores[X], social_proof_counts[X]):
    score(t) = Σ_{seed s engaged t} seed_weight(s) · type_weight(engagement),
    social proof = #distinct seeds engaging t (≥ min_social_proof kept).
    """
    if type_weights is None:
        type_weights = jnp.asarray(DEFAULT_TYPE_WEIGHTS)
    valid_seed = seed_ids != PAD_ID
    safe_seed = jnp.where(valid_seed, seed_ids, 0)
    rows_t = graph.tweet_ids[safe_seed]  # [S, W]
    rows_e = graph.engagement_type[safe_seed]
    rows_ts = graph.timestamps[safe_seed]

    valid = (rows_t != PAD_ID) & valid_seed[:, None]
    if min_timestamp is not None:
        valid &= rows_ts >= min_timestamp
    for et in exclude_types:
        valid &= rows_e != int(et)

    w = seed_weights[:, None] * type_weights[rows_e]
    w = jnp.where(valid, w, 0.0)
    flat_ids = jnp.where(valid, rows_t, PAD_ID).reshape(-1)

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
