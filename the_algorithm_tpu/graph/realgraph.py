"""RealGraph: user-user interaction-strength model.

≡ ``src/scala/com/twitter/interaction_graph/`` (README.md:1-15): daily scio
jobs aggregate 9 directed edge-interaction types (favs, retweets, replies,
mentions, DMs, profile views, clicks, follows, address-book) into decayed
per-edge counts, rolled up with exponential decay; a BQML boosted-tree
predicts p(interaction tomorrow), and the score is THE follow-graph edge
weight used everywhere (UTEG seed weights, home feature hydrators).

TPU design: the decayed per-edge feature rollup is a fixed-width edge table
updated by scatter (the scio agg_* jobs as one jitted fold); the p(interaction)
model is a logistic regression over edge features trained with the standard
DP loop (the boosted tree is BQ-specific; LR reaches the same role — edge
ranking — and the trainer accepts any richer JAX model drop-in).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from the_algorithm_tpu.ops.sparse import PAD_ID

INTERACTION_TYPES = (
    "fav", "retweet", "reply", "mention", "dm", "profile_view",
    "tweet_click", "link_click", "follow",
)
DEFAULT_HALF_LIFE_S = 14 * 86400.0  # two-week decay rollup


class EdgeTable(NamedTuple):
    """Directed edges user→neighbor with decayed interaction counts.

    [U, D] neighbors (PAD_ID padded), [U, D, F] decayed counts valid at
    ``last_ts[u]``.
    """

    neighbor_ids: jnp.ndarray  # [U, D] int32
    counts: jnp.ndarray  # [U, D, F] float32
    last_ts: jnp.ndarray  # [U] int32


def init_table(num_users: int, degree: int) -> EdgeTable:
    F = len(INTERACTION_TYPES)
    return EdgeTable(
        jnp.full((num_users, degree), PAD_ID, jnp.int32),
        jnp.zeros((num_users, degree, F), jnp.float32),
        jnp.zeros((num_users,), jnp.int32),
    )


def apply_interactions(
    table: EdgeTable,
    src: jnp.ndarray,  # [B] int32
    dst: jnp.ndarray,  # [B] int32
    interaction_type: jnp.ndarray,  # [B] int32 index into INTERACTION_TYPES
    timestamps: jnp.ndarray,  # [B] int32 non-decreasing
    half_life_s: float = DEFAULT_HALF_LIFE_S,
) -> EdgeTable:
    """Fold an interaction batch (the agg_direct_interactions job).

    Sequential scan (stream order): decay the src row, find-or-insert the
    dst slot (evicting the weakest edge when full — the top-D rollup
    truncation), bump the count.
    """
    F = len(INTERACTION_TYPES)

    def step(carry: EdgeTable, ev):
        s, d, it, ts = ev
        nbrs = carry.neighbor_ids[s]  # [D]
        cnts = carry.counts[s]  # [D, F]
        decay = jnp.exp2(
            -jnp.maximum(ts - carry.last_ts[s], 0).astype(jnp.float32)
            / half_life_s
        )
        cnts = cnts * decay

        is_match = nbrs == d
        has_match = jnp.any(is_match)
        # slot: existing match, else an empty slot, else the weakest edge
        match_slot = jnp.argmax(is_match)
        empty = nbrs == PAD_ID
        has_empty = jnp.any(empty)
        empty_slot = jnp.argmax(empty)
        weakest_slot = jnp.argmin(jnp.sum(cnts, axis=-1))
        slot = jnp.where(
            has_match, match_slot, jnp.where(has_empty, empty_slot, weakest_slot)
        )
        new_edge = ~has_match
        cnts = jnp.where(
            new_edge, cnts.at[slot].set(jnp.zeros((F,), jnp.float32)), cnts
        )
        cnts = cnts.at[slot, it].add(1.0)
        nbrs = nbrs.at[slot].set(d)
        carry = carry._replace(
            neighbor_ids=carry.neighbor_ids.at[s].set(nbrs),
            counts=carry.counts.at[s].set(cnts),
            last_ts=carry.last_ts.at[s].set(ts),
        )
        return carry, ()

    out, _ = jax.lax.scan(step, table, (src, dst, interaction_type, timestamps))
    return out


def edge_features(
    table: EdgeTable, now: jnp.ndarray, half_life_s: float = DEFAULT_HALF_LIFE_S
) -> jnp.ndarray:
    """[U, D, F] decayed-to-now features (+ caller adds degree/recency etc.)."""
    decay = jnp.exp2(
        -jnp.maximum(now - table.last_ts, 0).astype(jnp.float32) / half_life_s
    )
    return table.counts * decay[:, None, None]


# -- p(interaction) edge model (the BQML boosted-tree role) ------------------


def init_model(key: jax.Array) -> Dict[str, jnp.ndarray]:
    F = len(INTERACTION_TYPES)
    return {
        "w": 0.01 * jax.random.normal(key, (F,)),
        "b": jnp.zeros(()),
    }


def predict_edge_scores(
    params: Dict[str, jnp.ndarray], features: jnp.ndarray
) -> jnp.ndarray:
    """[..., F] features → p(interaction) in (0,1): the RealGraph weight."""
    logits = jnp.einsum("...f,f->...", jnp.log1p(features), params["w"]) + params["b"]
    return jax.nn.sigmoid(logits)


def loss_fn(
    params: Dict[str, jnp.ndarray],
    features: jnp.ndarray,  # [B, F]
    labels: jnp.ndarray,  # [B] did-interact-in-next-window
) -> jnp.ndarray:
    logits = (
        jnp.einsum("bf,f->b", jnp.log1p(features), params["w"]) + params["b"]
    )
    return jnp.mean(
        -labels * jax.nn.log_sigmoid(logits)
        - (1 - labels) * jax.nn.log_sigmoid(-logits)
    )


def top_edges(
    table: EdgeTable,
    params: Dict[str, jnp.ndarray],
    user_id: jnp.ndarray,
    now: jnp.ndarray,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """User's strongest edges by model score — the UTEG seed-set source."""
    feats = edge_features(table, now)[user_id]  # [D, F]
    nbrs = table.neighbor_ids[user_id]
    scores = predict_edge_scores(params, feats)
    scores = jnp.where(nbrs != PAD_ID, scores, -jnp.inf)
    top_s, idx = jax.lax.top_k(scores, k)
    ids = jnp.where(jnp.isfinite(top_s), nbrs[idx], PAD_ID)
    return ids, jnp.where(jnp.isfinite(top_s), top_s, 0.0)
