"""Graph Feature Service (GFS): sharded set-intersection edge features.

≡ ``graph-feature-service/`` — "how many of A's follows faved C?": the server
fans out to workers holding partitioned adjacency lists; each worker
intersects its shard of A's neighbor list with C's engaged-by list via
sorted-array merge / binary search
(``worker/handlers/WorkerGetIntersectionHandler.scala:18-31``,
``util/IntersectionValueCalculator.scala:14-219``).

TPU design: adjacency lists are fixed-width sorted rows of per-edge-type
tables [U, D]; intersection counts are all-pairs equality masks (VPU) —
batched over (user, candidate) pairs in one jitted call; sharded rows psum
partial counts (SURVEY.md §2.3 row 4).
"""

from __future__ import annotations

import enum
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from the_algorithm_tpu.ops.sparse import PAD_ID


class EdgeType(enum.IntEnum):
    """≡ gfs thrift edge types (follow/fav/retweet/mention directions)."""

    FOLLOWING = 0
    FOLLOWED_BY = 1
    FAVORITE = 2
    FAVORITED_BY = 3
    RETWEET = 4
    RETWEETED_BY = 5
    MENTION = 6
    MENTIONED_BY = 7


class GraphTables(NamedTuple):
    """Per-edge-type fixed-width adjacency: [E, U, D] int32 sorted rows."""

    neighbors: jnp.ndarray  # [num_edge_types, U, D], PAD_ID padded, sorted asc

    @property
    def num_users(self) -> int:
        return self.neighbors.shape[1]


def intersection_count(a_row: jnp.ndarray, b_row: jnp.ndarray) -> jnp.ndarray:
    """|a ∩ b| for two sorted padded id rows (all-pairs equality on VPU)."""
    av = a_row != PAD_ID
    bv = b_row != PAD_ID
    eq = (a_row[:, None] == b_row[None, :]) & av[:, None] & bv[None, :]
    return jnp.sum(eq)


def get_intersection(
    tables: GraphTables,
    user_id: jnp.ndarray,
    candidate_ids: jnp.ndarray,  # [C] e.g. candidate authors
    user_edge: EdgeType,
    candidate_edge: EdgeType,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(count [C], user_degree) — ``ServerGetIntersectionHandler`` analog.

    count[c] = |edge(user, user_edge) ∩ edge(candidate_c, candidate_edge)| —
    e.g. (FOLLOWING, FAVORITED_BY) = "how many of my follows faved them".
    """
    a_row = tables.neighbors[int(user_edge), user_id]  # [D]
    b_rows = tables.neighbors[int(candidate_edge), candidate_ids]  # [C, D]
    counts = jax.vmap(lambda b: intersection_count(a_row, b))(b_rows)
    degree = jnp.sum(a_row != PAD_ID)
    return counts, degree


FEATURE_PAIRS: Dict[str, Tuple[EdgeType, EdgeType]] = {
    # the canonical gfs features used by FRS/home feature hydrators
    "follows_who_favorited": (EdgeType.FOLLOWING, EdgeType.FAVORITED_BY),
    "follows_who_follow": (EdgeType.FOLLOWING, EdgeType.FOLLOWED_BY),
    "follows_who_retweeted": (EdgeType.FOLLOWING, EdgeType.RETWEETED_BY),
    "follows_who_mentioned": (EdgeType.FOLLOWING, EdgeType.MENTIONED_BY),
}


def feature_block(
    tables: GraphTables, user_id: jnp.ndarray, candidate_ids: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """All standard intersection features + normalized variants for a
    candidate batch, one jitted call."""
    out: Dict[str, jnp.ndarray] = {}
    for name, (ue, ce) in FEATURE_PAIRS.items():
        counts, degree = get_intersection(tables, user_id, candidate_ids, ue, ce)
        out[name] = counts.astype(jnp.float32)
        out[name + "_normalized"] = counts / jnp.maximum(degree, 1).astype(
            jnp.float32
        )
    return out
