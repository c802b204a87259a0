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


# -- sharded worker path ------------------------------------------------------
#
# ≡ the server→worker fan-out: the server asks every worker for partial
# intersection counts over the slice of the adjacency lists it owns and sums
# the partials (``WorkerGetIntersectionHandler.scala:18-31``,
# ``GetIntersectionStore.scala``). On the mesh: adjacency rows are
# repartitioned by neighbor-id bucket (id % n_shards — a filtered
# subsequence of a sorted row stays sorted), each 'model'-axis shard
# computes |A_w ∩ B_w| on its local slice, and the exact total is a psum:
# buckets partition the id space, so cross-shard pairs can never match.


def shard_tables(tables: GraphTables, n_shards: int,
                 width: int = 0) -> jnp.ndarray:
    """Repartition [E, U, D] adjacency into per-worker slices
    [n_shards, E, U, W] by neighbor-id bucket (host-side build step — the
    scalding ``GraphFeatureServiceMainJob`` writes exactly such per-worker
    shards). ``width`` defaults to D (worst-case bucket skew keeps every
    neighbor)."""
    import numpy as np

    nbrs = np.asarray(tables.neighbors)
    E, U, D = nbrs.shape
    W = width or D
    out = np.full((n_shards, E, U, W), int(PAD_ID), np.int32)
    valid = nbrs != int(PAD_ID)
    bucket = np.where(valid, nbrs % n_shards, -1)
    for s in range(n_shards):
        sel = bucket == s  # [E, U, D] mask, order-preserving → stays sorted
        # pack each row's selected ids to the front
        order = np.argsort(~sel, axis=2, kind="stable")
        packed = np.take_along_axis(np.where(sel, nbrs, int(PAD_ID)),
                                    order, axis=2)
        out[s] = packed[:, :, :W]
    return jnp.asarray(out)


def feature_block_sharded(
    mesh,
    sharded_neighbors: jnp.ndarray,  # [n_shards, E, U, W] from shard_tables
    user_id: jnp.ndarray,
    candidate_ids: jnp.ndarray,  # [C]
) -> Dict[str, jnp.ndarray]:
    """The worker fan-out on the mesh: per-shard partial intersections over
    bucketed adjacency slices, psum'd over 'model' — exact parity with
    :func:`feature_block` (tests assert it on the 8-device mesh)."""
    from jax.sharding import PartitionSpec as P

    from the_algorithm_tpu.core.mesh import MODEL_AXIS

    def worker(local_nbrs, uid, cands):
        local = GraphTables(local_nbrs[0])  # [E, U, W] this worker's slice
        partial: Dict[str, jnp.ndarray] = {}
        for name, (ue, ce) in FEATURE_PAIRS.items():
            counts, degree = get_intersection(local, uid, cands, ue, ce)
            partial[name] = jax.lax.psum(counts, MODEL_AXIS)
            partial[name + "__degree"] = jax.lax.psum(degree, MODEL_AXIS)
        return partial

    fn = jax.shard_map(
        worker,
        mesh=mesh,
        in_specs=(P(MODEL_AXIS), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    raw = fn(sharded_neighbors, user_id, candidate_ids)
    out: Dict[str, jnp.ndarray] = {}
    for name in FEATURE_PAIRS:
        counts = raw[name].astype(jnp.float32)
        degree = raw[name + "__degree"]
        out[name] = counts
        out[name + "_normalized"] = counts / jnp.maximum(degree, 1).astype(
            jnp.float32)
    return out
