"""InterestedIn consumer embeddings: U = A·V as one TPU program.

Reference: ``src/scala/com/twitter/simclusters_v2/scalding/InterestedInFromKnownFor.scala``
— for each consumer, aggregate the KnownFor clusters of followed/faved
producers (``userClusterPairsWithoutNormalization:249``), social-proof
threshold, cluster-level L2 normalization (``attachNormalizedScores:342``),
and per-user top-K truncation ranked by (favScore, logFavScore, followScore)
(``keepOnlyTopClusters:530``). Output truncation default: top-50 clusters per
user (``summingbird/common/Configs.scala:43``).

TPU re-design: the join+flatMap+sumByKey shuffle is a gather (producer →
cluster through KnownFor) + per-row grouped reduction over the fixed-width
follow/fav adjacency; cluster L2 norms are a scatter-add (segment reduction)
over the user axis — data-parallel over users with a psum when sharded.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

from the_algorithm_tpu.ops.segment import row_dedup_sum
from the_algorithm_tpu.ops.sparse import PAD_ID, SparseEmbedding
from the_algorithm_tpu.simclusters.known_for import KnownFor


class FollowFavGraph(NamedTuple):
    """User → producer engagement adjacency (fixed width, PAD_ID padded).

    ≡ ``UserAndNeighbors`` with per-edge ``isFollowed``,
    ``favScoreHalfLife100Days`` and ``logFavScore``
    (``InterestedInFromKnownFor.scala:263-300``).
    """

    producer_ids: jnp.ndarray  # [U, D] int32
    followed: jnp.ndarray  # [U, D] bool
    fav_score: jnp.ndarray  # [U, D] float32 (half-life-decayed fav weight)
    log_fav_score: jnp.ndarray  # [U, D] float32


@dataclasses.dataclass(frozen=True)
class InterestedInParams:
    num_clusters: int
    social_proof_threshold: int = 2  # socialProofThreshold default
    max_clusters_per_user: int = 50  # topKClustersPerEntity (Configs.scala:43)


class InterestedIn(NamedTuple):
    """Per-user cluster scores, each a [U, K] SparseEmbedding batch with the
    same cluster layout across score types (ids come from ``fav`` ranking)."""

    ids: jnp.ndarray  # [U, K] int32 cluster ids (PAD_ID padded)
    follow_score: jnp.ndarray  # [U, K]
    fav_score: jnp.ndarray  # [U, K]
    log_fav_score: jnp.ndarray  # [U, K]
    fav_cluster_normalized: jnp.ndarray  # [U, K] — fav / cluster L2 norm
    log_fav_cluster_normalized: jnp.ndarray  # [U, K]

    def embedding(self, kind: str = "fav") -> SparseEmbedding:
        arr = {
            "follow": self.follow_score,
            "fav": self.fav_score,
            "log_fav": self.log_fav_score,
            "fav_norm": self.fav_cluster_normalized,
            "log_fav_norm": self.log_fav_cluster_normalized,
        }[kind]
        return SparseEmbedding(self.ids, arr)


def interested_in_from_known_for(
    graph: FollowFavGraph, kf: KnownFor, params: InterestedInParams
) -> InterestedIn:
    """The full InterestedIn job as one jittable function."""
    valid = graph.producer_ids != PAD_ID
    safe_p = jnp.where(valid, graph.producer_ids, 0)
    p_cluster = jnp.where(valid, kf.cluster[safe_p], -1)  # [U, D]
    p_score = jnp.maximum(kf.score[safe_p], 0.0)  # knownForScore clamped ≥0
    has_cluster = p_cluster >= 0

    contributes = valid & has_cluster & (
        graph.followed | (graph.fav_score > 0)
    )
    group = jnp.where(valid & has_cluster, p_cluster, PAD_ID)

    follow_part = jnp.where(graph.followed & valid & has_cluster, p_score, 0.0)
    fav_part = jnp.where(valid & has_cluster, graph.fav_score * p_score, 0.0)
    logfav_part = jnp.where(valid & has_cluster, graph.log_fav_score * p_score, 0.0)

    rep, follow_s, fav_s, logfav_s, proof = row_dedup_sum(
        group, follow_part, fav_part, logfav_part,
        contributes.astype(jnp.float32),
    )
    is_real = rep != PAD_ID
    # social-proof threshold: ≥ N distinct contributing producers
    keep = is_real & (proof >= params.social_proof_threshold)
    follow_s = jnp.where(keep, follow_s, 0.0)
    fav_s = jnp.where(keep, fav_s, 0.0)
    logfav_s = jnp.where(keep, logfav_s, 0.0)
    rep = jnp.where(keep, rep, PAD_ID)

    # cluster-level L2 norms over all users (attachNormalizedScores)
    safe_rep = jnp.where(keep, rep, 0)
    C = params.num_clusters
    fav_norm_sq = jnp.zeros((C,), jnp.float32).at[safe_rep.reshape(-1)].add(
        jnp.where(keep, fav_s * fav_s, 0.0).reshape(-1)
    )
    logfav_norm_sq = jnp.zeros((C,), jnp.float32).at[safe_rep.reshape(-1)].add(
        jnp.where(keep, logfav_s * logfav_s, 0.0).reshape(-1)
    )
    fav_norm = jnp.sqrt(jnp.maximum(fav_norm_sq, 1e-30))
    logfav_norm = jnp.sqrt(jnp.maximum(logfav_norm_sq, 1e-30))
    fav_n = jnp.where(keep, fav_s / fav_norm[safe_rep], 0.0)
    logfav_n = jnp.where(keep, logfav_s / logfav_norm[safe_rep], 0.0)

    # per-user top-K by (favScore, logFavScore, followScore) lexicographic —
    # approximated by a single composite key (fav dominates, then logfav,
    # then follow; keepOnlyTopClusters:553-560)
    rank_key = jnp.where(
        keep,
        fav_s + 1e-4 * logfav_s + 1e-8 * follow_s,
        -jnp.inf,
    )
    K = min(params.max_clusters_per_user, rank_key.shape[-1])
    import jax as _jax

    top_key, top_idx = _jax.lax.top_k(rank_key, K)
    sel = lambda a: jnp.take_along_axis(a, top_idx, axis=-1)
    sel_keep = jnp.isfinite(top_key)
    out_ids = jnp.where(sel_keep, sel(rep), PAD_ID)
    z = lambda a: jnp.where(sel_keep, sel(a), 0.0)
    return InterestedIn(
        ids=out_ids,
        follow_score=z(follow_s),
        fav_score=z(fav_s),
        log_fav_score=z(logfav_s),
        fav_cluster_normalized=z(fav_n),
        log_fav_cluster_normalized=z(logfav_n),
    )
