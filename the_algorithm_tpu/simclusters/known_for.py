"""KnownFor community detection as a jitted TPU program.

Reference: the Metropolis-Hastings-flavored label-update iteration over the
producer-producer similarity graph
(``src/scala/com/twitter/simclusters_v2/scalding/UpdateKnownFor.scala``):
every node looks at its neighbors' cluster assignments and picks the cluster
maximizing a TP/FN/FP-weighted score (``getScoresForCluster:89-112``,
``pickBestCluster:114-149``, ``collectInformationPerNode:222-276``). Scale:
20M producers, k≈145k clusters, one cluster per producer.

TPU re-design: the Scalding shuffle ("broadcast membership to neighbors,
sumByKey") becomes a **gather + per-row grouped reduction**: neighbor
assignments are gathered through a fixed-width adjacency [U, D], per-cluster
neighborhood stats come from :func:`row_dedup_sum` (sort+scan inside each
row), and the cluster pick is an argmax — one fused XLA program per
iteration, trivially data-sharded over the user axis with psum'd cluster
stats.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from the_algorithm_tpu.ops.segment import row_dedup_sum
from the_algorithm_tpu.ops.sparse import PAD_ID

NO_CLUSTER = jnp.int32(-1)


class Graph(NamedTuple):
    """Fixed-width symmetric adjacency (top-D neighbors, PAD_ID padded)."""

    nbr_ids: jnp.ndarray  # [U, D] int32, PAD_ID = empty slot
    nbr_weights: jnp.ndarray  # [U, D] float32, 0 in padding

    @property
    def num_nodes(self) -> int:
        return self.nbr_ids.shape[0]


class KnownFor(NamedTuple):
    """One cluster per node (``cluster = -1`` ⇒ unassigned)."""

    cluster: jnp.ndarray  # [U] int32
    score: jnp.ndarray  # [U] float32


@dataclasses.dataclass(frozen=True)
class KnownForParams:
    """≡ UpdateKnownForApps args (``UpdateKnownForApps.scala:159-177``)."""

    num_clusters: int
    min_neighbors_in_cluster: int = 2  # minNeighborsInCluster default
    true_positive_wt_factor: float = 10.0  # truePositiveWtFactor default
    # 'sum' | 'ratio' | 'ratio_membership' (clusterScoresToFinalScore options)
    final_score: str = "ratio_membership"


def cluster_stats(
    kf: KnownFor, num_clusters: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(size_c, Σ membership_c) per cluster — ``clusterOverallStatsMap``."""
    assigned = kf.cluster >= 0
    safe = jnp.where(assigned, kf.cluster, 0)
    ones = jnp.where(assigned, 1.0, 0.0)
    sizes = jnp.zeros((num_clusters,), jnp.float32).at[safe].add(ones)
    memb = jnp.zeros((num_clusters,), jnp.float32).at[safe].add(
        jnp.where(assigned, kf.score, 0.0)
    )
    return sizes, memb


def global_stats(graph: Graph, kf: KnownFor) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(global avg edge weight, avg membership score of assigned nodes)."""
    valid = graph.nbr_ids != PAD_ID
    total_w = jnp.sum(jnp.where(valid, graph.nbr_weights, 0.0))
    total_e = jnp.sum(valid)
    avg_w = total_w / jnp.maximum(total_e, 1)
    assigned = kf.cluster >= 0
    avg_m = jnp.sum(jnp.where(assigned, kf.score, 0.0)) / jnp.maximum(
        jnp.sum(assigned), 1
    )
    return avg_w, avg_m


def _scores_for_clusters(
    *,
    # per-node overall neighborhood stats
    sum_w: jnp.ndarray,  # [U]
    sum_mw: jnp.ndarray,  # [U]
    # per-(node, candidate-cluster) stats, [U, D] layout from row_dedup_sum
    cand_count: jnp.ndarray,
    cand_sum_w: jnp.ndarray,
    cand_sum_mw: jnp.ndarray,
    cand_sum_m: jnp.ndarray,
    # gathered per-cluster overall stats
    cand_cluster_size: jnp.ndarray,
    cand_cluster_memb: jnp.ndarray,
    avg_w: jnp.ndarray,
    params: KnownForParams,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """≡ ``getScoresForCluster`` (UpdateKnownFor.scala:89-112), vectorized."""
    tp = cand_sum_w
    fn = sum_w[:, None] - tp
    fp = (cand_cluster_size - cand_count) * avg_w
    mw_tp = cand_sum_mw
    mw_fn = sum_mw[:, None] - mw_tp
    mw_fp = (cand_cluster_memb - cand_sum_m) * avg_w
    eps = 1e-20
    sum_score = params.true_positive_wt_factor * tp - fn - fp
    ratio = tp / jnp.maximum(tp + fn + fp, eps)
    ratio_m = mw_tp / jnp.maximum(mw_tp + mw_fp + mw_fn, eps)
    return sum_score, ratio, ratio_m


def update_iteration(
    graph: Graph, kf: KnownFor, params: KnownForParams
) -> KnownFor:
    """One label-update sweep (``updateGeneric``). Fully jittable."""
    sizes, membs = cluster_stats(kf, params.num_clusters)
    avg_w, avg_m = global_stats(graph, kf)

    valid = graph.nbr_ids != PAD_ID
    safe_nbr = jnp.where(valid, graph.nbr_ids, 0)
    nbr_cluster = jnp.where(valid, kf.cluster[safe_nbr], NO_CLUSTER)  # [U, D]
    nbr_assigned = nbr_cluster >= 0
    nbr_score = jnp.where(nbr_assigned, kf.score[safe_nbr], avg_m)
    w = jnp.where(valid, graph.nbr_weights, 0.0)

    # overall neighborhood stats (collectInformationPerNode's outer sum)
    deg = jnp.sum(valid, axis=-1)  # nodeCount
    sum_w = jnp.sum(w, axis=-1)
    sum_mw = jnp.sum(w * nbr_score, axis=-1)

    # per-cluster stats within the neighborhood: group by neighbor's cluster
    group_ids = jnp.where(valid & nbr_assigned, nbr_cluster, PAD_ID)
    rep, c_count, c_sum_w, c_sum_mw, c_sum_m = row_dedup_sum(
        group_ids,
        (valid & nbr_assigned).astype(jnp.float32),
        jnp.where(nbr_assigned, w, 0.0),
        jnp.where(nbr_assigned, w * nbr_score, 0.0),
        jnp.where(nbr_assigned, nbr_score, 0.0),
    )
    is_cand = rep != PAD_ID
    safe_rep = jnp.where(is_cand, rep, 0)
    sum_score, ratio, ratio_m = _scores_for_clusters(
        sum_w=sum_w,
        sum_mw=sum_mw,
        cand_count=c_count,
        cand_sum_w=c_sum_w,
        cand_sum_mw=c_sum_mw,
        cand_sum_m=c_sum_m,
        cand_cluster_size=sizes[safe_rep],
        cand_cluster_memb=membs[safe_rep],
        avg_w=avg_w,
        params=params,
    )
    final = {
        "sum": sum_score,
        "ratio": ratio,
        "ratio_membership": ratio_m,
    }[params.final_score]

    # eligibility: ≥ minNeighborsInCluster neighbors in the cluster, and the
    # node itself has ≥ minNeighbors neighbors (updateGeneric:173-176)
    eligible = (
        is_cand
        & (c_count >= params.min_neighbors_in_cluster)
        & (deg >= params.min_neighbors_in_cluster)[:, None]
    )
    neg = jnp.float32(-jnp.inf)
    masked = jnp.where(eligible, final, neg)
    best = jnp.argmax(masked, axis=-1)
    best_score = jnp.take_along_axis(masked, best[:, None], axis=-1)[:, 0]
    best_cluster = jnp.take_along_axis(safe_rep, best[:, None], axis=-1)[:, 0]
    has_winner = jnp.isfinite(best_score)
    return KnownFor(
        jnp.where(has_winner, best_cluster, NO_CLUSTER),
        jnp.where(has_winner, best_score, 0.0).astype(jnp.float32),
    )


def final_scores(graph: Graph, kf: KnownFor, params: KnownForParams) -> KnownFor:
    """Replace scores with ratioScoreIgnoringMembershipScores for the
    assigned cluster (``newKnownForScores:287-310``, tpFactor=0)."""
    sizes, membs = cluster_stats(kf, params.num_clusters)
    avg_w, avg_m = global_stats(graph, kf)

    valid = graph.nbr_ids != PAD_ID
    safe_nbr = jnp.where(valid, graph.nbr_ids, 0)
    nbr_cluster = jnp.where(valid, kf.cluster[safe_nbr], NO_CLUSTER)
    w = jnp.where(valid, graph.nbr_weights, 0.0)
    sum_w = jnp.sum(w, axis=-1)

    own = kf.cluster
    in_own = (nbr_cluster == own[:, None]) & (own >= 0)[:, None]
    tp = jnp.sum(jnp.where(in_own, w, 0.0), axis=-1)
    count = jnp.sum(in_own, axis=-1)
    fn = sum_w - tp
    fp = (sizes[jnp.maximum(own, 0)] - count) * avg_w
    ratio = tp / jnp.maximum(tp + fn + fp, 1e-20)
    return KnownFor(own, jnp.where(own >= 0, ratio, 0.0).astype(jnp.float32))


def iterate(
    graph: Graph, kf: KnownFor, params: KnownForParams, num_iterations: int
) -> KnownFor:
    """Run ``num_iterations`` sweeps then the final scoring pass."""
    step = jax.jit(lambda k: update_iteration(graph, kf=k, params=params))
    for _ in range(num_iterations):
        kf = step(kf)
    return jax.jit(lambda k: final_scores(graph, k, params))(kf)


def initialize_random(
    key: jax.Array, num_nodes: int, num_clusters: int, fraction: float = 1.0
) -> KnownFor:
    """Random initial assignment (stand-in for the egonet-based seeding in
    ``KnownForSources.scala`` — any seeding works; iteration refines it)."""
    ck, mk = jax.random.split(key)
    clusters = jax.random.randint(ck, (num_nodes,), 0, num_clusters)
    mask = jax.random.uniform(mk, (num_nodes,)) < fraction
    return KnownFor(
        jnp.where(mask, clusters, NO_CLUSTER).astype(jnp.int32),
        jnp.where(mask, 1.0, 0.0).astype(jnp.float32),
    )
