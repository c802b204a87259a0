"""Offline cluster-quality evaluation — evaluation-as-testing jobs.

≡ ``src/scala/com/twitter/simclusters_v2/scalding/{ClusterEvaluation,
BipartiteClusterEvaluation,CompareClusters}.scala`` (SURVEY.md §4: model
quality is validated by dedicated evaluation jobs, not unit tests): per-
cluster cosine-similarity distributions over member pairs, bipartite
engagement evaluation, and cosine comparison of two KnownFor versions.
Plus the eigenvector tooling capability (top eigenvectors of the sparse
similarity matrix ≡ ``EigenVectorsForSparseSymmetric.scala``) as subspace
power iteration.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from the_algorithm_tpu.ops.sparse import PAD_ID
from the_algorithm_tpu.simclusters.known_for import Graph, KnownFor


class ClusterQuality(NamedTuple):
    """Per-cluster neighborhood quality (``ClusterEvaluation.scala``)."""

    sizes: jnp.ndarray  # [C] member counts
    in_cluster_weight_fraction: jnp.ndarray  # [C] Σ within-cluster edge w / Σ all
    mean_in_cluster_similarity: jnp.ndarray  # [C]


def evaluate_clusters(
    graph: Graph, kf: KnownFor, num_clusters: int
) -> ClusterQuality:
    """How much of each member's edge weight stays inside its cluster."""
    valid = graph.nbr_ids != PAD_ID
    safe = jnp.where(valid, graph.nbr_ids, 0)
    nbr_cluster = jnp.where(valid, kf.cluster[safe], -1)
    own = kf.cluster  # [U]
    w = jnp.where(valid, graph.nbr_weights, 0.0)

    in_cluster = (nbr_cluster == own[:, None]) & (own >= 0)[:, None]
    w_in = jnp.sum(jnp.where(in_cluster, w, 0.0), axis=1)
    w_all = jnp.sum(w, axis=1)
    frac = jnp.where(w_all > 0, w_in / jnp.maximum(w_all, 1e-30), 0.0)
    sim_mean = jnp.where(
        jnp.sum(in_cluster, axis=1) > 0,
        w_in / jnp.maximum(jnp.sum(in_cluster, axis=1), 1),
        0.0,
    )

    assigned = own >= 0
    safe_own = jnp.where(assigned, own, 0)
    ones = assigned.astype(jnp.float32)
    sizes = jnp.zeros((num_clusters,), jnp.float32).at[safe_own].add(ones)
    frac_sum = jnp.zeros((num_clusters,), jnp.float32).at[safe_own].add(
        jnp.where(assigned, frac, 0.0)
    )
    sim_sum = jnp.zeros((num_clusters,), jnp.float32).at[safe_own].add(
        jnp.where(assigned, sim_mean, 0.0)
    )
    denom = jnp.maximum(sizes, 1.0)
    return ClusterQuality(sizes, frac_sum / denom, sim_sum / denom)


def compare_known_for(
    a: KnownFor, b: KnownFor, num_clusters: int
) -> Dict[str, float]:
    """≡ ``CompareClusters.scala``: agreement between two assignments.

    Reports raw same-cluster agreement and normalized mutual-information-ish
    purity both directions (label ids are arbitrary across runs).
    """
    a_c = np.asarray(a.cluster)
    b_c = np.asarray(b.cluster)
    both = (a_c >= 0) & (b_c >= 0)
    if both.sum() == 0:
        return {"coverage": 0.0, "purity_ab": 0.0, "purity_ba": 0.0}

    def purity(x, y):
        out = 0.0
        for c in np.unique(x[both]):
            members = y[both][x[both] == c]
            out += np.bincount(members).max()
        return out / both.sum()

    return {
        "coverage": float(both.mean()),
        "purity_ab": float(purity(a_c, b_c)),
        "purity_ba": float(purity(b_c, a_c)),
    }


def bipartite_engagement_eval(
    user_cluster: jnp.ndarray,  # [U] users' cluster (e.g. via InterestedIn argmax)
    eng_user_ids: jnp.ndarray,  # [B] engagement events
    eng_tweet_ids: jnp.ndarray,  # [B]
    tweet_cluster: jnp.ndarray,  # [T] tweets' dominant cluster
) -> float:
    """≡ ``BipartiteClusterEvaluation.scala``: fraction of engagements whose
    user-cluster matches the engaged tweet's cluster."""
    uc = user_cluster[eng_user_ids]
    tc = tweet_cluster[eng_tweet_ids]
    valid = (uc >= 0) & (tc >= 0)
    agree = jnp.sum((uc == tc) & valid)
    return float(agree / jnp.maximum(jnp.sum(valid), 1))


def top_eigenvectors(
    graph: Graph, k: int, iterations: int = 50, seed: int = 0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k eigenpairs of the symmetric sparse adjacency via subspace
    (block power) iteration with QR re-orthonormalization
    (≡ ``EigenVectorsForSparseSymmetric.scala`` capability)."""
    U = graph.num_nodes
    valid = graph.nbr_ids != PAD_ID
    safe = jnp.where(valid, graph.nbr_ids, 0)
    w = jnp.where(valid, graph.nbr_weights, 0.0)

    def matvec(v):  # [U, k]
        gathered = v[safe]  # [U, D, k]
        return jnp.einsum("ud,udk->uk", w, gathered)

    key = jax.random.PRNGKey(seed)
    q = jax.random.normal(key, (U, k))
    q, _ = jnp.linalg.qr(q)

    def body(_, q):
        z = matvec(q)
        q2, _ = jnp.linalg.qr(z)
        return q2

    q = jax.lax.fori_loop(0, iterations, body, q)
    z = matvec(q)
    eigvals = jnp.einsum("uk,uk->k", q, z)
    return eigvals, q
