"""Pluggable clustering method library for embedding spaces.

≡ ``src/scala/com/twitter/simclusters_v2/common/clustering/``:
``ClusteringMethod`` trait with ConnectedComponents / Louvain /
LargestDimension implementations, plus medoid / max-fav representative
selection (``MedoidRepresentativeSelectionMethod.scala``,
``SimilarityFunctions.scala``). Used by cr-mixer's address-book/follow
clustering candidate engines.

TPU design: methods operate on a dense [N, N] similarity matrix (N ≤ a few
thousand per clustering call in the reference too — it clusters one user's
neighborhood, not the whole graph). Connected components is an iterated
min-label propagation (jittable); largest-dimension is an argmax; Louvain
runs a greedy modularity pass host-side (inherently sequential).
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from the_algorithm_tpu.ops import sparse
from the_algorithm_tpu.ops.sparse import SparseEmbedding


def similarity_matrix(embeddings: SparseEmbedding) -> jnp.ndarray:
    """[N, N] cosine similarity (``SimilarityFunctions.simClustersCosineSimilarity``)."""
    return sparse.pairwise_cosine_matrix(embeddings, embeddings)


def connected_components(
    sim: jnp.ndarray, threshold: float
) -> jnp.ndarray:
    """Cluster = connected component of the ≥threshold similarity graph.

    ≡ ``ConnectedComponentsClusteringMethod.scala``. Min-label propagation
    to fixpoint (≤N iterations, lax.while_loop).
    """
    n = sim.shape[0]
    adj = (sim >= threshold) | jnp.eye(n, dtype=bool)
    labels0 = jnp.arange(n)

    def body(state):
        labels, _ = state
        # every node takes the min label over its neighbors
        neigh = jnp.where(adj, labels[None, :], n)
        new = jnp.minimum(labels, jnp.min(neigh, axis=1))
        return new, jnp.any(new != labels)

    def cond(state):
        return state[1]

    labels, _ = jax.lax.while_loop(cond, body, (labels0, jnp.bool_(True)))
    return labels


def largest_dimension(embeddings: SparseEmbedding) -> jnp.ndarray:
    """Cluster by each embedding's max-score cluster id
    (≡ ``LargestDimensionClusteringMethod.scala``)."""
    best = jnp.argmax(embeddings.scores, axis=-1)
    return jnp.take_along_axis(embeddings.ids, best[:, None], axis=-1)[:, 0]


def louvain(sim: np.ndarray, threshold: float = 0.0, max_passes: int = 10) -> np.ndarray:
    """Greedy modularity maximization (one-level Louvain).

    ≡ ``LouvainClusteringMethod.scala`` capability. Host-side numpy (the
    greedy sweep is sequential by nature); N is small per call.
    """
    w = np.where(sim >= threshold, np.maximum(sim, 0.0), 0.0)
    np.fill_diagonal(w, 0.0)
    n = w.shape[0]
    m2 = w.sum()  # 2m
    if m2 <= 0:
        return np.arange(n)
    k = w.sum(axis=1)
    labels = np.arange(n)
    for _ in range(max_passes):
        moved = False
        for i in range(n):
            own = labels[i]
            # gain of moving i to neighbor community c:
            #   Σ_in(i→c)/m - k_i·Σ_tot(c)/(2m²)  (standard ΔQ up to consts)
            best_c, best_gain = own, 0.0
            labels[i] = -1  # remove i
            for c in np.unique(labels[w[i] > 0]):
                if c < 0:
                    continue
                in_c = labels == c
                ki_in = w[i, in_c].sum()
                tot_c = k[in_c].sum()
                gain = ki_in / m2 - (k[i] * tot_c) / (m2 * m2)
                if gain > best_gain + 1e-12:
                    best_gain, best_c = gain, c
            labels[i] = best_c
            if best_c != own:
                moved = True
        if not moved:
            break
    # relabel compactly
    uniq, compact = np.unique(labels, return_inverse=True)
    return compact


def medoid_representative(
    embeddings: SparseEmbedding, labels: jnp.ndarray
) -> jnp.ndarray:
    """Per cluster, the member maximizing summed in-cluster similarity
    (≡ ``MedoidRepresentativeSelectionMethod.scala``). Returns [N] bool —
    True where the member is its cluster's medoid."""
    sim = similarity_matrix(embeddings)
    same = labels[:, None] == labels[None, :]
    score = jnp.sum(jnp.where(same, sim, 0.0), axis=1)  # [N]
    n = labels.shape[0]
    best = jnp.zeros((n,), score.dtype).at[labels].max(score)
    return score >= best[labels] - 1e-9


def max_weight_representative(
    labels: jnp.ndarray, weights: jnp.ndarray
) -> jnp.ndarray:
    """Per cluster, the member with the largest external weight (e.g. fav
    count) — ≡ ``MaxFavScoreRepresentativeSelectionMethod``."""
    n = labels.shape[0]
    best = jnp.zeros((n,), weights.dtype).at[labels].max(weights)
    return weights >= best[labels] - 1e-9
