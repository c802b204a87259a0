"""Producer embeddings: Ṽ = Aᵀ·U as a TPU scatter-add matmul.

Reference: ``src/scala/com/twitter/simclusters_v2/scalding/embedding/
ProducerEmbeddingsFromInterestedIn.scala:15-230`` — the producer×cluster
matrix is the product of the producer-L2-normalized user→producer engagement
matrix with the cluster-L2-normalized user→cluster InterestedIn matrix
(``getProducerClusterEmbedding:592``, ``legacyMultiplyMatrices``), thresholded
at cosine ≥0.01 (``cosineSimilarityThreshold:544``), then written as top-K
clusters per producer and top-K producers per cluster.

TPU re-design: the 12000-reducer MapReduce matrix multiply becomes a single
scatter-add over (user, adjacency-slot, interest-slot) triples into a dense
[P, C] accumulator (C = 145k fits; P axis shards over 'model'), followed by
two ``top_k`` sweeps.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from the_algorithm_tpu.ops.sparse import PAD_ID, SparseEmbedding


class ProducerEmbeddings(NamedTuple):
    by_producer: SparseEmbedding  # [P, Kp] top clusters per producer
    cluster_top_producers_ids: jnp.ndarray  # [C, Kc] producer ids per cluster
    cluster_top_producers_scores: jnp.ndarray  # [C, Kc]


def producer_cluster_matrix(
    producer_ids: jnp.ndarray,  # [U, D] int32, PAD_ID padded
    edge_weights: jnp.ndarray,  # [U, D] float32 — producer-normalized scores
    interest_ids: jnp.ndarray,  # [U, K] int32 cluster ids, PAD_ID padded
    interest_scores: jnp.ndarray,  # [U, K] float32 — cluster-normalized
    num_producers: int,
    num_clusters: int,
) -> jnp.ndarray:
    """Dense [P, C] = Σ_u w(u,p)·i(u,c); the ``legacyMultiplyMatrices`` core."""
    e_valid = producer_ids != PAD_ID
    i_valid = interest_ids != PAD_ID
    w = jnp.where(e_valid, edge_weights, 0.0)
    s = jnp.where(i_valid, interest_scores, 0.0)
    contrib = w[:, :, None] * s[:, None, :]  # [U, D, K]
    p_idx = jnp.where(e_valid, producer_ids, 0)[:, :, None]
    c_idx = jnp.where(i_valid, interest_ids, 0)[:, None, :]
    flat = (p_idx * num_clusters + c_idx).reshape(-1)
    dense = jnp.zeros((num_producers * num_clusters,), jnp.float32)
    dense = dense.at[flat].add(contrib.reshape(-1))
    return dense.reshape(num_producers, num_clusters)


def producer_embeddings_from_interested_in(
    producer_ids: jnp.ndarray,
    edge_weights: jnp.ndarray,
    interest_ids: jnp.ndarray,
    interest_scores: jnp.ndarray,
    *,
    num_producers: int,
    num_clusters: int,
    top_k_clusters: int = 50,  # topKClustersToKeep
    top_k_producers: int = 100,  # topKUsersToKeep
    threshold: float = 0.01,  # cosineSimilarityThreshold:544
) -> ProducerEmbeddings:
    dense = producer_cluster_matrix(
        producer_ids, edge_weights, interest_ids, interest_scores,
        num_producers, num_clusters,
    )
    dense = jnp.where(dense >= threshold, dense, 0.0)

    # top clusters per producer
    kp = min(top_k_clusters, num_clusters)
    p_scores, p_cids = jax.lax.top_k(dense, kp)
    p_ids = jnp.where(p_scores > 0, p_cids.astype(jnp.int32), PAD_ID)
    p_scores = jnp.where(p_scores > 0, p_scores, 0.0)

    # top producers per cluster
    kc = min(top_k_producers, num_producers)
    c_scores, c_pids = jax.lax.top_k(dense.T, kc)
    c_ids = jnp.where(c_scores > 0, c_pids.astype(jnp.int32), PAD_ID)
    c_scores = jnp.where(c_scores > 0, c_scores, 0.0)

    return ProducerEmbeddings(
        by_producer=SparseEmbedding(p_ids, p_scores),
        cluster_top_producers_ids=c_ids,
        cluster_top_producers_scores=c_scores,
    )
