"""Entity / topic SimClusters embeddings from fav-weighted InterestedIn sums.

≡ ``src/scala/com/twitter/simclusters_v2/scalding/embedding/
EntityToSimClustersEmbeddingsJob.scala`` and the topic (TFG) variant
``tfg/FavTfgBasedTopicEmbeddings.scala`` (+ locale variants): an entity's
(semantic-core id / topic) embedding is the normalized sum of the
fav-weighted InterestedIn vectors of users engaging with the entity,
truncated to top-K clusters (topKClustersPerEntity = 50,
``summingbird/common/Configs.scala:43``).

TPU re-design: one scatter-add over (engagement → user-interest slots) into
a dense [E, C] accumulator, then L2-normalize + top-K per entity. Same
program also serves the Topic-Social-Proof relevance side (topic→embedding
used by ``topic-social-proof/``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from the_algorithm_tpu.ops.sparse import PAD_ID, SparseEmbedding


def entity_embeddings_from_engagements(
    entity_ids: jnp.ndarray,  # [B] int32 — entity engaged per event
    user_ids: jnp.ndarray,  # [B] int32 — engaging user
    event_weights: jnp.ndarray,  # [B] float32 — fav weight (1.0 for favs)
    user_interests: SparseEmbedding,  # [U, K] InterestedIn table
    *,
    num_entities: int,
    num_clusters: int,
    top_k: int = 50,  # topKClustersPerEntity
    l2_normalize: bool = True,
) -> SparseEmbedding:
    """[E, top_k] sparse entity embeddings."""
    i_ids = user_interests.ids[user_ids]  # [B, K]
    i_scores = user_interests.scores[user_ids]
    valid = i_ids != PAD_ID
    contrib = jnp.where(valid, i_scores * event_weights[:, None], 0.0)

    e_idx = jnp.broadcast_to(entity_ids[:, None], i_ids.shape)
    c_idx = jnp.where(valid, i_ids, 0)
    flat = (e_idx * num_clusters + c_idx).reshape(-1)
    dense = jnp.zeros((num_entities * num_clusters,), jnp.float32)
    dense = dense.at[flat].add(contrib.reshape(-1))
    dense = dense.reshape(num_entities, num_clusters)

    if l2_normalize:
        norm = jnp.sqrt(jnp.sum(dense * dense, axis=1, keepdims=True))
        dense = dense / jnp.maximum(norm, 1e-30)

    k = min(top_k, num_clusters)
    scores, cids = jax.lax.top_k(dense, k)
    ids = jnp.where(scores > 0, cids.astype(jnp.int32), PAD_ID)
    scores = jnp.where(scores > 0, scores, 0.0)
    return SparseEmbedding(ids, scores)
