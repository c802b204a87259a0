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


# -- locale variants ----------------------------------------------------------
#
# ≡ ``scalding/embedding/Locale*`` (LocaleEntitySimClustersEmbeddingV2Job):
# entities get one embedding PER LOCALE, aggregated only from engagements in
# that language — the per-market semantic-core/topic serving rows. TPU
# shape: (entity, locale) composite keys feed the same scatter-add program;
# nothing per-locale is a separate job.


def locale_entity_embeddings(
    entity_ids: jnp.ndarray,  # [B]
    locale_ids: jnp.ndarray,  # [B] int32 language of the engagement
    user_ids: jnp.ndarray,  # [B]
    event_weights: jnp.ndarray,  # [B]
    user_interests: SparseEmbedding,
    *,
    num_entities: int,
    num_locales: int,
    num_clusters: int,
    top_k: int = 50,
    l2_normalize: bool = True,
) -> SparseEmbedding:
    """[E·L, top_k] — row ``e * num_locales + l`` is entity e's embedding in
    locale l (use :func:`locale_row` to address it)."""
    composite = entity_ids * num_locales + locale_ids
    return entity_embeddings_from_engagements(
        composite, user_ids, event_weights, user_interests,
        num_entities=num_entities * num_locales,
        num_clusters=num_clusters, top_k=top_k, l2_normalize=l2_normalize,
    )


def locale_row(entity_id: int, locale_id: int, num_locales: int) -> int:
    return int(entity_id) * int(num_locales) + int(locale_id)


def fav_tfg_topic_embeddings(
    topic_ids: jnp.ndarray,  # [B] topic of the faved tweet
    locale_ids: jnp.ndarray,  # [B]
    user_ids: jnp.ndarray,  # [B] faver
    fav_counts: jnp.ndarray,  # [B] fav weight of the event
    user_interests: SparseEmbedding,
    *,
    num_topics: int,
    num_locales: int,
    num_clusters: int,
    top_k: int = 50,
) -> SparseEmbedding:
    """≡ ``tfg/FavTfgBasedTopicEmbeddings.scala``: Topic-Follow-Graph topic
    embeddings from fav events on topic-tagged tweets, log-fav weighted
    (the job's favScore dampening), per locale."""
    weights = jnp.log1p(jnp.maximum(fav_counts.astype(jnp.float32), 0.0))
    return locale_entity_embeddings(
        topic_ids, locale_ids, user_ids, weights, user_interests,
        num_entities=num_topics, num_locales=num_locales,
        num_clusters=num_clusters, top_k=top_k,
    )


def reverse_cluster_index(
    embeddings: SparseEmbedding,  # [E, K] entity embeddings
    *,
    num_clusters: int,
    top_m: int,
) -> SparseEmbedding:
    """cluster → top-M entities by embedding score — the serving-side
    reverse index every embedding job also materializes (top-K producers /
    entities per cluster, ``ProducerEmbeddingsFromInterestedIn`` reverse
    dataset)."""
    E, K = embeddings.ids.shape
    valid = embeddings.ids != PAD_ID
    flat_c = jnp.where(valid, embeddings.ids, 0).reshape(-1)
    flat_s = jnp.where(valid, embeddings.scores, 0.0).reshape(-1)
    flat_e = jnp.broadcast_to(
        jnp.arange(E, dtype=jnp.int32)[:, None], (E, K)).reshape(-1)
    dense = jnp.zeros((num_clusters, E), jnp.float32)
    dense = dense.at[flat_c, flat_e].max(flat_s)
    scores, eids = jax.lax.top_k(dense, min(top_m, E))
    ids = jnp.where(scores > 0, eids.astype(jnp.int32), PAD_ID)
    return SparseEmbedding(ids, jnp.where(scores > 0, scores, 0.0))
