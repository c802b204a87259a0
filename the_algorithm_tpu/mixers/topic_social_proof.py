"""Topic Social Proof (TSPS): tweet → topic assignment with relevance.

≡ ``topic-social-proof/`` (README:1-6): for a (user, tweet) pair, find the
topics assignable to the tweet — cosine relevance between the tweet's
SimClusters embedding and each topic's embedding — filtered by the user's
topic follows/not-interested list, with a relevance threshold.

TPU design: topic embeddings are a batched SparseEmbedding table (built by
:mod:`the_algorithm_tpu.simclusters.entity_embeddings`); scoring a tweet
against all topics is one vmapped sparse-cosine sweep + threshold + top-K.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from the_algorithm_tpu.ops import sparse
from the_algorithm_tpu.ops.sparse import PAD_ID, SparseEmbedding


@dataclasses.dataclass(frozen=True)
class TopicSocialProofConfig:
    min_relevance: float = 0.05  # cosine threshold for assignment
    max_topics_per_tweet: int = 3


def topic_social_proof(
    tweet_embedding: SparseEmbedding,  # [K]
    topic_embeddings: SparseEmbedding,  # [T, K] batched topic table
    *,
    followed_topics: Optional[jnp.ndarray] = None,  # [F] topic ids (PAD pad)
    not_interested_topics: Optional[jnp.ndarray] = None,
    config: TopicSocialProofConfig = TopicSocialProofConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """→ (topic_ids [M], relevance [M], followed_mask [M]).

    Topics below min_relevance or in the user's not-interested list drop;
    ``followed_mask`` marks topics the user follows (the UI's "social proof"
    distinction between followed and recommended topics).
    """
    scores = jax.vmap(lambda t: sparse.cosine(tweet_embedding, t))(
        topic_embeddings
    )  # [T]
    n_topics = scores.shape[0]
    topic_ids = jnp.arange(n_topics, dtype=jnp.int32)

    ok = scores >= config.min_relevance
    if not_interested_topics is not None:
        banned = jnp.any(
            topic_ids[:, None] == not_interested_topics[None, :], axis=1
        )
        ok &= ~banned

    masked = jnp.where(ok, scores, -jnp.inf)
    k = min(config.max_topics_per_tweet, n_topics)
    top_scores, idx = jax.lax.top_k(masked, k)
    out_ids = jnp.where(jnp.isfinite(top_scores), topic_ids[idx], PAD_ID)
    out_scores = jnp.where(jnp.isfinite(top_scores), top_scores, 0.0)

    if followed_topics is not None:
        followed = jnp.any(
            out_ids[:, None] == followed_topics[None, :], axis=1
        ) & (out_ids != PAD_ID)
    else:
        followed = jnp.zeros(out_ids.shape, bool)
    return out_ids, out_scores, followed


def topic_social_proof_batch(
    tweet_embeddings: SparseEmbedding,  # [B, K] batched tweets
    topic_embeddings: SparseEmbedding,  # [T, K]
    *,
    followed_topics: Optional[jnp.ndarray] = None,
    not_interested_topics: Optional[jnp.ndarray] = None,
    topic_allowed: Optional[jnp.ndarray] = None,  # [T] bool (language/locale)
    quality_scores: Optional[jnp.ndarray] = None,  # [T] per-topic skit quality
    min_quality: float = 0.0,
    config: TopicSocialProofConfig = TopicSocialProofConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The service endpoint shape: a tweet batch against the topic table in
    one [B, T] cosine sweep (≡ the TSPS strato batch column; per-language
    allow-lists and skit-quality gating mirror the localized-topic and
    high-precision filters).

    → (topic_ids [B, M], relevance [B, M], followed_mask [B, M]).
    """
    scores = jax.vmap(
        lambda tw: jax.vmap(lambda t: sparse.cosine(tw, t))(topic_embeddings)
    )(tweet_embeddings)  # [B, T]
    B, n_topics = scores.shape
    topic_ids = jnp.arange(n_topics, dtype=jnp.int32)

    ok = scores >= config.min_relevance  # [B, T]
    if topic_allowed is not None:
        ok &= topic_allowed[None, :]
    if quality_scores is not None:
        ok &= (quality_scores >= min_quality)[None, :]
    if not_interested_topics is not None:
        banned = jnp.any(
            topic_ids[:, None] == not_interested_topics[None, :], axis=1
        )
        ok &= ~banned[None, :]

    masked = jnp.where(ok, scores, -jnp.inf)
    k = min(config.max_topics_per_tweet, n_topics)
    top_scores, idx = jax.lax.top_k(masked, k)  # [B, M]
    out_ids = jnp.where(
        jnp.isfinite(top_scores), topic_ids[idx], PAD_ID
    )
    out_scores = jnp.where(jnp.isfinite(top_scores), top_scores, 0.0)
    if followed_topics is not None:
        followed = jnp.any(
            out_ids[:, :, None] == followed_topics[None, None, :], axis=2
        ) & (out_ids != PAD_ID)
    else:
        followed = jnp.zeros(out_ids.shape, bool)
    return out_ids, out_scores, followed
