"""Earlybird-equivalent realtime tweet index: ingest, match, score, top-K.

≡ ``src/java/com/twitter/search/earlybird/`` (SURVEY.md: Lucene inverted
index over ~7 days of tweets, Kafka ingestion, schema-based doc features,
relevance scoring via ``LinearScoringFunction:24`` /
``FeatureBasedScoringFunction:69`` / ``TensorflowBasedScoringFunction``,
root fan-out over partitions ``earlybird_root/``, in-network "recap" queries
for home timelines).

TPU re-design: **no inverted index**. A fixed-capacity ring buffer of recent
tweets lives on-device as dense arrays — token ids [T, L], author [T],
timestamps [T], packed static doc features [T, F] (the Earlybird schema
analog). A query scans the whole corpus with vectorized equality masks
(VPU) + a feature-based score + ``lax.top_k``; partitions = 'model'-axis
shards of the tweet axis with all-gather merge (the earlybird_root
scatter-gather, reusing the distributed top-K machinery). Brute scan on TPU
is speed-of-light competitive at realtime-index scale and needs no pointer
chasing (SURVEY.md §2.2 note on HNSW).

Tokenization is host-side (murmur-hashed lowercase terms — parity with the
feature-id hashing used everywhere else).
"""

from __future__ import annotations

import dataclasses
import re
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from the_algorithm_tpu.core.hashing import murmur3_x64_128
from the_algorithm_tpu.core.mesh import MODEL_AXIS
from the_algorithm_tpu.ops.sparse import PAD_ID

_TOKEN_RE = re.compile(r"[a-z0-9_#@]+")


def tokenize(text: str, max_tokens: int) -> np.ndarray:
    """Lowercase word tokens → stable int32 hash ids (PAD padded)."""
    out = np.full(max_tokens, int(PAD_ID), np.int32)
    toks = _TOKEN_RE.findall(text.lower())[:max_tokens]
    for i, t in enumerate(toks):
        h1, _ = murmur3_x64_128(t.encode("utf-8"))
        out[i] = np.int32(h1 & 0x7FFFFFFF)
    return out


# doc-feature schema (the Earlybird schema / ThriftSearchResultFeatures core)
DOC_FEATURES = (
    "fav_count", "retweet_count", "reply_count", "has_url", "has_image",
    "has_video", "is_reply", "is_retweet", "text_score", "tweepcred",
)


@dataclasses.dataclass(frozen=True)
class EarlybirdConfig:
    capacity: int = 1 << 16  # ring-buffer tweets (prod: ~7 days sharded)
    max_tokens: int = 32
    num_features: int = len(DOC_FEATURES)


class EarlybirdIndex(NamedTuple):
    """Device-resident ring buffer of recent tweets."""

    tokens: jnp.ndarray  # [T, L] int32, PAD_ID padded
    author: jnp.ndarray  # [T] int32 (PAD_ID = empty slot)
    created_ts: jnp.ndarray  # [T] int32
    features: jnp.ndarray  # [T, F] float32
    tweet_ids: jnp.ndarray  # [T] int32 external ids
    write_pos: jnp.ndarray  # [] int32 next ring slot

    @property
    def capacity(self) -> int:
        return self.author.shape[0]


def init_index(config: EarlybirdConfig) -> EarlybirdIndex:
    T, L, F = config.capacity, config.max_tokens, config.num_features
    return EarlybirdIndex(
        tokens=jnp.full((T, L), PAD_ID, jnp.int32),
        author=jnp.full((T,), PAD_ID, jnp.int32),
        created_ts=jnp.zeros((T,), jnp.int32),
        features=jnp.zeros((T, F), jnp.float32),
        tweet_ids=jnp.full((T,), PAD_ID, jnp.int32),
        write_pos=jnp.int32(0),
    )


def ingest(
    index: EarlybirdIndex,
    tokens: jnp.ndarray,  # [B, L]
    authors: jnp.ndarray,  # [B]
    created_ts: jnp.ndarray,  # [B]
    features: jnp.ndarray,  # [B, F]
    tweet_ids: jnp.ndarray,  # [B]
) -> EarlybirdIndex:
    """Append a tweet batch at the ring position (the Kafka consumer path,
    ``partition/EarlybirdKafkaConsumer.java``; single-writer semantics)."""
    B = authors.shape[0]
    T = index.capacity
    slots = (index.write_pos + jnp.arange(B)) % T
    return EarlybirdIndex(
        tokens=index.tokens.at[slots].set(tokens),
        author=index.author.at[slots].set(authors),
        created_ts=index.created_ts.at[slots].set(created_ts),
        features=index.features.at[slots].set(features),
        tweet_ids=index.tweet_ids.at[slots].set(tweet_ids),
        write_pos=(index.write_pos + B) % T,
    )


# -- relevance scoring -------------------------------------------------------


DEFAULT_LINEAR_WEIGHTS = jnp.asarray(
    # fav, rt, reply, url, img, video, is_reply, is_rt, text, tweepcred
    [0.4, 0.3, 0.2, 0.05, 0.1, 0.1, -0.05, -0.1, 1.0, 0.01], jnp.float32
)


def linear_score(features: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """≡ ``LinearScoringFunction.java:24`` — dot of doc features and the
    ranking-parameter weights (log1p'd counts for stability)."""
    counts = jnp.log1p(jnp.maximum(features[..., :3], 0.0))
    rest = features[..., 3:]
    x = jnp.concatenate([counts, rest], axis=-1)
    return jnp.einsum("...f,f->...", x, weights)


class SearchQuery(NamedTuple):
    tokens: jnp.ndarray  # [Qt] int32 (PAD for unused)
    require_all: bool  # AND vs OR semantics
    min_ts: jnp.ndarray  # [] int32
    max_ts: jnp.ndarray  # [] int32
    # in-network: sorted follow list (PAD padded); empty ⇒ no author filter
    followed_authors: Optional[jnp.ndarray] = None


def _author_in_set(author: jnp.ndarray, sorted_follows: jnp.ndarray) -> jnp.ndarray:
    """Membership via searchsorted on the sorted follow list."""
    idx = jnp.searchsorted(sorted_follows, author)
    idx = jnp.clip(idx, 0, sorted_follows.shape[0] - 1)
    return sorted_follows[idx] == author


def search(
    index: EarlybirdIndex,
    query: SearchQuery,
    *,
    max_results: int,
    score_weights: jnp.ndarray = DEFAULT_LINEAR_WEIGHTS,
    model_score_fn=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full-corpus scan → (tweet_ids[X], scores[X]).

    ``model_score_fn(features [T, F]) -> [T]`` overrides the linear scorer
    (≡ ``ModelBasedScoringFunction`` / ``TensorflowBasedScoringFunction``
    plugging the light ranker in-index).
    """
    q_valid = query.tokens != PAD_ID  # [Qt]
    # [T, Qt]: does tweet contain query token?
    hit = jnp.any(
        index.tokens[:, :, None] == query.tokens[None, None, :], axis=1
    )
    hit = hit & q_valid[None, :]
    n_q = jnp.maximum(jnp.sum(q_valid), 1)
    has_terms = jnp.any(q_valid)
    if query.require_all:
        match = jnp.sum(hit, axis=1) == n_q
    else:
        match = jnp.any(hit, axis=1)
    # an empty term set is a match-all recency query (the recap/timeline
    # fetch issues author+time-window-only queries)
    match = match | ~has_terms

    ok = (
        match
        & (index.author != PAD_ID)
        & (index.created_ts >= query.min_ts)
        & (index.created_ts <= query.max_ts)
    )
    if query.followed_authors is not None:
        ok &= _author_in_set(index.author, query.followed_authors)

    if model_score_fn is not None:
        score = model_score_fn(index.features)
    else:
        score = linear_score(index.features, score_weights)
    # token-overlap ratio folds in as the text score component
    overlap = jnp.sum(hit, axis=1) / n_q
    score = score + overlap

    score = jnp.where(ok, score, -jnp.inf)
    k = min(max_results, score.shape[0])
    top_scores, idx = jax.lax.top_k(score, k)
    ids = jnp.where(jnp.isfinite(top_scores), index.tweet_ids[idx], PAD_ID)
    return ids, top_scores


def search_sharded(
    mesh,
    index: EarlybirdIndex,  # tweet-axis sharded P('model') on [T] arrays
    query: SearchQuery,
    *,
    max_results: int,
    score_weights: jnp.ndarray = DEFAULT_LINEAR_WEIGHTS,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Partitioned scan + root merge (≡ ``earlybird_root`` fan-out)."""
    from jax.sharding import PartitionSpec as P

    X = max_results

    def local(tokens, author, ts, feats, tids):
        li = EarlybirdIndex(
            tokens, author, ts, feats, tids, jnp.int32(0)
        )
        ids, scores = search(
            li, query, max_results=X, score_weights=score_weights
        )
        all_ids = jax.lax.all_gather(ids, MODEL_AXIS, axis=0, tiled=True)
        all_scores = jax.lax.all_gather(scores, MODEL_AXIS, axis=0, tiled=True)
        top, idx = jax.lax.top_k(all_scores, X)
        return jnp.where(jnp.isfinite(top), all_ids[idx], PAD_ID), top

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(MODEL_AXIS, None), P(MODEL_AXIS), P(MODEL_AXIS),
            P(MODEL_AXIS, None), P(MODEL_AXIS),
        ),
        out_specs=(P(), P()),
        check_vma=False,  # all_gather output is replicated over 'model'
    )
    return fn(
        index.tokens, index.author, index.created_ts,
        index.features, index.tweet_ids,
    )
