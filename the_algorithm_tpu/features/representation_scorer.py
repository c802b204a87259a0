"""Representation Scorer (RSX): engagement-similarity ML features.

≡ ``representation-scorer/server/.../twistlyfeatures/Scorer.scala:113-157``:
for a (user, candidate tweet) pair, compute cosine similarity between the
candidate's SimClusters embedding and the embeddings of the user's recent
engagement tweets per signal type (favs/retweets/replies/shares/video-plays
over 7d and 1d windows, ``Engagements.scala:7-44``), aggregated as
min/avg/max — the "twistly" feature block consumed by the heavy ranker
(``SimClustersEngagementSimilarityFeatureHydrator``).

TPU design: one batched kernel — candidates [C] × engagement tweets [E] →
pairwise cosine matrix (the K×K sparse-intersection op under two vmaps),
masked per signal type / time window, reduced min/avg/max. The whole
feature block for a request is a single jitted call.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from the_algorithm_tpu.ops import sparse
from the_algorithm_tpu.ops.sparse import SparseEmbedding

SIGNAL_TYPES = (
    "fav", "retweet", "reply", "share", "original_tweet", "video_playback",
)
WINDOWS_S = {"7d": 7 * 86400, "1d": 86400}


class EngagementSet(NamedTuple):
    """A user's recent engagement tweets (fixed width E, padded).

    ``signal_type``: index into SIGNAL_TYPES; ``timestamp``: event seconds.
    """

    embeddings: SparseEmbedding  # [E, K]
    signal_type: jnp.ndarray  # [E] int32
    timestamp: jnp.ndarray  # [E] int32
    valid: jnp.ndarray  # [E] bool


# similarity kinds computed per (signal, window) block; "cosine" keeps the
# bare legacy names, the others prefix with the kind — the reference's
# per-similarity-type score stores
# (``SimClustersEmbeddingPairScoreStore.build{DotProduct,CosineSimilarity,
# LogCosineSimilarity}Store``, ``score/ScoreStore.scala``)
SIMILARITY_KINDS = ("cosine", "dot", "log_cosine", "euclidean")
_KIND_FNS = {
    "cosine": sparse.cosine,
    "dot": sparse.dot,
    "log_cosine": sparse.log_norm_cosine,
    "euclidean": sparse.euclidean,
}


def feature_names(kinds: Tuple[str, ...] = ("cosine",)) -> Tuple[str, ...]:
    """Column order of :func:`engagement_similarity_features` (for callers
    that fetch the block as one stacked array)."""
    out = []
    for kind in kinds:
        prefix = "" if kind == "cosine" else f"{kind}_"
        for w_name in WINDOWS_S:
            for s_name in SIGNAL_TYPES:
                for agg in ("avg", "max", "min"):
                    out.append(f"{prefix}{s_name}_{w_name}_{agg}")
    return tuple(out)


def engagement_similarity_features(
    candidates: SparseEmbedding,  # [C, K]
    engagements: EngagementSet,
    now: jnp.ndarray,
    kinds: Tuple[str, ...] = ("cosine",),
) -> Dict[str, jnp.ndarray]:
    """→ {f"[{kind}_]{signal}_{window}_{agg}": [C]} feature block.

    agg ∈ {min, avg, max} over the user's engagement tweets of that signal
    type within the window — ≡ SimClustersRecentEngagementSimilarities;
    ``kinds`` selects the pairwise similarity families (cosine emits the
    bare legacy names).
    """
    out: Dict[str, jnp.ndarray] = {}
    age = now - engagements.timestamp
    for kind in kinds:
        sim = sparse.pairwise_matrix(
            _KIND_FNS[kind], candidates, engagements.embeddings
        )  # [C, E]
        prefix = "" if kind == "cosine" else f"{kind}_"
        for w_name, w_secs in WINDOWS_S.items():
            in_window = engagements.valid & (age <= w_secs)
            for s_idx, s_name in enumerate(SIGNAL_TYPES):
                m = in_window & (engagements.signal_type == s_idx)  # [E]
                mf = m.astype(jnp.float32)[None, :]
                count = jnp.sum(mf, axis=1)  # [C] (same for all C)
                has = count > 0
                out[f"{prefix}{s_name}_{w_name}_avg"] = jnp.where(
                    has, jnp.sum(jnp.where(m[None, :], sim, 0.0), axis=1)
                    / jnp.maximum(count, 1.0), 0.0
                )
                out[f"{prefix}{s_name}_{w_name}_max"] = jnp.where(
                    has, jnp.max(jnp.where(m[None, :], sim, -jnp.inf), axis=1),
                    0.0
                )
                out[f"{prefix}{s_name}_{w_name}_min"] = jnp.where(
                    has, jnp.min(jnp.where(m[None, :], sim, jnp.inf), axis=1),
                    0.0
                )
    return out


# -- generic pairwise score store (simclusters_v2/score facade analog) -------


@dataclasses.dataclass(frozen=True)
class PairScoreStore:
    """≡ ``SimClustersEmbeddingPairScoreStore.build*Store``
    (``src/scala/com/twitter/simclusters_v2/score/SimClustersEmbeddingPairScoreStore.scala:39-139``):
    one callable per similarity kind over embedding pairs."""

    kind: str  # dot | cosine | log_cosine | exp_cosine | jaccard

    def __call__(
        self, a: SparseEmbedding, b: SparseEmbedding
    ) -> jnp.ndarray:
        fn = {
            "dot": sparse.dot,
            "cosine": sparse.cosine,
            "log_cosine": sparse.log_norm_cosine,
            "exp_cosine": sparse.exp_scaled_cosine,
            "jaccard": sparse.fuzzy_jaccard,
            "euclidean": sparse.euclidean,
            "manhattan": sparse.manhattan,
        }[self.kind]
        return fn(a, b)


def weighted_sum_score(
    scores: Dict[str, jnp.ndarray], weights: Dict[str, float]
) -> jnp.ndarray:
    """≡ ``score/WeightedSumAggregatedScoreStore.scala`` — a linear blend of
    underlying pair scores."""
    total = None
    for k, w in weights.items():
        term = scores[k] * w
        total = term if total is None else total + term
    return total
