"""SimClusters sparse-embedding ops, TPU-native.

The reference's ``SimClustersEmbedding``
(``src/scala/com/twitter/simclusters_v2/common/SimClustersEmbedding.scala:25-434``)
is a sorted (clusterId → score) array with dot / cosine / log-cosine /
exp-scaled-cosine / (fuzzy-)jaccard / euclidean / manhattan ops implemented as
two-pointer merges over id-sorted arrays
(``common/CosineSimilarityUtil.scala:8-251``).

Here an embedding is a **fixed-capacity** pair of arrays — ``ids:int32[K]``
(padding = ``PAD_ID``), ``scores:float32[K]`` (0 in padding) — so every op is
static-shaped and vectorizes on the VPU/MXU. Sequential merges become K×K
all-pairs equality masks (K ≤ 64 ⇒ ≤4096 lanes — cheaper on TPU than any
data-dependent loop). Scores are float32 (the JVM uses float64; accumulations
stay in float32 which holds parity at these magnitudes — SURVEY.md "hard
parts").

All ops are unbatched over ``[K]`` and wrapped with ``jax.vmap`` helpers; all
are jit-compatible.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

PAD_ID = np.int32(np.iinfo(np.int32).max)  # sorts after every real id
DEFAULT_EXPONENT = 0.3  # SimClustersEmbedding.scala:454


class SparseEmbedding(NamedTuple):
    """Fixed-capacity sparse embedding: (ids, scores), score-descending."""

    ids: jnp.ndarray  # [..., K] int32, PAD_ID in empty slots
    scores: jnp.ndarray  # [..., K] float32, 0.0 in empty slots

    @property
    def capacity(self) -> int:
        return self.ids.shape[-1]

    def valid_mask(self) -> jnp.ndarray:
        return self.ids != PAD_ID


def make(ids, scores, capacity: int) -> SparseEmbedding:
    """Build from (ids, scores), keeping the top-``capacity`` by score.

    Mirrors construction-time truncation (``SimClustersEmbedding.scala:480``).
    Input may be any length; output is score-descending with PAD fill.
    """
    ids = jnp.asarray(ids, jnp.int32)
    scores = jnp.asarray(scores, jnp.float32)
    n = ids.shape[-1]
    k = min(capacity, n)
    top_scores, idx = jax.lax.top_k(scores, k)
    top_ids = jnp.take_along_axis(ids, idx, axis=-1)
    pad_width = capacity - k
    if pad_width > 0:
        top_ids = jnp.concatenate(
            [top_ids, jnp.full(top_ids.shape[:-1] + (pad_width,), PAD_ID, jnp.int32)],
            axis=-1,
        )
        top_scores = jnp.concatenate(
            [top_scores, jnp.zeros(top_scores.shape[:-1] + (pad_width,), jnp.float32)],
            axis=-1,
        )
    # zero out any padding that slipped through top_k (scores at PAD slots)
    top_scores = jnp.where(top_ids == PAD_ID, 0.0, top_scores)
    return SparseEmbedding(top_ids, top_scores)


def from_dense(dense: jnp.ndarray, capacity: int) -> SparseEmbedding:
    """Top-``capacity`` sparsification of a dense cluster-score vector."""
    scores, ids = jax.lax.top_k(dense, capacity)
    ids = ids.astype(jnp.int32)
    ids = jnp.where(scores > 0, ids, PAD_ID)
    scores = jnp.where(scores > 0, scores, 0.0)
    return SparseEmbedding(ids, scores.astype(jnp.float32))


def to_dense(emb: SparseEmbedding, num_clusters: int) -> jnp.ndarray:
    """Scatter to a dense [num_clusters] vector (PAD slots dropped)."""
    safe_ids = jnp.where(emb.valid_mask(), emb.ids, 0)
    contrib = jnp.where(emb.valid_mask(), emb.scores, 0.0)
    return jnp.zeros((num_clusters,), jnp.float32).at[safe_ids].add(contrib)


# -- norms (CosineSimilarityUtil.scala) -------------------------------------


def sum_of_squares(emb: SparseEmbedding) -> jnp.ndarray:
    return jnp.sum(emb.scores * emb.scores, axis=-1)


def l2_norm(emb: SparseEmbedding) -> jnp.ndarray:
    """``normArray``: sqrt(Σ s²)."""
    return jnp.sqrt(sum_of_squares(emb))


def log_norm(emb: SparseEmbedding) -> jnp.ndarray:
    """``logNormArray``: log(Σ s² + 1)."""
    return jnp.log(sum_of_squares(emb) + 1.0)


def exp_scaled_norm(
    emb: SparseEmbedding, exponent: float = DEFAULT_EXPONENT
) -> jnp.ndarray:
    """``expScaledNormArray``: (Σ s²)^exponent."""
    return jnp.power(sum_of_squares(emb), exponent)


def l2_normalize(emb: SparseEmbedding) -> SparseEmbedding:
    norm = l2_norm(emb)
    scale = jnp.where(norm > 0, 1.0 / jnp.maximum(norm, 1e-30), 0.0)
    return SparseEmbedding(emb.ids, emb.scores * scale[..., None])


# -- pairwise similarities ---------------------------------------------------


def _match_matrix(a: SparseEmbedding, b: SparseEmbedding) -> jnp.ndarray:
    """[Ka, Kb] float mask of id equality (PAD never matches: scores are 0)."""
    eq = a.ids[:, None] == b.ids[None, :]
    both_valid = a.valid_mask()[:, None] & b.valid_mask()[None, :]
    return (eq & both_valid).astype(jnp.float32)


def dot(a: SparseEmbedding, b: SparseEmbedding) -> jnp.ndarray:
    """Sparse dot product (``dotProductForSortedClusterAndScores`` analog)."""
    m = _match_matrix(a, b)
    return jnp.einsum("i,ij,j->", a.scores, m, b.scores)


def cosine(a: SparseEmbedding, b: SparseEmbedding) -> jnp.ndarray:
    d = dot(a, b)
    denom = l2_norm(a) * l2_norm(b)
    return jnp.where(denom > 0, d / jnp.maximum(denom, 1e-30), 0.0)


def log_norm_cosine(a: SparseEmbedding, b: SparseEmbedding) -> jnp.ndarray:
    """``logNormCosineSimilarity``: dot of log-norm-scaled vectors."""
    d = dot(a, b)
    denom = log_norm(a) * log_norm(b)
    return jnp.where(denom > 0, d / jnp.maximum(denom, 1e-30), 0.0)


def exp_scaled_cosine(
    a: SparseEmbedding, b: SparseEmbedding, exponent: float = DEFAULT_EXPONENT
) -> jnp.ndarray:
    """``expScaledCosineSimilarity``: dot of (Σs²)^exp-scaled vectors."""
    d = dot(a, b)
    denom = exp_scaled_norm(a, exponent) * exp_scaled_norm(b, exponent)
    return jnp.where(denom > 0, d / jnp.maximum(denom, 1e-30), 0.0)


def jaccard(a: SparseEmbedding, b: SparseEmbedding) -> jnp.ndarray:
    """Set jaccard over cluster-id sets (``jaccardSimilarity``)."""
    m = _match_matrix(a, b)
    intersect = jnp.sum(m)
    na = jnp.sum(a.valid_mask())
    nb = jnp.sum(b.valid_mask())
    union = na + nb - intersect
    return jnp.where(union > 0, intersect / jnp.maximum(union, 1.0), 0.0)


def fuzzy_jaccard(a: SparseEmbedding, b: SparseEmbedding) -> jnp.ndarray:
    """Σ min(sa, sb) / Σ max(sa, sb) over the id union (``fuzzyJaccardSimilarity``)."""
    m = _match_matrix(a, b)
    # matched score of each a-slot in b (0 when unmatched), and vice versa
    b_in_a = m @ b.scores  # [Ka]
    a_in_b = m.T @ a.scores  # [Kb]
    num = jnp.sum(jnp.minimum(a.scores, b_in_a) * (b_in_a > 0))
    den = (
        jnp.sum(jnp.maximum(a.scores, b_in_a))  # all a-slots (union side a)
        + jnp.sum(jnp.where(a_in_b > 0, 0.0, b.scores))  # b-only slots
    )
    return jnp.where(den > 0, num / jnp.maximum(den, 1e-30), 0.0)


def euclidean(a: SparseEmbedding, b: SparseEmbedding) -> jnp.ndarray:
    """sqrt Σ_union (sa - sb)² (``euclideanDistance``)."""
    m = _match_matrix(a, b)
    b_in_a = m @ b.scores
    a_in_b = m.T @ a.scores
    d_a = jnp.sum((a.scores - b_in_a) ** 2)  # a slots (incl. matched)
    d_b = jnp.sum(jnp.where(a_in_b > 0, 0.0, b.scores**2))  # b-only slots
    return jnp.sqrt(d_a + d_b)


def manhattan(a: SparseEmbedding, b: SparseEmbedding) -> jnp.ndarray:
    """Σ_union |sa - sb| (``manhattanDistance``)."""
    m = _match_matrix(a, b)
    b_in_a = m @ b.scores
    a_in_b = m.T @ a.scores
    d_a = jnp.sum(jnp.abs(a.scores - b_in_a))
    d_b = jnp.sum(jnp.where(a_in_b > 0, 0.0, jnp.abs(b.scores)))
    return d_a + d_b


# -- monoid ------------------------------------------------------------------


def add(a: SparseEmbedding, b: SparseEmbedding, capacity: int) -> SparseEmbedding:
    """Merge-add two embeddings, truncating to top-``capacity`` by score.

    The ``SimClustersEmbeddingMonoid`` analog
    (``common/SimClustersEmbeddingMonoid.scala``): duplicate cluster ids sum.
    Static-shaped: concat → sort by id → run-collapse via segment_sum → top-K.
    """
    ids = jnp.concatenate([a.ids, b.ids], axis=-1)
    scores = jnp.concatenate([a.scores, b.scores], axis=-1)
    order = jnp.argsort(ids)
    ids = ids[order]
    scores = scores[order]
    # group equal adjacent ids
    new_run = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (ids[1:] != ids[:-1]).astype(jnp.int32)]
    )
    seg = jnp.cumsum(new_run) - 1
    n = ids.shape[-1]
    summed = jax.ops.segment_sum(scores, seg, num_segments=n)
    rep_scores = jnp.where(new_run == 1, summed[seg], 0.0)
    rep_ids = jnp.where(new_run == 1, ids, PAD_ID)
    rep_scores = jnp.where(rep_ids == PAD_ID, 0.0, rep_scores)
    return make(rep_ids, rep_scores, capacity)


def scale(emb: SparseEmbedding, factor) -> SparseEmbedding:
    return SparseEmbedding(emb.ids, emb.scores * jnp.float32(factor))


def truncate(emb: SparseEmbedding, size: int) -> SparseEmbedding:
    """Keep top-``size`` by score (``SimClustersEmbedding.truncate:377``)."""
    return make(emb.ids, emb.scores, size)


# -- batched wrappers --------------------------------------------------------


def batched(fn, *, in_axes=(0, 0)):
    """vmap a pairwise op over leading batch dims of SparseEmbeddings."""
    return jax.vmap(fn, in_axes=in_axes)


dot_batch = jax.vmap(dot)
cosine_batch = jax.vmap(cosine)
log_norm_cosine_batch = jax.vmap(log_norm_cosine)


def pairwise_cosine_matrix(
    a: SparseEmbedding, b: SparseEmbedding
) -> jnp.ndarray:
    """[Na, Nb] cosine matrix between two batches (listwise feature block)."""
    return jax.vmap(lambda ai: jax.vmap(lambda bj: cosine(ai, bj))(b))(a)


def pairwise_matrix(fn, a: SparseEmbedding, b: SparseEmbedding) -> jnp.ndarray:
    """[Na, Nb] matrix of any pairwise similarity op (dot/log_cosine/…) —
    the generalized listwise block behind the RSX similarity-kind families
    (``SimClustersEmbeddingPairScoreStore.build*Store``)."""
    return jax.vmap(lambda ai: jax.vmap(lambda bj: fn(ai, bj))(b))(a)
