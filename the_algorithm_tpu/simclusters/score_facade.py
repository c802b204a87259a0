"""Score facade: generic ScoreId → Score store composition.

≡ ``src/scala/com/twitter/simclusters_v2/score/{ScoreFacadeStore,
WeightedSumAggregatedScoreStore,Score}.scala`` (635 LoC): a single entry
point that resolves *pairwise* scores (a similarity algorithm applied to two
embeddings fetched by id) and *aggregate* scores (weighted sums of other
scores), so callers never touch embedding stores directly.

TPU re-design: score resolution stays host-side orchestration (it is
config, not math); the pairwise math itself is the jitted sparse-ops kernels
from :mod:`the_algorithm_tpu.ops.sparse`, applied batched — a request for B
pairs is one device call per algorithm, not B store reads.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from the_algorithm_tpu.ops import sparse
from the_algorithm_tpu.ops.sparse import SparseEmbedding
from the_algorithm_tpu.simclusters.representation_manager import (
    EmbeddingId,
    RepresentationManager,
)

# ≡ thrift ScoringAlgorithm values handled by ScoreFacadeStore
PAIR_ALGORITHMS = {
    "PairEmbeddingDotProduct": sparse.dot,
    "PairEmbeddingCosineSimilarity": sparse.cosine,
    "PairEmbeddingLogCosineSimilarity": sparse.log_norm_cosine,
    "PairEmbeddingExpScaledCosineSimilarity": sparse.exp_scaled_cosine,
    "PairEmbeddingJaccardSimilarity": sparse.fuzzy_jaccard,
    "PairEmbeddingEuclideanDistance": sparse.euclidean,
    "PairEmbeddingManhattanDistance": sparse.manhattan,
}


@dataclasses.dataclass(frozen=True)
class PairScoreId:
    """≡ ``SimClustersEmbeddingPairScoreId`` (score.thrift): algorithm ×
    (embedding-id, entity) × (embedding-id, entity)."""

    algorithm: str
    a_embedding: EmbeddingId
    a_id: int
    b_embedding: EmbeddingId
    b_id: int


@dataclasses.dataclass(frozen=True)
class WeightedSumSpec:
    """≡ ``WeightedSumAggregatedScoreStore.scala``: a named linear blend of
    underlying pairwise algorithms over the same entity pair."""

    name: str
    terms: Tuple[Tuple[str, float], ...]  # (pair algorithm, weight)


class ScoreFacadeStore:
    """≡ ``ScoreFacadeStore.scala`` — one `get` for every score kind."""

    def __init__(self, rms: RepresentationManager):
        self.rms = rms
        self._aggregates: Dict[str, WeightedSumSpec] = {}

    def register_aggregate(self, spec: WeightedSumSpec) -> None:
        for alg, _ in spec.terms:
            if alg not in PAIR_ALGORITHMS:
                raise KeyError(f"unknown pair algorithm {alg}")
        self._aggregates[spec.name] = spec

    # -- pairwise ------------------------------------------------------------

    def pair_scores(
        self,
        algorithm: str,
        a_embedding: EmbeddingId,
        a_ids: Sequence[int],
        b_embedding: EmbeddingId,
        b_ids: Sequence[int],
    ) -> jnp.ndarray:
        """Batched pairwise scores: one fused device call for B pairs."""
        fn = PAIR_ALGORITHMS[algorithm]
        a = self.rms.multiget(a_embedding, np.asarray(a_ids))
        b = self.rms.multiget(b_embedding, np.asarray(b_ids))
        return jax.vmap(fn)(a, b)

    def get(self, score_id: PairScoreId) -> float:
        out = self.pair_scores(
            score_id.algorithm,
            score_id.a_embedding,
            [score_id.a_id],
            score_id.b_embedding,
            [score_id.b_id],
        )
        return float(out[0])

    # -- aggregates ------------------------------------------------------------

    def aggregate_scores(
        self,
        name: str,
        a_embedding: EmbeddingId,
        a_ids: Sequence[int],
        b_embedding: EmbeddingId,
        b_ids: Sequence[int],
    ) -> jnp.ndarray:
        """Weighted sum of underlying pair scores, batched.

        The underlying embeddings are fetched once and every term reuses
        them (the reference re-reads per term through its cache; here the
        batch is already device-resident).
        """
        spec = self._aggregates[name]
        a = self.rms.multiget(a_embedding, np.asarray(a_ids))
        b = self.rms.multiget(b_embedding, np.asarray(b_ids))

        def blended(ea: SparseEmbedding, eb: SparseEmbedding):
            total = jnp.asarray(0.0)
            for alg, w in spec.terms:
                total = total + w * PAIR_ALGORITHMS[alg](ea, eb)
            return total

        return jax.vmap(blended)(a, b)
