"""SimClusters candidate sources: cluster ranking + the SANN wrapper.

≡ ``src/scala/com/twitter/simclusters_v2/candidate_source/{ClusterRanker,
HeavyRanker,SimClustersANNCandidateSource,SimClustersANNWrapperCandidateSource}
.scala`` (817 LoC): before the ANN scan, the consumer's InterestedIn
clusters are *re-ranked* (which clusters are worth scanning is a quality
lever distinct from their embedding scores), and after the scan an optional
heavy ranker re-scores the candidate list.

TPU re-design: cluster ranking is a pure jittable transform on the padded
sparse embedding (select-top-N-by-key while keeping original scan scores);
the wrapper is a pipeline ``CandidateSource`` whose hot path is the jitted
SANN kernel.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from the_algorithm_tpu.core.config import Params
from the_algorithm_tpu.ops.retrieval import ClusterTweetIndex
from the_algorithm_tpu.ops.sparse import PAD_ID, SparseEmbedding
from the_algorithm_tpu.pipeline.component import Candidate, CandidateSource
from the_algorithm_tpu.simclusters import ann
from the_algorithm_tpu.simclusters.representation_manager import (
    EmbeddingId,
    RepresentationManager,
)


class ClusterRankStrategy(enum.Enum):
    """≡ ``ClusterRanker.scala`` ranking modes (RankBy*Score)."""

    BY_SCORE = "score"  # RankByFavScore-style: embedding score as-is
    BY_LOG_SCORE = "log_score"  # dampen head clusters
    BY_NORMALIZED_SCORE = "normalized"  # score / global cluster norm
    BY_INDEX_POPULARITY = "index_popularity"  # score × log1p(#tweets in row)


def rank_clusters(
    embedding: SparseEmbedding,  # [K]
    top_n: int,
    strategy: ClusterRankStrategy = ClusterRankStrategy.BY_SCORE,
    *,
    cluster_norms: Optional[jnp.ndarray] = None,  # [C] for BY_NORMALIZED_SCORE
    index_fill: Optional[jnp.ndarray] = None,  # [C] row fill counts
) -> SparseEmbedding:
    """Pick the top-N clusters to *scan*, keeping original scores.

    ≡ ``ClusterRanker.getTopKClustersByScore``: the ranking key changes per
    strategy but the embedding scores that enter the ANN dot products are
    unchanged.
    """
    valid = embedding.ids != PAD_ID
    if strategy is ClusterRankStrategy.BY_SCORE:
        key = embedding.scores
    elif strategy is ClusterRankStrategy.BY_LOG_SCORE:
        key = jnp.log1p(jnp.maximum(embedding.scores, 0.0))
    elif strategy is ClusterRankStrategy.BY_NORMALIZED_SCORE:
        if cluster_norms is None:
            raise ValueError("BY_NORMALIZED_SCORE needs cluster_norms")
        safe = jnp.where(valid, embedding.ids, 0)
        key = embedding.scores / jnp.maximum(cluster_norms[safe], 1e-9)
    elif strategy is ClusterRankStrategy.BY_INDEX_POPULARITY:
        if index_fill is None:
            raise ValueError("BY_INDEX_POPULARITY needs index_fill")
        safe = jnp.where(valid, embedding.ids, 0)
        key = embedding.scores * jnp.log1p(index_fill[safe].astype(jnp.float32))
    else:  # pragma: no cover
        raise ValueError(strategy)
    key = jnp.where(valid, key, -jnp.inf)
    n = min(top_n, embedding.ids.shape[0])
    top_key, idx = jax.lax.top_k(key, n)
    keep = jnp.isfinite(top_key)
    return SparseEmbedding(
        jnp.where(keep, embedding.ids[idx], PAD_ID),
        jnp.where(keep, embedding.scores[idx], 0.0),
    )


def index_fill_counts(index: ClusterTweetIndex) -> jnp.ndarray:
    """#real tweets per cluster row — the BY_INDEX_POPULARITY signal."""
    return (index.tweet_ids != PAD_ID).sum(axis=1)


# ≡ HeavyRanker.scala — a post-retrieval re-scorer hook (prod plugs a model)
HeavyRanker = Callable[[Any, jnp.ndarray, jnp.ndarray], jnp.ndarray]


@dataclasses.dataclass
class SimClustersANNWrapperConfig:
    """Wrapper knobs (≡ SimClustersANNWrapperCandidateSource params)."""

    embedding: EmbeddingId = None  # type: ignore[assignment]
    ann_config: ann.SimClustersANNConfig = dataclasses.field(
        default_factory=ann.SimClustersANNConfig
    )
    cluster_rank_strategy: ClusterRankStrategy = ClusterRankStrategy.BY_SCORE
    enable_heavy_ranker: bool = False


class SimClustersANNWrapperCandidateSource(CandidateSource):
    """≡ ``SimClustersANNWrapperCandidateSource.scala``: RMS fetch →
    cluster rank → SANN scan → optional heavy rerank, as one component."""

    def __init__(
        self,
        rms: RepresentationManager,
        index: ClusterTweetIndex,
        config: SimClustersANNWrapperConfig,
        heavy_ranker: Optional[HeavyRanker] = None,
    ):
        self.rms = rms
        self.index = index
        self.config = config
        self.heavy_ranker = heavy_ranker
        self._fill = index_fill_counts(index)
        cfg = config.ann_config

        def _query(ids, scores):
            emb = rank_clusters(
                SparseEmbedding(ids, scores),
                cfg.max_scan_clusters,
                config.cluster_rank_strategy,
                index_fill=self._fill,
            )
            return ann.get_tweet_candidates(index, emb, cfg)

        self._query = jax.jit(_query)

    def get(self, query: Any, params: Params) -> List[Candidate]:
        user_id = getattr(query, "user_id", None)
        if user_id is None:
            user_id = query["user_id"]
        emb = self.rms.get(self.config.embedding, int(user_id))
        ids, scores = self._query(emb.ids, emb.scores)
        if self.heavy_ranker is not None and self.config.enable_heavy_ranker:
            scores = self.heavy_ranker(query, ids, scores)
            order = jnp.argsort(-scores)
            ids, scores = ids[order], scores[order]
        ids_np = np.asarray(ids)
        scores_np = np.asarray(scores)
        return [
            Candidate(
                id=int(t), score=float(s), source="simclusters_ann_wrapper"
            )
            for t, s in zip(ids_np, scores_np)
            if t != PAD_ID
        ]
