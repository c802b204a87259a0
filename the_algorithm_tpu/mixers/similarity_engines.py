"""Similarity engines: the cr-mixer/tweet-mixer engine zoo as CandidateSources.

≡ ``cr-mixer/server/.../similarity_engine/*.scala`` (30+ engines) and
``tweet-mixer/server/.../candidate_pipeline/*.scala`` (50 pipelines): each
engine turns a source signal (user, source tweet, or producer) into scored
tweet candidates via one retrieval backend. Here each engine wraps one of
the framework's device-resident retrieval paths behind the pipeline
``CandidateSource`` interface:

  - :class:`SimClustersANNEngine` ≡ ``SimClustersANNSimilarityEngine.scala``
  - :class:`TwHINANNEngine` ≡ ``TwhinCollabFilterSimilarityEngine`` /
    ``tweet-mixer/.../twhin_ann/TwHINANNCandidateSource.scala`` (dense
    two-tower brute-force top-K standing in for VecDB/HNSW)
  - :class:`UTEGEngine` ≡ ``user_tweet_entity_graph`` traversal
    (``ConsumersBasedUserTweetGraphSimilarityEngine`` family)
  - :class:`EarlybirdEngine` ≡ ``EarlybirdSimilarityEngine`` (model-based
    in-network search)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, List, Optional

import jax.numpy as jnp
import numpy as np

from the_algorithm_tpu.graph import uteg as uteg_mod
from the_algorithm_tpu.ops.retrieval import ClusterTweetIndex
from the_algorithm_tpu.ops.sparse import PAD_ID, SparseEmbedding
from the_algorithm_tpu.pipeline.component import Candidate, CandidateSource
from the_algorithm_tpu.search import earlybird as eb
from the_algorithm_tpu.simclusters import ann


def _to_candidates(ids, scores, source: str) -> List[Candidate]:
    out = []
    for i, s in zip(np.asarray(ids), np.asarray(scores)):
        if int(i) != int(PAD_ID) and np.isfinite(s):
            out.append(
                Candidate(id=int(i), score=float(s), source=source,
                          features={"retrieval_score": float(s)})
            )
    return out


class SimClustersANNEngine(CandidateSource):
    """Query.user_embedding (SimClusters) → SANN candidates."""

    def __init__(
        self,
        index: ClusterTweetIndex,
        config: ann.SimClustersANNConfig,
        embedding_fn: Callable[[Any], SparseEmbedding],
        name: str = "SimClustersANN",
    ):
        self.index = index
        self.config = config
        self.embedding_fn = embedding_fn
        self._name = name

    @property
    def name(self):
        return self._name

    def get(self, query, params) -> List[Candidate]:
        emb = self.embedding_fn(query)
        ids, scores = ann.get_tweet_candidates(self.index, emb, self.config)
        return _to_candidates(ids, scores, self.name)


class TwHINANNEngine(CandidateSource):
    """Dense two-tower retrieval: user vector → brute-force top-K items."""

    def __init__(
        self,
        item_embeddings: jnp.ndarray,  # [N, D] normalized
        user_vector_fn: Callable[[Any], jnp.ndarray],
        k: int = 200,
        name: str = "TwHINANN",
    ):
        self.items = item_embeddings
        self.user_vector_fn = user_vector_fn
        self.k = k
        self._name = name

    @property
    def name(self):
        return self._name

    def get(self, query, params) -> List[Candidate]:
        from the_algorithm_tpu.models.two_tower import retrieve_top_k

        u = self.user_vector_fn(query)[None, :]
        ids, scores = retrieve_top_k(u, self.items, self.k)
        return _to_candidates(ids[0], scores[0], self.name)


class UTEGEngine(CandidateSource):
    """Seeded engagement-graph traversal ("liked by people you follow")."""

    def __init__(
        self,
        graph: uteg_mod.EngagementGraph,
        seeds_fn: Callable[[Any], tuple],  # query -> (seed_ids, seed_weights)
        max_results: int = 200,
        min_social_proof: int = 1,
        name: str = "UTEG",
    ):
        self.graph = graph
        self.seeds_fn = seeds_fn
        self.max_results = max_results
        self.min_social_proof = min_social_proof
        self._name = name

    @property
    def name(self):
        return self._name

    def get(self, query, params) -> List[Candidate]:
        seed_ids, seed_weights = self.seeds_fn(query)
        ids, scores, proof = uteg_mod.recommend(
            self.graph,
            jnp.asarray(seed_ids, jnp.int32),
            jnp.asarray(seed_weights, jnp.float32),
            max_results=self.max_results,
            min_social_proof=self.min_social_proof,
        )
        cands = _to_candidates(ids, scores, self.name)
        proof_np = np.asarray(proof)
        for i, c in enumerate(cands):
            c.features["social_proof"] = float(proof_np[i])
        return cands


class EarlybirdEngine(CandidateSource):
    """In-network realtime search (≡ EarlybirdInNetwork candidate pipeline)."""

    def __init__(
        self,
        index: eb.EarlybirdIndex,
        query_fn: Callable[[Any], eb.SearchQuery],
        max_results: int = 200,
        name: str = "EarlybirdInNetwork",
    ):
        self.index = index
        self.query_fn = query_fn
        self.max_results = max_results
        self._name = name

    @property
    def name(self):
        return self._name

    def get(self, query, params) -> List[Candidate]:
        sq = self.query_fn(query)
        ids, scores = eb.search(self.index, sq, max_results=self.max_results)
        return _to_candidates(ids, scores, self.name)
