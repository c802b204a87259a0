"""Follow Recommendations Service (FRS): who-to-follow flows.

≡ ``follow-recommendations-service/`` (README:1-40): per-display-location
``RecommendationFlow``s — candidate sources (sims-graph "similar to who you
follow", triangular closure, geo/popular) → predicates (already-follows,
blocked, health) → ML ranker over edge features → transforms (dedup,
interleave) → truncation.

TPU design: candidate generation is device math over the existing tables —
sims-graph neighbor expansion (gather + dedup-sum) and two-hop triangular
closure; the ranker reuses the RealGraph p(interaction) features + LR.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from the_algorithm_tpu.ops.retrieval import _dedup_sum
from the_algorithm_tpu.ops.sparse import PAD_ID
from the_algorithm_tpu.pipeline.component import Candidate, CandidateSource
from the_algorithm_tpu.simclusters.known_for import Graph


def similar_producers_candidates(
    sims: Graph,  # producer-producer similarity graph
    followed: jnp.ndarray,  # [S] producers the user follows (PAD padded)
    max_results: int,
) -> tuple:
    """"Producers similar to who you follow": expand follows through the
    sims graph, sum similarity over seeds (dedup), top-K.
    ≡ the sims-based candidate source family."""
    valid = followed != PAD_ID
    safe = jnp.where(valid, followed, 0)
    nbr = sims.nbr_ids[safe]  # [S, D]
    w = jnp.where(valid[:, None], sims.nbr_weights[safe], 0.0)
    flat_ids = jnp.where(valid[:, None] & (nbr != PAD_ID), nbr, PAD_ID).reshape(-1)
    uniq, scores = _dedup_sum(flat_ids, w.reshape(-1))
    ok = uniq != PAD_ID
    masked = jnp.where(ok, scores, -jnp.inf)
    k = min(max_results, masked.shape[0])
    top, idx = jax.lax.top_k(masked, k)
    return jnp.where(jnp.isfinite(top), uniq[idx], PAD_ID), top


def triangular_closure_candidates(
    follow_adj: jnp.ndarray,  # [U, D] user→producer follows (PAD padded)
    followed: jnp.ndarray,  # [S] the user's follows (as user ids into follow_adj)
    max_results: int,
) -> tuple:
    """Two-hop closure: accounts followed by accounts you follow, scored by
    #paths (the "two-hop" / friends-of-friends source)."""
    valid = followed != PAD_ID
    safe = jnp.where(valid, followed, 0)
    second = follow_adj[safe]  # [S, D]
    ok2 = valid[:, None] & (second != PAD_ID)
    flat = jnp.where(ok2, second, PAD_ID).reshape(-1)
    uniq, counts = _dedup_sum(flat, ok2.astype(jnp.float32).reshape(-1))
    ok = uniq != PAD_ID
    masked = jnp.where(ok, counts, -jnp.inf)
    k = min(max_results, masked.shape[0])
    top, idx = jax.lax.top_k(masked, k)
    return jnp.where(jnp.isfinite(top), uniq[idx], PAD_ID), top


@dataclasses.dataclass
class RecommendationFlow:
    """≡ FRS ``RecommendationFlow``: sources → predicates → rank → truncate."""

    sources: Sequence[Callable[[object], List[Candidate]]]
    predicates: Sequence[Callable[[object, Candidate], bool]]
    ranker: Optional[Callable[[object, List[Candidate]], None]] = None
    max_results: int = 20

    def run(self, request) -> List[Candidate]:
        candidates: List[Candidate] = []
        seen = set()
        for source in self.sources:
            for c in source(request):
                if c.id not in seen:
                    seen.add(c.id)
                    candidates.append(c)
        candidates = [
            c
            for c in candidates
            if all(p(request, c) for p in self.predicates)
        ]
        if self.ranker is not None:
            self.ranker(request, candidates)
        candidates.sort(key=lambda c: -(c.score or 0.0))
        return candidates[: self.max_results]


# standard predicates (≡ common/.../predicates/)


def not_already_followed(request, candidate: Candidate) -> bool:
    return candidate.id not in getattr(request, "followed_set", set())


def not_blocked(request, candidate: Candidate) -> bool:
    return candidate.id not in getattr(request, "blocked_set", set())


def not_self(request, candidate: Candidate) -> bool:
    return candidate.id != getattr(request, "user_id", None)
