"""TimelineRanker: the legacy fetch layer (recap + recycled candidates).

≡ ``timelineranker/`` (README:1-15): serves home-mixer two light-ranked
streams — earlybird-relevance-scored in-network tweets ("recap") and UTEG
out-of-network tweets ("recycled") — with light truncation by earlybird
score before the heavy ranker sees them.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from the_algorithm_tpu.graph import uteg as uteg_mod
from the_algorithm_tpu.ops.sparse import PAD_ID
from the_algorithm_tpu.search import earlybird as eb


@dataclasses.dataclass(frozen=True)
class TimelineRankerConfig:
    max_in_network: int = 300
    max_out_of_network: int = 100
    min_social_proof: int = 1


@dataclasses.dataclass
class TimelineCandidates:
    in_network_ids: np.ndarray
    in_network_scores: np.ndarray
    oon_ids: np.ndarray
    oon_scores: np.ndarray


def get_ranked_timeline(
    index: eb.EarlybirdIndex,
    graph: uteg_mod.EngagementGraph,
    *,
    followed_authors: Sequence[int],
    seed_weights: Sequence[float],
    min_ts: int,
    max_ts: int,
    config: TimelineRankerConfig = TimelineRankerConfig(),
) -> TimelineCandidates:
    """Fetch both streams (the RecapQuery + RecycledQuery paths)."""
    follows_sorted = jnp.asarray(sorted(followed_authors), jnp.int32)
    in_ids, in_scores = eb.search(
        index,
        eb.SearchQuery(
            tokens=jnp.full((1,), PAD_ID, jnp.int32),  # match-all recency
            require_all=False,
            min_ts=jnp.int32(min_ts),
            max_ts=jnp.int32(max_ts),
            followed_authors=follows_sorted,
        ),
        max_results=config.max_in_network,
    )
    oon_ids, oon_scores, _ = uteg_mod.recommend(
        graph,
        jnp.asarray(list(followed_authors), jnp.int32),
        jnp.asarray(list(seed_weights), jnp.float32),
        max_results=config.max_out_of_network,
        min_social_proof=config.min_social_proof,
        min_timestamp=jnp.int32(min_ts),
    )
    return TimelineCandidates(
        np.asarray(in_ids), np.asarray(in_scores),
        np.asarray(oon_ids), np.asarray(oon_scores),
    )


def get_ranked_timeline_multitier(
    root,  # search.root.SuperRoot
    graph: uteg_mod.EngagementGraph,
    *,
    followed_authors: Sequence[int],
    seed_weights: Sequence[float],
    min_ts: int,
    max_ts: int,
    relevance: "eb.RelevanceParams" = None,
    config: TimelineRankerConfig = TimelineRankerConfig(),
) -> TimelineCandidates:
    """Multi-tier variant: the recap stream fans out through the SuperRoot
    (realtime + archive tiers, request-scoped relevance) — the reference's
    timelineranker → earlybird-root call path; recycled stays UTEG."""
    follows_sorted = jnp.asarray(sorted(followed_authors), jnp.int32)
    in_ids, in_scores, _ = root.search(
        eb.SearchQuery(
            tokens=jnp.full((1,), PAD_ID, jnp.int32),
            require_all=False,
            min_ts=jnp.int32(min_ts),
            max_ts=jnp.int32(max_ts),
            followed_authors=follows_sorted,
        ),
        max_results=config.max_in_network,
        relevance=relevance,
    )
    oon_ids, oon_scores, _ = uteg_mod.recommend(
        graph,
        jnp.asarray(list(followed_authors), jnp.int32),
        jnp.asarray(list(seed_weights), jnp.float32),
        max_results=config.max_out_of_network,
        min_social_proof=config.min_social_proof,
        min_timestamp=jnp.int32(min_ts),
    )
    return TimelineCandidates(
        np.asarray(in_ids), np.asarray(in_scores),
        np.asarray(oon_ids), np.asarray(oon_scores),
    )
