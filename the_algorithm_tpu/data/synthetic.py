"""Synthetic data shaped like the reference's inputs (SURVEY.md §7 layer 2).

Twitter's data is absent from the open-source dump, so every offline job and
model here trains/evaluates on planted-structure synthetic data:

  - planted-community follow/fav graphs (ground-truth communities let the
    KnownFor chain be *tested*, not just run);
  - engagement logs (user, tweet, engagement-type, timestamp) with
    community-biased preferences for the ranking models;
  - DataRecord-style (feature-id → value) examples for the light ranker.

All generators are numpy-based (host side), deterministic under seed.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import numpy as np

from the_algorithm_tpu.ops.sparse import PAD_ID


@dataclasses.dataclass(frozen=True)
class CommunityGraphConfig:
    num_users: int = 2048
    num_producers: int = 512
    num_communities: int = 16
    follows_per_user: int = 32
    in_community_prob: float = 0.8  # follows land in own community w.p. p
    fav_prob: float = 0.5  # P(fav edge | follow edge)
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class CommunityGraph:
    """User→producer engagement adjacency with planted communities."""

    producer_ids: np.ndarray  # [U, D] int32, PAD_ID padded
    followed: np.ndarray  # [U, D] bool
    fav_score: np.ndarray  # [U, D] f32
    log_fav_score: np.ndarray  # [U, D] f32
    user_community: np.ndarray  # [U] ground truth
    producer_community: np.ndarray  # [P] ground truth
    config: CommunityGraphConfig


def community_graph(cfg: CommunityGraphConfig = CommunityGraphConfig()) -> CommunityGraph:
    rng = np.random.default_rng(cfg.seed)
    U, P, C, D = (
        cfg.num_users,
        cfg.num_producers,
        cfg.num_communities,
        cfg.follows_per_user,
    )
    user_comm = rng.integers(0, C, U)
    prod_comm = rng.integers(0, C, P)
    producers_by_comm = [np.where(prod_comm == c)[0] for c in range(C)]

    pids = np.full((U, D), PAD_ID, np.int32)
    followed = np.zeros((U, D), bool)
    fav = np.zeros((U, D), np.float32)
    for u in range(U):
        own = producers_by_comm[user_comm[u]]
        choices = []
        seen = set()
        while len(choices) < D:
            if rng.uniform() < cfg.in_community_prob and len(own) > 0:
                p = int(own[rng.integers(len(own))])
            else:
                p = int(rng.integers(P))
            if p not in seen:
                seen.add(p)
                choices.append(p)
        pids[u] = np.array(choices, np.int32)
        followed[u] = True
        fav_mask = rng.uniform(size=D) < cfg.fav_prob
        fav[u] = np.where(fav_mask, rng.exponential(1.0, D), 0.0).astype(np.float32)
    logfav = np.log1p(fav).astype(np.float32)
    return CommunityGraph(
        pids, followed, fav, logfav, user_comm, prod_comm, cfg
    )


@dataclasses.dataclass(frozen=True)
class EngagementLogConfig:
    num_users: int = 2048
    num_tweets: int = 4096
    num_communities: int = 16
    events_per_user: int = 24
    in_community_prob: float = 0.85
    seed: int = 0


def engagement_log(
    user_community: np.ndarray, cfg: EngagementLogConfig
) -> Dict[str, np.ndarray]:
    """Fav-event stream: (user_id, tweet_id, timestamp) with community bias.

    Tweets are assigned communities; users mostly fav in-community tweets —
    the ground truth for recall@K evaluation of the retrieval stack.
    """
    rng = np.random.default_rng(cfg.seed + 1)
    T, C = cfg.num_tweets, cfg.num_communities
    tweet_comm = rng.integers(0, C, T)
    tweets_by_comm = [np.where(tweet_comm == c)[0] for c in range(C)]
    users, tweets, ts = [], [], []
    t_clock = 0
    for u in range(cfg.num_users):
        for _ in range(cfg.events_per_user):
            if rng.uniform() < cfg.in_community_prob:
                pool = tweets_by_comm[user_community[u] % C]
                t = int(pool[rng.integers(len(pool))]) if len(pool) else int(rng.integers(T))
            else:
                t = int(rng.integers(T))
            users.append(u)
            tweets.append(t)
            ts.append(t_clock)
            t_clock += 1
    return {
        "user_ids": np.array(users, np.int32),
        "tweet_ids": np.array(tweets, np.int32),
        "timestamps": np.array(ts, np.int32),
        "tweet_community": tweet_comm,
    }


def lr_examples(
    num_examples: int,
    num_features: int = 40,
    seed: int = 0,
) -> Tuple[Dict[str, np.ndarray], np.ndarray]:
    """Earlybird-light-ranker-shaped examples: continuous features + labels.

    Features mimic the recap feature config (~40 continuous features,
    ``src/python/twitter/deepbird/projects/timelines/configs/recap_earlybird/
    feature_config.py``); the label is a logistic function of a sparse
    ground-truth weight vector so AUC is learnable and known.
    """
    rng = np.random.default_rng(seed)
    feature_ids = (rng.integers(1, 2**31 - 1, num_features)).astype(np.int64)
    values = rng.normal(size=(num_examples, num_features)).astype(np.float32)
    true_w = np.where(
        rng.uniform(size=num_features) < 0.5, rng.normal(size=num_features), 0.0
    )
    logits = values @ true_w + 0.3 * rng.normal(size=num_examples)
    labels = (rng.uniform(size=num_examples) < 1 / (1 + np.exp(-logits))).astype(
        np.float32
    )
    return (
        {"feature_ids": feature_ids, "values": values},
        labels,
    )
