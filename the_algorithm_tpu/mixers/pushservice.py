"""Pushservice: the notification recommender pipeline.

≡ ``pushservice/src/main/scala/com/twitter/frigate/pushservice/`` (SURVEY.md
§2.1): refresh handler → target building (is the user reachable? device,
fatigue, open rate) → candidate sources (incl. the SimClusters
push-open-based index) → hydration → **light ranking** (MLP,
``model_pools_mlp.py``) → take (top-1 with fatigue bookkeeping) after
**heavy ranking** (ClemNet multi-task: open/favorite probabilities).

In-process: target building is a predicate stack; candidates come from any
framework CandidateSource; the rankers are the JAX push models behind
batched predict fns; the take step enforces per-user notification budgets.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from the_algorithm_tpu.pipeline.component import Candidate, CandidateSource


@dataclasses.dataclass
class PushTarget:
    """≡ target building output (``refresh_handler/`` + target predicates)."""

    user_id: int
    has_device: bool = True
    notifications_enabled: bool = True
    recent_notification_count: int = 0
    last_notification_ts: int = 0
    open_rate: float = 0.5


@dataclasses.dataclass(frozen=True)
class FatiguePolicy:
    """≡ the take-step fatigue rules: per-day budget + minimum spacing."""

    max_per_day: int = 4
    min_interval_s: int = 4 * 3600


def target_is_eligible(
    target: PushTarget, now: int, policy: FatiguePolicy
) -> bool:
    """Target predicates (device, settings, fatigue)."""
    if not (target.has_device and target.notifications_enabled):
        return False
    if target.recent_notification_count >= policy.max_per_day:
        return False
    if now - target.last_notification_ts < policy.min_interval_s:
        return False
    return True


@dataclasses.dataclass
class PushPipeline:
    """candidates → light rank (truncate) → heavy rank → take."""

    sources: Sequence[CandidateSource]
    light_predict: Callable[[np.ndarray], np.ndarray]  # [B, F] -> [B]
    heavy_predict: Callable[[np.ndarray], np.ndarray]  # [B, F] -> [B, H]
    featurize: Callable[[PushTarget, Candidate], np.ndarray]
    heavy_head_weights: np.ndarray  # [H] (e.g. open, fav heads)
    light_keep: int = 64  # light-ranker truncation before the heavy model
    policy: FatiguePolicy = FatiguePolicy()

    def run(self, target: PushTarget, now: int) -> Optional[Candidate]:
        """Returns the single notification to send, or None."""
        if not target_is_eligible(target, now, self.policy):
            return None
        candidates: List[Candidate] = []
        seen = set()
        for src in self.sources:
            try:
                for c in src.get(target, None):
                    if c.id not in seen:
                        seen.add(c.id)
                        candidates.append(c)
            except Exception:
                continue  # source fail-open
        if not candidates:
            return None

        feats = np.stack([self.featurize(target, c) for c in candidates])
        light = np.asarray(self.light_predict(feats)).reshape(-1)
        order = np.argsort(-light)[: self.light_keep]
        kept = [candidates[i] for i in order]
        kept_feats = feats[order]

        heavy = np.asarray(self.heavy_predict(kept_feats))  # [B, H]
        combined = heavy @ self.heavy_head_weights
        best = int(np.argmax(combined))
        winner = kept[best]
        winner.score = float(combined[best])
        winner.features["push_light_score"] = float(light[order][best])
        return winner
