"""Pushservice pipeline tests: targeting/fatigue, rank, take."""

import numpy as np
import pytest

from the_algorithm_tpu.mixers import pushservice as ps
from the_algorithm_tpu.pipeline.component import Candidate, CandidateSource


class StaticSource(CandidateSource):
    def __init__(self, ids):
        self.ids = ids

    def get(self, target, params):
        return [Candidate(id=i) for i in self.ids]


def featurize(target, candidate):
    # feature = [candidate id scaled, open rate]
    return np.array([candidate.id / 10.0, target.open_rate], np.float32)


def make_pipeline(**kw):
    defaults = dict(
        sources=[StaticSource([1, 5, 9])],
        light_predict=lambda f: f[:, 0],  # prefers high ids
        heavy_predict=lambda f: np.stack([f[:, 0], 1 - f[:, 0]], axis=1),
        featurize=featurize,
        heavy_head_weights=np.array([1.0, 0.0]),
        light_keep=2,
    )
    defaults.update(kw)
    return ps.PushPipeline(**defaults)


class TestTargeting:
    def test_eligibility(self):
        pol = ps.FatiguePolicy(max_per_day=2, min_interval_s=100)
        t = ps.PushTarget(user_id=1)
        assert ps.target_is_eligible(t, now=1000, policy=pol)
        assert not ps.target_is_eligible(
            ps.PushTarget(1, has_device=False), 1000, pol
        )
        assert not ps.target_is_eligible(
            ps.PushTarget(1, recent_notification_count=2), 1000, pol
        )
        assert not ps.target_is_eligible(
            ps.PushTarget(1, last_notification_ts=950), 1000, pol
        )


class TestPipeline:
    def test_picks_best_by_heavy_score(self):
        p = make_pipeline()
        out = p.run(ps.PushTarget(user_id=1), now=10**6)
        # light keeps ids {9, 5}; heavy head 0 = id/10 → 9 wins
        assert out.id == 9
        assert out.features["push_light_score"] == pytest.approx(0.9)

    def test_light_truncation_limits_heavy(self):
        heavy_calls = []

        def heavy(f):
            heavy_calls.append(f.shape[0])
            return np.stack([f[:, 0], f[:, 0]], axis=1)

        p = make_pipeline(heavy_predict=heavy)
        p.run(ps.PushTarget(user_id=1), now=10**6)
        assert heavy_calls == [2]  # only light_keep candidates scored

    def test_ineligible_target_returns_none(self):
        p = make_pipeline()
        assert p.run(ps.PushTarget(1, notifications_enabled=False), 10**6) is None

    def test_source_fail_open_and_empty(self):
        class Boom(CandidateSource):
            def get(self, target, params):
                raise RuntimeError("nope")

        p = make_pipeline(sources=[Boom()])
        assert p.run(ps.PushTarget(user_id=1), now=10**6) is None
        p2 = make_pipeline(sources=[Boom(), StaticSource([2])])
        assert p2.run(ps.PushTarget(user_id=1), now=10**6).id == 2
