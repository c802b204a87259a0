"""Pipeline engine tests: step order, fail-open, dedup, quality factor."""

import pytest

from the_algorithm_tpu.core.config import Param, Params
from the_algorithm_tpu.core.metrics import StatsReceiver
from the_algorithm_tpu.pipeline import (
    Candidate,
    CandidatePipeline,
    CandidateSource,
    FeatureHydrator,
    Filter,
    FilterResult,
    Gate,
    QualityFactorConfig,
    RecommendationPipeline,
    Scorer,
    Selector,
    SideEffect,
)
from the_algorithm_tpu.pipeline.component import (
    DedupSelector,
    LambdaGate,
    PredicateFilter,
    TopKScoreSelector,
)


class StaticSource(CandidateSource):
    def __init__(self, ids, name="StaticSource"):
        self.ids = ids
        self._name = name

    @property
    def name(self):
        return self._name

    def get(self, query, params):
        return [Candidate(id=i) for i in self.ids]


class FailingSource(CandidateSource):
    def get(self, query, params):
        raise RuntimeError("backend down")


class AgeHydrator(FeatureHydrator):
    def hydrate(self, query, candidates, params):
        for c in candidates:
            c.features["age"] = c.id * 10


class IdScorer(Scorer):
    def score(self, query, candidates, params):
        for c in candidates:
            c.score = float(c.id)


class RecordingSideEffect(SideEffect):
    def __init__(self):
        self.seen = None

    def run(self, query, result, params):
        self.seen = [c.id for c in result]


def make_pipeline(**kwargs):
    defaults = dict(
        candidate_pipelines=[
            CandidatePipeline(StaticSource([1, 2, 3], "A")),
            CandidatePipeline(StaticSource([3, 4], "B")),
        ],
        post_candidate_selectors=[DedupSelector()],
        post_candidate_hydrators=[AgeHydrator()],
        scorers=[IdScorer()],
        result_selectors=[TopKScoreSelector(3)],
    )
    defaults.update(kwargs)
    return RecommendationPipeline(**defaults)


class TestPipeline:
    def test_end_to_end_order_and_dedup(self):
        se = RecordingSideEffect()
        p = make_pipeline(side_effects=[se])
        out = p.run(object())
        ids = [c.id for c in out.candidates]
        assert ids == [4, 3, 2]  # deduped, scored by id, top-3 desc
        assert out.candidates[0].features["age"] == 40
        assert se.seen == ids
        assert {c.source for c in out.candidates} == {"A", "B"}

    def test_gate_stops_pipeline(self):
        p = make_pipeline(gates=[LambdaGate(lambda q, pr: False, "Closed")])
        out = p.run(object())
        assert out.gated and out.candidates == []

    def test_fail_open_source(self):
        p = make_pipeline(
            candidate_pipelines=[
                CandidatePipeline(FailingSource()),
                CandidatePipeline(StaticSource([7], "OK")),
            ]
        )
        out = p.run(object())
        assert [c.id for c in out.candidates] == [7]
        assert "FailingSource" in out.failures

    def test_fail_closed_source_raises(self):
        p = make_pipeline(
            candidate_pipelines=[
                CandidatePipeline(FailingSource(), fail_open=False)
            ]
        )
        with pytest.raises(RuntimeError):
            p.run(object())

    def test_global_filter_counts_removed(self):
        p = make_pipeline(
            global_filters=[
                PredicateFilter(lambda q, c, pr: c.id % 2 == 0, "EvenOnly")
            ]
        )
        out = p.run(object())
        assert all(c.id % 2 == 0 for c in out.candidates)
        assert out.removed["EvenOnly"] == 2  # ids 1, 3

    def test_quality_factor_shrinks_scoring(self):
        qf = QualityFactorConfig(target_latency_ms=0.0, min_quality_factor=0.4)
        qf.quality_factor = 0.5
        p = make_pipeline(quality_factor=qf, result_selectors=[])
        out = p.run(object())
        scored = [c for c in out.candidates if c.score is not None]
        assert len(scored) == 2  # 4 unique candidates × 0.5
        # latency above target (0ms) → qf decays
        assert qf.quality_factor < 0.5

    def test_stats_recorded(self):
        stats = StatsReceiver()
        p = make_pipeline(stats=stats)
        p.run(object())
        counters = stats.counters()
        assert counters["candidate_pipeline/A/candidates"] == 3
        assert counters["candidate_pipeline/B/candidates"] == 2

    def test_scorer_fail_open(self):
        class BoomScorer(Scorer):
            def score(self, query, candidates, params):
                raise ValueError("model gone")

        p = make_pipeline(
            scorers=[BoomScorer()], scorer_fail_open=True, result_selectors=[]
        )
        out = p.run(object())  # backup path: candidates unscored
        assert len(out.candidates) == 4
        assert "scoring" in out.failures
