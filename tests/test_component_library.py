"""Stock component library (≡ product-mixer/component-library
gate/filter/selector catalog): each component's semantics + a composed
pipeline run."""

import dataclasses

import pytest

from the_algorithm_tpu.core.config import Param, Params
from the_algorithm_tpu.pipeline import component_library as cl
from the_algorithm_tpu.pipeline.component import Candidate


@dataclasses.dataclass
class Q:
    user_id: int = 1
    country_code: str = "US"
    cursor: object = None
    excluded_ids: tuple = ()
    languages: tuple = ()
    now: int = 0
    features: dict = dataclasses.field(default_factory=dict)


def cands(*specs):
    return [Candidate(id=i, features=dict(f)) for i, f in specs]


class TestGates:
    def test_defined_user_id(self):
        assert cl.DefinedUserIdGate().should_continue(Q(), Params())
        assert not cl.DefinedUserIdGate().should_continue(
            Q(user_id=None), Params())

    def test_country_and_first_page(self):
        assert not cl.DefinedCountryCodeGate().should_continue(
            Q(country_code=None), Params())
        assert cl.FirstPageGate().should_continue(Q(), Params())
        assert not cl.FirstPageGate().should_continue(
            Q(cursor="abc"), Params())

    def test_feature_and_param_gates(self):
        q = Q(features={"eligible": True})
        assert cl.FeatureGate("eligible").should_continue(q, Params())
        assert not cl.FeatureGate("other").should_continue(q, Params())
        p = Param("enable_x", True)
        assert cl.ParamGate(p).should_continue(q, Params())
        assert not cl.ParamGate(p).should_continue(q, Params({p: False}))

    def test_quality_factor_gate(self):
        q = Q(features={"quality_factor": 0.3})
        assert not cl.QualityFactorGate(0.5).should_continue(q, Params())
        assert cl.QualityFactorGate(0.2).should_continue(q, Params())


class TestFilters:
    def test_excluded_ids(self):
        r = cl.ExcludedIdsFilter().apply(
            Q(excluded_ids=(2,)), cands((1, {}), (2, {})), Params())
        assert [c.id for c in r.kept] == [1]

    def test_feature_filters(self):
        cs = cands((1, {"is_nsfw": True}), (2, {}))
        r = cl.FeatureFilter("is_nsfw", keep_if=False).apply(Q(), cs, Params())
        assert [c.id for c in r.kept] == [2]
        r2 = cl.FeatureValueConditionalFilter(
            "score", lambda v: v > 0.5).apply(
            Q(), cands((1, {"score": 0.9}), (2, {"score": 0.1}), (3, {})),
            Params())
        assert [c.id for c in r2.kept] == [1]

    def test_param_gated_filter(self):
        p = Param("enable_f", False)
        inner = cl.HasAuthorIdFeatureFilter()
        cs = cands((1, {}), (2, {"author_id": 9}))
        off = cl.ParamGatedFilter(p, inner).apply(Q(), cs, Params())
        assert len(off.kept) == 2  # param off → pass-through
        on = cl.ParamGatedFilter(p, inner).apply(
            Q(), cs, Params({p: True}))
        assert [c.id for c in on.kept] == [2]

    def test_snowflake_age(self):
        now_s = (cl.SNOWFLAKE_EPOCH_MS + 10_000_000) // 1000
        fresh = ((10_000_000 - 1000) << 22)  # created 1s before now
        stale = ((10_000_000 - 7_200_000) << 22)  # 2h old
        r = cl.SnowflakeIdAgeFilter(3600_000).apply(
            Q(now=now_s), [Candidate(id=fresh), Candidate(id=stale)],
            Params())
        assert [c.id for c in r.kept] == [fresh]

    def test_self_reply_language(self):
        cs = cands((1, {"author_id": 1}), (2, {"author_id": 9}))
        r = cl.TweetAuthorIsSelfFilter().apply(Q(user_id=1), cs, Params())
        assert [c.id for c in r.kept] == [2]
        cs = cands((1, {"is_reply": True}), (2, {}))
        assert [c.id for c in cl.TweetIsNotReplyFilter().apply(
            Q(), cs, Params()).kept] == [2]
        cs = cands((1, {"language": "ja"}), (2, {"language": "en"}), (3, {}))
        r = cl.TweetLanguageFilter().apply(
            Q(languages=("en",)), cs, Params())
        assert [c.id for c in r.kept] == [2, 3]

    def test_takedown_country(self):
        from the_algorithm_tpu.storage.tweetypie import TakedownStore

        td = TakedownStore()
        td.withhold(1, ["US"])
        r = cl.TweetAuthorCountryFilter(td).apply(
            Q(country_code="US"), cands((1, {}), (2, {})), Params())
        assert [c.id for c in r.kept] == [2]

    def test_bloom_dedup(self):
        from the_algorithm_tpu.mixers.feature_hydrators import BloomFilter

        bf = BloomFilter()
        bf.add(7)
        r = cl.BloomFilterDedupFilter({1: bf}).apply(
            Q(user_id=1), cands((7, {}), (8, {})), Params())
        assert [c.id for c in r.kept] == [8]


class TestSelectors:
    def test_dedup_by_key(self):
        cs = [Candidate(id=1, features={"author_id": 5}),
              Candidate(id=2, features={"author_id": 5})]
        out = cl.DropDuplicateCandidates(
            key_fn=lambda c: c.features["author_id"]).select(Q(), cs, Params())
        assert [c.id for c in out] == [1]

    def test_drop_max_by_param(self):
        p = Param("max_results", 2)
        out = cl.DropMaxCandidates(param=p).select(
            Q(), cands((1, {}), (2, {}), (3, {})), Params())
        assert len(out) == 2

    def test_too_few_all_or_nothing(self):
        s = cl.DropTooFewResults(3)
        assert s.select(Q(), cands((1, {}), (2, {})), Params()) == []
        assert len(s.select(Q(), cands((1, {}), (2, {}), (3, {})),
                            Params())) == 3

    def test_insert_append_and_sort(self):
        out = cl.InsertAppendResults(
            lambda q: [Candidate(id=99, score=0.1)]).select(
            Q(), [Candidate(id=1, score=0.9)], Params())
        assert [c.id for c in out] == [1, 99]
        srt = cl.SortCandidates().select(Q(), out, Params())
        assert [c.id for c in srt] == [1, 99]

    def test_orthogonal_drop(self):
        other = [Candidate(id=1)]
        out = cl.DropOrthogonalCandidates(lambda q: other).select(
            Q(), cands((1, {}), (2, {})), Params())
        assert [c.id for c in out] == [2]


class TestComposedPipeline:
    def test_stock_components_in_engine(self):
        from the_algorithm_tpu.pipeline.component import (
            CandidatePipeline, CandidateSource,
        )
        from the_algorithm_tpu.pipeline.recommendation import (
            RecommendationPipeline,
        )

        class Src(CandidateSource):
            def get(self, query, params):
                return cands(
                    (1, {"author_id": 1}),  # self
                    (2, {"author_id": 9}),
                    (3, {"author_id": 9, "is_reply": True}),
                    (4, {"author_id": 8}),
                )

        pipe = RecommendationPipeline(
            gates=[cl.DefinedUserIdGate()],
            candidate_pipelines=[CandidatePipeline(Src())],
            global_filters=[cl.TweetAuthorIsSelfFilter(),
                            cl.TweetIsNotReplyFilter()],
            result_selectors=[cl.DropDuplicateCandidates(),
                              cl.DropMaxCandidates(max_candidates=1)],
        )
        out = pipe.run(Q(user_id=1))
        assert [c.id for c in out.candidates] == [2]
