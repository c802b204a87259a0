"""Pushservice depth: adaptor catalog, CRT fatigue over NTab history,
health-model gating, dedup, quiet hours — ≡ pushservice/{adaptor,predicate,
store,take}/."""

import dataclasses

import numpy as np

from the_algorithm_tpu.mixers import push_candidates as pc
from the_algorithm_tpu.mixers import pushservice as ps
from the_algorithm_tpu.pipeline.component import Candidate, CandidateSource


class StaticSource(CandidateSource):
    def __init__(self, cands):
        self._c = cands

    def get(self, target, params):
        return [Candidate(id=c.id, features=dict(c.features)) for c in self._c]


def cands(*specs):
    return [Candidate(id=i, features=dict(f)) for i, f in specs]


class TestAdaptors:
    def test_generator_skips_missing_stores(self):
        adaptors = pc.build_push_adaptors(
            earlybird_source=StaticSource(cands((1, {}))),
            trends_source=StaticSource(cands((2, {}))),
        )
        assert [a.name for a in adaptors] == [
            "EarlybirdFirstDegree", "TrendsCandidates"
        ]

    def test_adaptor_stamps_crt_and_source(self):
        a = pc.AdaptorSource(
            StaticSource(cands((5, {}))), pc.CRT.TREND_TWEET, "Trends"
        )
        out = a.get(ps.PushTarget(user_id=1), None)
        assert out[0].features["crt"] == pc.CRT.TREND_TWEET
        assert out[0].source == "Trends"


class TestNTabFatigue:
    def setup_method(self):
        self.ntab = pc.NTabStore()
        self.cfg = pc.PushFatigueConfig()

    def test_type_budget(self):
        now = 100_000
        # OON budget is 1/day
        self.ntab.record_sent(1, pc.SentNotification(9, pc.CRT.OON_TWEET,
                                                     now - 3600 * 30))
        assert pc.crt_allowed(self.ntab, 1, pc.CRT.OON_TWEET, now, self.cfg)
        self.ntab.record_sent(1, pc.SentNotification(10, pc.CRT.OON_TWEET,
                                                     now - 3600 * 5))
        assert not pc.crt_allowed(self.ntab, 1, pc.CRT.OON_TWEET, now, self.cfg)
        # another type with global budget left is still allowed
        assert pc.crt_allowed(self.ntab, 1, pc.CRT.IN_NETWORK_TWEET, now,
                              self.cfg)

    def test_global_budget(self):
        now = 100_000
        for i in range(4):
            self.ntab.record_sent(
                1, pc.SentNotification(i, pc.CRT.IN_NETWORK_TWEET,
                                       now - 3600 * (i + 5)))
        assert not pc.crt_allowed(self.ntab, 1, pc.CRT.TREND_TWEET, now,
                                  self.cfg)

    def test_min_interval(self):
        now = 100_000
        self.ntab.record_sent(
            1, pc.SentNotification(9, pc.CRT.IN_NETWORK_TWEET, now - 3000))
        assert not pc.crt_allowed(self.ntab, 1, pc.CRT.IN_NETWORK_TWEET, now,
                                  self.cfg)  # global 4h spacing

    def test_caret_suppression(self):
        now = 10 * 86400
        self.ntab.record_sent(
            1, pc.SentNotification(9, pc.CRT.TREND_TWEET, now - 3 * 86400))
        self.ntab.record_feedback(1, 9, caret=True)
        assert not pc.crt_allowed(self.ntab, 1, pc.CRT.TREND_TWEET, now,
                                  self.cfg)
        # 7-day suppression expires
        assert pc.crt_allowed(self.ntab, 1, pc.CRT.TREND_TWEET,
                              now + 5 * 86400, self.cfg)


class TestPredicates:
    def test_quiet_hours(self):
        pred = pc.quiet_hours_predicate(22, 8)
        t = ps.PushTarget(user_id=1)
        noon = 12 * 3600
        night = 23 * 3600
        assert pred(t, noon)
        assert not pred(t, night)
        assert not pred(t, 3 * 3600)  # wrap-around side

    def test_health_gate(self):
        def scores(ids):
            return {"nsfw": np.asarray([0.9 if i == 2 else 0.0 for i in ids]),
                    "toxicity": np.zeros(len(ids))}

        bpred = pc.health_model_predicate(scores)
        cs = cands((1, {}), (2, {}), (3, {}))
        assert bpred(None, cs) == [True, False, True]

    def test_dedup_against_ntab(self):
        ntab = pc.NTabStore()
        ntab.record_sent(1, pc.SentNotification(7, pc.CRT.OON_TWEET, 10))
        pred = pc.not_already_sent(ntab)
        t = ps.PushTarget(user_id=1)
        assert not pred(t, Candidate(id=7))
        assert pred(t, Candidate(id=8))

    def test_oon_social_proof(self):
        pred = pc.min_social_proof_for_oon(1.0)
        t = ps.PushTarget(user_id=1)
        oon = Candidate(id=1, features={"crt": pc.CRT.OON_TWEET,
                                        "social_proof": 0.0})
        inn = Candidate(id=2, features={"crt": pc.CRT.IN_NETWORK_TWEET})
        assert not pred(t, oon)
        assert pred(t, inn)

    def test_engagement_ratio(self):
        pred = pc.tweet_engagement_ratio_predicate(0.5)
        t = ps.PushTarget(user_id=1)
        baity = Candidate(id=1, features={"fav_count": 5, "reply_count": 100})
        fine = Candidate(id=2, features={"fav_count": 80, "reply_count": 100})
        small = Candidate(id=3, features={"fav_count": 0, "reply_count": 5})
        assert not pred(t, baity)
        assert pred(t, fine)
        assert pred(t, small)  # below the reply floor


def _pipeline(sources, ntab=None, **kw):
    return ps.PushPipeline(
        sources=sources,
        light_predict=lambda f: f[:, 0],
        heavy_predict=lambda f: np.stack([f[:, 0], f[:, 0]], axis=1),
        featurize=lambda t, c: np.asarray(
            [float(c.features.get("retrieval_score", c.id))], np.float32
        ),
        heavy_head_weights=np.asarray([1.0, 0.5]),
        ntab=ntab,
        fatigue_config=pc.PushFatigueConfig() if ntab is not None else None,
        **kw,
    )


class TestEndToEnd:
    def test_take_writes_ntab_and_type_fatigue_kicks_in(self):
        ntab = pc.NTabStore()
        src = pc.AdaptorSource(
            StaticSource(cands((10, {"retrieval_score": 5.0}),
                               (11, {"retrieval_score": 3.0}))),
            pc.CRT.OON_TWEET, "ContentRecommenderMixer",
        )
        p = _pipeline([src], ntab=ntab)
        p = dataclasses.replace(
            p, candidate_predicates=[pc.not_already_sent(ntab)]
        )
        now = 10**6
        first = p.run(ps.PushTarget(user_id=1), now=now)
        assert first.id == 10
        assert ntab.sent_tweet_ids(1) == frozenset({10})
        # next refresh a day later: OON budget (1/day) blocks the whole type
        second = p.run(ps.PushTarget(user_id=1), now=now + 3600 * 12)
        assert second is None

    def test_health_predicate_blocks_winner(self):
        def scores(ids):
            return {"toxicity": np.asarray([0.9 if i == 10 else 0.0
                                            for i in ids])}

        src = pc.AdaptorSource(
            StaticSource(cands((10, {"retrieval_score": 5.0}),
                               (11, {"retrieval_score": 3.0}))),
            pc.CRT.IN_NETWORK_TWEET, "Earlybird",
        )
        p = _pipeline([src])
        p = dataclasses.replace(
            p,
            batch_candidate_predicates=[pc.health_model_predicate(scores)],
        )
        out = p.run(ps.PushTarget(user_id=1), now=10**6)
        assert out.id == 11  # toxic higher-scored candidate was dropped

    def test_quiet_hours_blocks_run(self):
        src = pc.AdaptorSource(
            StaticSource(cands((10, {}))), pc.CRT.IN_NETWORK_TWEET, "EB"
        )
        p = _pipeline([src])
        p = dataclasses.replace(
            p, target_predicates=[pc.quiet_hours_predicate(22, 8)]
        )
        assert p.run(ps.PushTarget(user_id=1), now=23 * 3600) is None
        assert p.run(ps.PushTarget(user_id=1), now=12 * 3600) is not None
