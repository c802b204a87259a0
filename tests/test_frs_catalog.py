"""FRS catalog: SALSA walk vs numpy oracle, sims expansion, source fleet,
predicate library, display-location flows (≡ follow-recommendations-service
candidate_sources/ + predicates/ + flows/)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from the_algorithm_tpu.graph import graphjet, realgraph
from the_algorithm_tpu.mixers import frs_catalog as fc
from the_algorithm_tpu.ops.sparse import PAD_ID
from the_algorithm_tpu.pipeline.component import Candidate


P = int(PAD_ID)


def pad_rows(rows, width):
    out = np.full((len(rows), width), P, np.int32)
    for i, r in enumerate(rows):
        out[i, : len(r)] = r
    return jnp.asarray(out)


class TestSalsa:
    def test_matches_numpy_oracle(self):
        # users 0..3 follow producers; producers have followers
        follow = [[10, 11], [10, 12], [11], [12, 13]]
        follower = {10: [0, 1], 11: [0, 2], 12: [1, 3], 13: [3]}
        U, Pn = 4, 14
        follow_adj = pad_rows(follow, 4)
        fol_rows = [follower.get(p, []) for p in range(Pn)]
        follower_adj = pad_rows(fol_rows, 4)

        seeds = jnp.asarray([10, 11, P, P], jnp.int32)
        ids, scores = fc.salsa_candidates(follow_adj, follower_adj, seeds, 8)

        # numpy oracle: seed -> followers (1/deg) -> their follows (1/deg)
        mass = {}
        for s in [10, 11]:
            fols = follower[s]
            for u in fols:
                w1 = 1.0 / len(fols)
                fws = follow[u]
                for p2 in fws:
                    mass[p2] = mass.get(p2, 0.0) + w1 / len(fws)
        want = sorted(mass.items(), key=lambda kv: -kv[1])
        got = [(int(i), float(s)) for i, s in zip(np.asarray(ids),
                                                  np.asarray(scores))
               if int(i) != P]
        assert [g[0] for g in got[: len(want)]] == [w[0] for w in want] or \
            sorted(g[0] for g in got) == sorted(w[0] for w in want)
        got_d = dict(got)
        for p2, m in want:
            np.testing.assert_allclose(got_d[p2], m, rtol=1e-5)


class TestSimsExpansion:
    def test_second_hop_decayed(self):
        # producer 0 similar to 1 (0.8); 1 similar to 2 (0.5)
        ids = pad_rows([[1], [2], []], 2)
        w = jnp.asarray(np.asarray([[0.8, 0], [0.5, 0], [0, 0]], np.float32))
        out_ids, out_s = fc.sims_expansion_candidates(
            ids, w, jnp.asarray([0, P], jnp.int32), 4, second_hop_decay=0.5
        )
        d = {int(i): float(s) for i, s in zip(np.asarray(out_ids),
                                              np.asarray(out_s)) if int(i) != P}
        np.testing.assert_allclose(d[1], 0.8, rtol=1e-6)
        np.testing.assert_allclose(d[2], 0.5 * 0.8 * 0.5, rtol=1e-6)


@dataclasses.dataclass
class Request:
    user_id: int = 0
    followed_set: frozenset = frozenset({10, 11})
    blocked_set: frozenset = frozenset()
    excluded_ids: frozenset = frozenset()
    recent_engagement_ids: tuple = ()
    geo_id: int = None
    profile_user_id: int = None
    locale: str = None
    now: int = 1000


class TestSources:
    def test_recent_engagement_counts_authors(self):
        src = fc.RecentEngagementSource(lambda ids: ids % 5)
        out = src.get(Request(recent_engagement_ids=(6, 11, 16, 7)), None)
        assert out[0].id == 1 and out[0].score == 3.0  # 6,11,16 -> author 1

    def test_realgraph_source(self):
        table = realgraph.init_table(4, 4)
        table = realgraph.apply_interactions(
            table, jnp.asarray([0, 0], jnp.int32), jnp.asarray([7, 9], jnp.int32),
            jnp.asarray([0, 0], jnp.int32), jnp.asarray([900, 950], jnp.int32),
        )
        params = {"w": jnp.ones(len(realgraph.INTERACTION_TYPES)),
                  "b": jnp.float32(0.0)}
        out = fc.RealGraphSource(table, params, k=4).get(Request(), None)
        assert {c.id for c in out} == {7, 9}

    def test_pop_geo_fallback(self):
        src = fc.PopGeoSource(
            np.asarray([[1, 2]]), np.asarray([[1.0, 0.5]]),
            np.asarray([3, 4]), np.asarray([1.0, 0.5]),
        )
        geo = src.get(Request(geo_id=0), None)
        glob = src.get(Request(), None)
        assert [c.id for c in geo] == [1, 2]
        assert [c.id for c in glob] == [3, 4]
        assert glob[0].source == "TopOrganicFollows"

    def test_stp_requires_profile(self):
        src = fc.StpSource(np.asarray([[5]]), np.asarray([[0.9]]))
        assert src.get(Request(), None) == []
        out = src.get(Request(profile_user_id=0), None)
        assert out[0].id == 5 and out[0].source == "STP"

    def test_address_book_forward_and_reverse(self):
        src = fc.AddressBookSource(
            forward={0: [20, 21]}, reverse={0: [21, 22]})
        out = src.get(Request(user_id=0), None)
        by = {c.id: c.score for c in out}
        assert by[21] == 1.5  # both legs
        assert by[20] == 1.0 and by[22] == 0.5
        assert out[0].id == 21

    def test_crowd_search_locale_fallback(self):
        src = fc.CrowdSearchAccountsSource({
            "global": (np.asarray([7]), np.asarray([1.0])),
            "ja": (np.asarray([8]), np.asarray([2.0])),
        })
        assert [c.id for c in src.get(Request(locale="ja"), None)] == [8]
        assert [c.id for c in src.get(Request(locale="xx"), None)] == [7]
        assert [c.id for c in src.get(Request(), None)] == [7]

    def test_promoted_accounts_flagged_and_bid_ordered(self):
        src = fc.PromotedAccountsSource(
            np.asarray([30, 31]), np.asarray([0.1, 0.9]))
        out = src.get(Request(), None)
        assert [c.id for c in out] == [31, 30]
        assert all(c.features["is_promoted"] == 1.0 for c in out)

    def test_socialgraph_friends_of_friends(self):
        follows = {10: [40, 41], 11: [41, 0]}  # 0 = the viewer (excluded)
        src = fc.SocialgraphSource(lambda u: follows.get(u, []))
        out = src.get(Request(user_id=0, followed_set=frozenset({10, 11})),
                      None)
        by = {c.id: c.score for c in out}
        assert by[41] == 2.0 and by[40] == 1.0  # mutual proof ordering
        assert 0 not in by and 10 not in by

    def test_two_hop_random_walk_rows(self):
        src = fc.TwoHopRandomWalkSource(
            np.asarray([[50, 51]]), np.asarray([[0.9, 0.1]]))
        out = src.get(Request(user_id=0), None)
        assert [c.id for c in out] == [50, 51]

    def test_catalog_breadth(self):
        """≥12 distinct candidate-source kinds in the catalog (the
        reference's candidate_sources/ families)."""
        source_kinds = [
            n for n in dir(fc)
            if n.endswith("Source") and isinstance(getattr(fc, n), type)
        ] + ["salsa_candidates", "sims_expansion_candidates"]
        assert len(set(source_kinds)) >= 12, source_kinds
        # every flow's source names resolve to a known kind
        all_names = {n for names in fc.FlowCatalog.FLOW_SOURCES.values()
                     for n in names}
        assert len(all_names) >= 12, all_names

    def test_ppmi_locale(self):
        src = fc.PpmiLocaleSource(
            {"en": (np.asarray([8]), np.asarray([0.7]))}
        )
        assert src.get(Request(), None) == []
        assert src.get(Request(locale="en"), None)[0].id == 8

    def test_uug_source(self):
        g = graphjet.init_user_user(16, width=4)
        arr = np.asarray(g.user_ids).copy()
        arr[10, :2] = [5, 6]
        arr[11, 0] = 5
        g = g._replace(user_ids=jnp.asarray(arr))
        out = fc.UserUserGraphSource(g).get(Request(), None)
        ids = {c.id for c in out}
        assert 5 in ids and out[0].id == 5  # 2 seeds engaged user 5


class TestPredicates:
    def test_inactive(self):
        pred = fc.inactive_predicate(np.asarray([0, 990]), max_inactive_s=100)
        assert not pred(Request(now=1000), Candidate(id=0))
        assert pred(Request(now=1000), Candidate(id=1))

    def test_previously_recommended_and_dismiss(self):
        store = fc.PreviouslyRecommendedStore()
        store.record_shown(0, [5])
        store.record_dismiss(0, 6)
        pred = store.predicate()
        assert not pred(Request(), Candidate(id=5))
        assert not pred(Request(), Candidate(id=6))
        assert pred(Request(), Candidate(id=7))

    def test_health_and_excluded(self):
        assert not fc.health_predicate({3})(Request(), Candidate(id=3))
        assert not fc.excluded_ids_predicate()(
            Request(excluded_ids=frozenset({4})), Candidate(id=4)
        )


class TestRankerAndInterleave:
    def test_ml_ranker_sets_scores(self):
        rank = fc.ml_ranker(
            lambda r, cs: np.asarray([[c.id] for c in cs], np.float32),
            lambda f: 1.0 / (1.0 + np.exp(-f[:, 0] / 10.0)),
        )
        cs = [Candidate(id=1), Candidate(id=9)]
        rank(Request(), cs)
        assert cs[1].score > cs[0].score
        assert "p_follow" in cs[0].features

    def test_interleave_promoted(self):
        organic = [Candidate(id=i) for i in range(12)]
        promoted = [Candidate(id=100), Candidate(id=101), Candidate(id=102)]
        out = fc.interleave_promoted(organic, promoted, every=4)
        ids = [c.id for c in out]
        # one promoted slot after every 4 organic; extras are dropped
        assert ids.index(100) == 4 and ids.index(101) == 9
        assert 102 not in ids
        assert out[4].features["promoted"] is True


class TestFlows:
    def test_display_location_wiring(self):
        calls = []

        def src(name):
            def fn(request):
                calls.append(name)
                return [Candidate(id=hash(name) % 1000, score=1.0)]
            return fn

        catalog = fc.FlowCatalog(
            sources_by_name={n: src(n) for n in
                             ("sims", "triangular", "stp", "pop_geo",
                              "salsa", "recent_engagement", "real_graph",
                              "user_user_graph", "sims_expansion",
                              "ppmi_locale")},
            predicates=[fc.excluded_ids_predicate()],
        )
        flow = catalog.flow(fc.DisplayLocation.PROFILE_SIDEBAR)
        out = flow.run(Request(profile_user_id=1))
        assert set(calls) == {"stp", "sims", "triangular"}
        assert len(out) <= 10

    def test_home_flow_runs_all_home_sources(self):
        catalog = fc.FlowCatalog(
            sources_by_name={
                n: (lambda r: [Candidate(id=abs(hash(n)) % 997, score=1.0)])
                for n in fc.FlowCatalog.FLOW_SOURCES[
                    fc.DisplayLocation.HOME_TIMELINE]
            },
            predicates=[],
        )
        flow = catalog.flow(fc.DisplayLocation.HOME_TIMELINE)
        assert len(flow.sources) == len(
            fc.FlowCatalog.FLOW_SOURCES[fc.DisplayLocation.HOME_TIMELINE])
        assert len(flow.sources) >= 9  # r5 breadth: +socialgraph, +2-hop
