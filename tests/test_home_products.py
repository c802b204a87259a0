"""Home-mixer chron products: Following / Subscribed / ListTweets mixer
pipelines — module insertion, ads spacing, instructions, cursors, registry."""

import jax.numpy as jnp
import numpy as np

from the_algorithm_tpu.pipeline.component import Candidate
from the_algorithm_tpu.pipeline.mixer import (
    DropMaxModuleItemCandidates,
    DropModuleTooFewItems,
    EntryKind,
    InsertAdResults,
    InsertFixedPositionModule,
    MixerPipeline,
    Module,
    TimelineEntry,
)
from the_algorithm_tpu.mixers import home_products as hp
from the_algorithm_tpu.mixers.follow_recommendations import RecommendationFlow
from the_algorithm_tpu.search import earlybird as eb
from the_algorithm_tpu.storage.tweetypie import EditChainStore


def make_index():
    cfg = eb.EarlybirdConfig(capacity=32, max_tokens=4)
    index = eb.init_index(cfg)
    n = 8
    toks = jnp.asarray(
        np.stack([eb.tokenize(f"tweet number {i}", 4) for i in range(n)])
    )
    authors = jnp.asarray([10, 11, 12, 13, 10, 11, 99, 10], jnp.int32)
    ts = jnp.asarray(np.arange(100, 100 + n * 10, 10), jnp.int32)
    feats = jnp.zeros((n, len(eb.DOC_FEATURES)), jnp.float32)
    ids = jnp.asarray(np.arange(2001, 2001 + n), jnp.int32)
    return eb.ingest(index, toks, authors, ts, feats, ids)


class TestFollowing:
    def test_reverse_chron_in_network_only(self):
        index = make_index()
        pipe = hp.build_following_pipeline(index=index)
        q = hp.TimelineQuery(user_id=10, followed_authors=[11, 12], max_results=10)
        tl = pipe.run(q)
        ids = tl.tweet_ids()
        # author 13 and 99 excluded; self (10) included
        assert ids == sorted(ids, reverse=True)
        assert set(ids) == {2001, 2002, 2003, 2005, 2006, 2008}
        assert tl.top_cursor == max(ids) and tl.bottom_cursor == min(ids)

    def test_cursor_window(self):
        index = make_index()
        pipe = hp.build_following_pipeline(index=index)
        q = hp.TimelineQuery(user_id=10, followed_authors=[11, 12],
                             max_id=2006, max_results=10)
        ids = pipe.run(q).tweet_ids()
        assert all(i < 2006 for i in ids)
        q2 = hp.TimelineQuery(user_id=10, followed_authors=[11, 12],
                              since_id=2005, max_results=10)
        ids2 = pipe.run(q2).tweet_ids()
        assert all(i > 2005 for i in ids2)

    def test_newest_win_when_matches_exceed_fetch_window(self):
        # many more in-network tweets than max_results: the recency-ranked
        # fetch + id-window pushdown must return the NEWEST page, never an
        # engagement-ranked subset that drops fresh tweets
        cfg = eb.EarlybirdConfig(capacity=64, max_tokens=4)
        index = eb.init_index(cfg)
        n = 40
        toks = jnp.asarray(
            np.stack([eb.tokenize(f"tweet number {i}", 4) for i in range(n)]))
        authors = jnp.full((n,), 11, jnp.int32)
        ts = jnp.asarray(np.arange(100, 100 + n * 10, 10), jnp.int32)
        feats = np.zeros((n, len(eb.DOC_FEATURES)), np.float32)
        # give OLD tweets huge engagement counts — a relevance-ranked fetch
        # would surface these instead of the newest
        feats[: n // 2, eb.DOC_FEATURE_INDEX["fav_count"]] = 1e6
        index = eb.ingest(index, toks, authors, ts,
                          jnp.asarray(feats),
                          jnp.asarray(np.arange(2001, 2001 + n), jnp.int32))
        pipe = hp.build_following_pipeline(index=index)
        q = hp.TimelineQuery(user_id=10, followed_authors=[11], max_results=5)
        ids = pipe.run(q).tweet_ids()
        assert ids == [2040, 2039, 2038, 2037, 2036]
        # a bottom-cursor page is complete and contiguous, not starved by
        # the dropped newest tweets
        q2 = hp.TimelineQuery(user_id=10, followed_authors=[11],
                              max_id=2036, max_results=5)
        ids2 = pipe.run(q2).tweet_ids()
        assert ids2 == [2035, 2034, 2033, 2032, 2031]

    def test_wtf_module_at_fixed_position(self):
        index = make_index()
        flow = RecommendationFlow(
            sources=[lambda req: [Candidate(id=900 + i, score=1.0 - i * 0.1)
                                  for i in range(4)]],
            predicates=[],
        )
        pipe = hp.build_following_pipeline(index=index, wtf_flow=flow,
                                           wtf_position=2)
        q = hp.TimelineQuery(user_id=10, followed_authors=[11, 12],
                             max_results=10)
        tl = pipe.run(q)
        assert tl.entries[2].kind == EntryKind.MODULE
        assert tl.entries[2].module.kind == "who_to_follow"
        assert len(tl.entries[2].module.items) == 4

    def test_ads_spacing(self):
        index = make_index()
        ads = [Candidate(id=7001), Candidate(id=7002)]
        pipe = hp.build_following_pipeline(index=index, ads=ads, ad_spacing=2)
        q = hp.TimelineQuery(user_id=10, followed_authors=[11, 12],
                             max_results=12)
        tl = pipe.run(q)
        ad_pos = [i for i, e in enumerate(tl.entries) if e.kind == EntryKind.AD]
        assert len(ad_pos) == 2
        assert ad_pos[1] - ad_pos[0] >= 3  # min_spacing organic between ads

    def test_edited_tweets_replace_instruction(self):
        index = make_index()
        chains = EditChainStore()
        chains.record_edit(2003, 9003)
        pipe = hp.build_following_pipeline(index=index, edit_chains=chains)
        q = hp.TimelineQuery(user_id=10, followed_authors=[11, 12],
                             served_tweet_ids=[2003, 2005], max_results=10)
        tl = pipe.run(q)
        repl = [i for i in tl.instructions if i.op == "replace_entry"]
        assert len(repl) == 1
        assert repl[0].payload == {"entry_id": 2003, "with": 9003}

    def test_new_tweets_pill(self):
        index = make_index()
        pipe = hp.build_following_pipeline(index=index)
        q = hp.TimelineQuery(user_id=10, followed_authors=[11, 12],
                             last_polling_ts=140, max_results=10)
        tl = pipe.run(q)
        alerts = [i for i in tl.instructions if i.op == "show_alert"]
        assert len(alerts) == 1 and alerts[0].payload["count"] >= 1
        # nothing newer → no pill
        q2 = hp.TimelineQuery(user_id=10, followed_authors=[11, 12],
                              last_polling_ts=10**9, max_results=10)
        assert not pipe.run(q2).instructions

    def test_conversation_module_grouping(self):
        index = make_index()

        # candidate 2005 is a reply to 2002 which replies to 2001
        parents = {2005: 2002, 2002: 2001}
        store = {2001: Candidate(id=2001), 2002: Candidate(id=2002)}

        def resolver(c):
            chain = [c]
            cur = c.id
            while cur in parents:
                cur = parents[cur]
                chain.append(store[cur])
            return list(reversed(chain))

        pipe = hp.build_following_pipeline(index=index,
                                           conversation_resolver=resolver)
        q = hp.TimelineQuery(user_id=10, followed_authors=[11, 12],
                             max_results=10)
        tl = pipe.run(q)
        mods = [e for e in tl.entries if e.kind == EntryKind.MODULE]
        assert len(mods) == 1 and mods[0].module.kind == "conversation"
        assert [c.id for c in mods[0].module.items] == [2001, 2002, 2005]


class TestOtherProducts:
    def test_subscribed(self):
        index = make_index()
        pipe = hp.build_subscribed_pipeline(index=index)
        q = hp.TimelineQuery(user_id=10, subscribed_authors=[13],
                             max_results=10)
        assert pipe.run(q).tweet_ids() == [2004]

    def test_list_tweets_with_ads(self):
        index = make_index()
        pipe = hp.build_list_tweets_pipeline(
            index=index, list_members={5: [11, 99]},
            ads=[Candidate(id=7001)])
        q = hp.TimelineQuery(user_id=10, list_id=5, max_results=10)
        tl = pipe.run(q)
        tweets = [e.sort_id for e in tl.entries if e.kind == EntryKind.TWEET]
        assert set(tweets) == {2002, 2006, 2007}
        assert any(e.kind == EntryKind.AD for e in tl.entries)
        # unknown list → empty
        q2 = hp.TimelineQuery(user_id=10, list_id=6, max_results=10)
        assert pipe.run(q2).tweet_ids() == []

    def test_list_recommended_users(self):
        flow = RecommendationFlow(
            sources=[lambda req: [Candidate(id=i, score=float(-i))
                                  for i in range(30)]],
            predicates=[], max_results=25)
        pipe = hp.build_list_recommended_users_pipeline(wtf_flow=flow)
        tl = pipe.run(hp.TimelineQuery(user_id=1))
        assert len(tl.entries) == 1
        assert len(tl.entries[0].module.items) == 20  # selector truncation

    def test_registry(self):
        index = make_index()
        reg = hp.HomeProductPipelineRegistry()
        reg.register("following", hp.build_following_pipeline(index=index))
        reg.register("subscribed", hp.build_subscribed_pipeline(index=index))
        assert reg.products() == ["following", "subscribed"]
        assert reg.get("following") is not None
        try:
            reg.get("for_you")
            assert False
        except KeyError:
            pass


class TestMixerSelectors:
    def _mod(self, kind, ids):
        return TimelineEntry(
            kind=EntryKind.MODULE,
            module=Module(kind=kind, items=[Candidate(id=i) for i in ids]))

    def test_drop_too_few_and_truncate(self):
        entries = [self._mod("who_to_follow", [1]),
                   self._mod("who_to_follow", [2, 3, 4])]
        out = DropModuleTooFewItems(2, "who_to_follow").select(None, entries, None)
        assert len(out) == 1
        out = DropMaxModuleItemCandidates(2, "who_to_follow").select(None, out, None)
        assert len(out[0].module.items) == 2

    def test_insert_fixed_position_clamps(self):
        tweets = [TimelineEntry(kind=EntryKind.TWEET, candidate=Candidate(id=i))
                  for i in range(2)]
        entries = tweets + [self._mod("who_to_follow", [9, 10])]
        out = InsertFixedPositionModule(EntryKind.MODULE, 50,
                                        "who_to_follow").select(None, entries, None)
        assert out[-1].kind == EntryKind.MODULE

    def test_ads_dropped_when_stream_short(self):
        # unplaceable ads are DROPPED, never appended back-to-back at the
        # tail (the reference AdsInjector drops rather than violate spacing)
        ads = [TimelineEntry(kind=EntryKind.AD, candidate=Candidate(id=70 + i))
               for i in range(3)]
        tweets = [TimelineEntry(kind=EntryKind.TWEET, candidate=Candidate(id=i))
                  for i in range(3)]
        out = InsertAdResults(min_spacing=2, first_position=1).select(
            None, tweets + ads, None)
        n_ads = sum(1 for e in out if e.kind == EntryKind.AD)
        assert n_ads == 1  # only the first ad fits the spacing slots
        assert sum(1 for e in out if e.kind == EntryKind.TWEET) == 3
        # never two consecutive ads
        for a, b in zip(out, out[1:]):
            assert not (a.kind == EntryKind.AD and b.kind == EntryKind.AD)

    def test_pipeline_fail_open(self):
        from the_algorithm_tpu.pipeline.component import (
            CandidatePipeline, CandidateSource)
        from the_algorithm_tpu.pipeline.mixer import MixerCandidatePipeline

        class Boom(CandidateSource):
            def get(self, query, params):
                raise RuntimeError("source down")

        class Ok(CandidateSource):
            def get(self, query, params):
                return [Candidate(id=1)]

        pipe = MixerPipeline(candidate_pipelines=[
            MixerCandidatePipeline(pipeline=CandidatePipeline(source=Boom())),
            MixerCandidatePipeline(pipeline=CandidatePipeline(source=Ok())),
        ])
        tl = pipe.run(hp.TimelineQuery(user_id=1))
        assert tl.tweet_ids() == [1]


class TestForYouMixer:
    """≡ ForYouScoredTweetsMixerPipelineConfig — scored tweets + WTF + ads."""

    def _scored_pipeline(self):
        from the_algorithm_tpu.mixers import home_mixer
        from the_algorithm_tpu.pipeline.component import (
            CandidatePipeline, CandidateSource)
        import numpy as np

        class Src(CandidateSource):
            def get(self, query, params):
                return [Candidate(id=100 + i,
                                  features={"author_id": i % 3,
                                            "created_ts": 10,
                                            "retrieval_score": 1.0 - 0.05 * i})
                        for i in range(12)]

        def predict(x):
            # score proportional to retrieval_score column
            p = np.tile(x[:, :1], (1, 15)) * 0.1 + 0.01
            return np.clip(p, 0.0, 1.0)

        return home_mixer.build_for_you_pipeline(
            candidate_pipelines=[CandidatePipeline(source=Src())],
            hydrators=[],
            predict_fn=predict,
        )

    def test_full_for_you_response(self):
        flow = RecommendationFlow(
            sources=[lambda req: [Candidate(id=900 + i, score=1.0)
                                  for i in range(3)]],
            predicates=[])
        chains = EditChainStore()
        chains.record_edit(101, 9101)
        mixer = hp.build_for_you_mixer(
            scored_tweets_pipeline=self._scored_pipeline(),
            wtf_flow=flow, ads=[Candidate(id=7001)],
            edit_chains=chains, wtf_position=3)
        from the_algorithm_tpu.mixers.home_mixer import ForYouQuery
        q = ForYouQuery(user_id=1, max_results=20)
        q.served_tweet_ids = [101]
        tl = mixer.run(q)
        kinds = [e.kind for e in tl.entries]
        assert EntryKind.MODULE in kinds and EntryKind.AD in kinds
        # ranked order: first tweets sorted by model score desc
        tweets = [e.candidate for e in tl.entries
                  if e.kind == EntryKind.TWEET]
        scores = [t.score for t in tweets]
        assert all(scores[i] >= scores[i + 1] - 1e-9
                   for i in range(len(scores) - 1))
        assert any(i.op == "replace_entry" for i in tl.instructions)

    def test_scoring_failure_propagates(self):
        from the_algorithm_tpu.pipeline.component import (
            CandidatePipeline, CandidateSource)

        class Boom(CandidateSource):
            def get(self, query, params):
                raise RuntimeError("scored tweets down")

        mixer = hp.build_for_you_mixer(
            scored_tweets_pipeline=None)
        # swap in a failing source: fail_open=False must propagate
        mixer.candidate_pipelines[0].pipeline.source = Boom()
        from the_algorithm_tpu.mixers.home_mixer import ForYouQuery
        try:
            mixer.run(ForYouQuery(user_id=1))
            assert False, "expected propagation"
        except RuntimeError:
            pass
