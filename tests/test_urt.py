"""URT decorator/marshaller layer over mixer product output
(≡ product-mixer component-library decorator/urt + premarshaller/urt)."""

import json

import numpy as np
import jax.numpy as jnp

from the_algorithm_tpu.mixers import home_products as hp
from the_algorithm_tpu.mixers.follow_recommendations import RecommendationFlow
from the_algorithm_tpu.pipeline import urt
from the_algorithm_tpu.pipeline.component import Candidate
from the_algorithm_tpu.pipeline.mixer import EntryKind
from the_algorithm_tpu.search import earlybird as eb
from the_algorithm_tpu.storage.tweetypie import EditChainStore


def make_index():
    cfg = eb.EarlybirdConfig(capacity=32, max_tokens=4)
    index = eb.init_index(cfg)
    n = 8
    toks = jnp.asarray(
        np.stack([eb.tokenize(f"tweet number {i}", 4) for i in range(n)]))
    authors = jnp.asarray([10, 11, 12, 13, 10, 11, 99, 10], jnp.int32)
    ts = jnp.asarray(np.arange(100, 100 + n * 10, 10), jnp.int32)
    feats = jnp.zeros((n, len(eb.DOC_FEATURES)), jnp.float32)
    ids = jnp.asarray(np.arange(2001, 2001 + n, dtype=np.int32))
    return eb.ingest(index, toks, authors, ts, feats, ids)


def run_following(**kw):
    index = make_index()
    flow = RecommendationFlow(
        sources=[lambda req: [Candidate(id=900 + i, score=1.0 - i * 0.1,
                                        features={"author_follows_viewer": 1})
                              for i in range(4)]],
        predicates=[],
    )
    chains = EditChainStore()
    chains.record_edit(2003, 9003)
    pipe = hp.build_following_pipeline(
        index=index, wtf_flow=flow, wtf_position=2,
        ads=[Candidate(id=7001, features={"advertiser_id": 55})],
        edit_chains=chains,
    )
    q = hp.TimelineQuery(user_id=10, followed_authors=[11, 12],
                         served_tweet_ids=[2003], max_results=10, **kw)
    return pipe.run(q)


class TestMarshaller:
    def setup_method(self):
        self.tl = run_following()
        self.resp = urt.marshal_timeline(self.tl)

    def test_addentries_envelope_and_sort_indexes(self):
        entries = self.resp.entries()
        assert entries, "no entries marshalled"
        idx = [e["sortIndex"] for e in entries]
        assert idx == sorted(idx, reverse=True)  # descending
        # round-trips through JSON
        parsed = json.loads(self.resp.to_json())
        assert "timeline" in parsed and parsed["timeline"]["instructions"]

    def test_tweet_entries_typed(self):
        tweets = [e for e in self.resp.entries()
                  if e["entryId"].startswith("tweet-")]
        assert tweets
        for e in tweets:
            item = e["content"]["item"]
            assert item["itemType"] == "tweet"
            assert isinstance(item["id"], int)
            assert "authorId" in item["metadata"]

    def test_module_entry_with_header_and_user_items(self):
        mods = [e for e in self.resp.entries()
                if e["content"]["kind"] == "module"]
        assert len(mods) == 1
        mod = mods[0]["content"]["module"]
        assert mod["header"]["text"] == "Who to follow"
        assert all(i["itemType"] == "user" for i in mod["items"])
        # "Follows you" social context built from candidate features
        assert mod["items"][0]["socialContext"]["contextType"] == "followed_by"

    def test_promoted_entry_metadata(self):
        ads = [e for e in self.resp.entries()
               if e["entryId"].startswith("promoted-tweet-")]
        assert len(ads) == 1
        pm = ads[0]["content"]["item"]["promotedMetadata"]
        assert pm["advertiserId"] == 55 and pm["disclosureType"] == "ad"

    def test_cursors_present(self):
        entries = self.resp.entries()
        kinds = {e["content"].get("cursorType") for e in entries
                 if e["content"]["kind"] == "cursor"}
        assert kinds == {"top", "bottom"}
        top = next(e for e in entries
                   if e["content"].get("cursorType") == "top")
        assert top["value" if "value" in top else "content"]

    def test_replace_entry_instruction_wire_format(self):
        repl = [i.to_dict() for i in self.resp.instructions
                if i.op == "replaceEntry"]
        assert repl == [{"replaceEntry": {
            "entryIdToReplace": "tweet-2003", "withTweetId": 9003}}]


class TestSocialContext:
    def test_social_proof_text(self):
        b = urt.FeatureSocialContextBuilder()
        c = Candidate(id=1, features={"social_proof": 3,
                                      "social_proof_user_ids": [7, 8]})
        ctx = b(c)
        assert ctx.context_type == "social_proof"
        assert "3 people you follow" in ctx.text
        one = b(Candidate(id=2, features={"social_proof": 1}))
        assert "1 person you follow" in one.text

    def test_topic_context(self):
        b = urt.FeatureSocialContextBuilder()
        ctx = b(Candidate(id=1, features={"topic_relevance": 0.9,
                                          "topic_name": "TPUs"}))
        assert ctx.context_type == "topic" and "TPUs" in ctx.text

    def test_no_context(self):
        assert urt.FeatureSocialContextBuilder()(Candidate(id=1)) is None


class TestInterstitialRideAlong:
    def test_visibility_interstitial_marshals(self):
        from the_algorithm_tpu.pipeline.mixer import (
            Timeline, TimelineEntry)

        c = Candidate(id=5, features={"visibility_interstitial": "nsfw_hp",
                                      "author_id": 2})
        tl = Timeline(entries=[TimelineEntry(kind=EntryKind.TWEET,
                                             candidate=c)])
        resp = urt.marshal_timeline(tl)
        item = resp.entries()[0]["content"]["item"]
        assert item["interstitial"] == {"reason": "nsfw_hp"}
