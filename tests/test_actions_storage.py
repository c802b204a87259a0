"""UUA adapters/enricher (table-driven, mirroring ClientEventAdapterSpec),
recos-injector routing, tweetypie store tests."""

import numpy as np
import pytest

from the_algorithm_tpu.actions import recos_injector, uua
from the_algorithm_tpu.graph.uteg import EngagementType
from the_algorithm_tpu.storage import tweetypie as tp


class TestClientEventAdapter:
    # table-driven cases ≡ ClientEventAdapterSpec's TableDrivenPropertyChecks
    CASES = [
        (("tweet", "favorite"), uua.ActionType.CLIENT_TWEET_FAV),
        (("tweet", "retweet"), uua.ActionType.CLIENT_TWEET_RETWEET),
        (("tweet", "reply"), uua.ActionType.CLIENT_TWEET_REPLY),
        (("tweet", "click"), uua.ActionType.CLIENT_TWEET_CLICK),
        (("video", "playback_50"), uua.ActionType.CLIENT_TWEET_VIDEO_PLAYBACK_50),
        (("profile", "visit"), uua.ActionType.CLIENT_PROFILE_VISIT),
        (("user", "follow"), uua.ActionType.CLIENT_FOLLOW),
        (("user", "block"), uua.ActionType.CLIENT_BLOCK),
    ]

    @pytest.mark.parametrize("key,expected", CASES)
    def test_mapping(self, key, expected):
        item_type, action = key
        out = uua.client_event_adapter(
            {
                "user_id": 1, "item_type": item_type, "action": action,
                "item_id": 42, "ts_ms": 1000, "surface": "home",
            }
        )
        assert len(out) == 1
        assert out[0].action_type == expected
        assert out[0].item_id == 42
        assert out[0].product_surface == "home"

    def test_unknown_event_dropped(self):
        assert uua.client_event_adapter(
            {"user_id": 1, "item_type": "tweet", "action": "hover", "item_id": 2}
        ) == []

    def test_missing_ids_dropped(self):
        assert uua.client_event_adapter(
            {"item_type": "tweet", "action": "favorite", "item_id": 2}
        ) == []

    def test_metadata_passthrough(self):
        out = uua.client_event_adapter(
            {
                "user_id": 1, "item_type": "tweet", "action": "favorite",
                "item_id": 2, "ts_ms": 5, "position": 3,
            }
        )
        assert out[0].metadata == {"position": 3}


class TestServerAdapters:
    def test_tls_favs(self):
        out = uua.tls_favs_adapter(
            {"fav_type": "fav", "user_id": 1, "tweet_id": 9, "ts_ms": 7, "author_id": 3}
        )
        assert out[0].action_type == uua.ActionType.SERVER_TWEET_FAV
        assert out[0].author_id == 3
        assert uua.tls_favs_adapter({"fav_type": "weird", "user_id": 1, "tweet_id": 2}) == []

    def test_social_graph(self):
        out = uua.social_graph_adapter(
            {"op": "follow", "source_id": 1, "target_id": 2, "ts_ms": 3}
        )
        assert out[0].action_type == uua.ActionType.SERVER_FOLLOW
        assert out[0].item_id == 2


class TestEnricher:
    def test_author_hydration_plan(self):
        actions = [
            uua.UnifiedUserAction(1, uua.ActionType.CLIENT_TWEET_FAV, 100, 10),
            uua.UnifiedUserAction(2, uua.ActionType.CLIENT_TWEET_FAV, 200, 20),
        ]
        plan = uua.EnrichmentPlan(
            stages=[
                uua.EnrichmentStage(
                    key_fn=lambda a: a.item_id,
                    hydrator=uua.AuthorHydrator({100: 7, 200: 8}),
                )
            ]
        )
        out = uua.enrich(actions, plan)
        by_item = {a.item_id: a for a in out}
        assert by_item[100].author_id == 7
        assert by_item[200].author_id == 8

    def test_noop_hydrator(self):
        a = uua.UnifiedUserAction(1, uua.ActionType.CLIENT_TWEET_FAV, 100, 10)
        plan = uua.EnrichmentPlan(
            stages=[uua.EnrichmentStage(lambda a: a.user_id, uua.NoopHydrator())]
        )
        assert uua.enrich([a], plan) == [a]


class TestRecosInjector:
    def _actions(self):
        return [
            uua.UnifiedUserAction(1, uua.ActionType.CLIENT_TWEET_FAV, 100, 2000, author_id=9),
            uua.UnifiedUserAction(1, uua.ActionType.CLIENT_TWEET_FAV, 101, 1000, author_id=1),  # self-fav
            uua.UnifiedUserAction(2, uua.ActionType.CLIENT_TWEET_RETWEET, 100, 3000, author_id=9),
            uua.UnifiedUserAction(3, uua.ActionType.CLIENT_FOLLOW, 4, 4000),
            uua.UnifiedUserAction(5, uua.ActionType.CLIENT_TWEET_IMPRESSION, 100, 5000),
        ]

    def test_uteg_feed(self):
        feeds = recos_injector.route(self._actions())
        assert feeds.uteg["user_ids"].tolist() == [1, 1, 2]
        assert feeds.uteg["types"].tolist() == [
            int(EngagementType.FAVORITE),
            int(EngagementType.FAVORITE),
            int(EngagementType.RETWEET),
        ]
        # time-ordered
        assert (np.diff(feeds.uteg["timestamps"]) >= 0).all()

    def test_simclusters_feed_drops_self_favs(self):
        feeds = recos_injector.route(self._actions())
        assert feeds.simclusters_favs["tweet_ids"].tolist() == [100]

    def test_realgraph_feed(self):
        feeds = recos_injector.route(self._actions())
        # fav(1→9), rt(2→9), follow(3→4); self-fav and impression dropped
        assert feeds.realgraph["src"].tolist() == [1, 2, 3]
        assert feeds.realgraph["dst"].tolist() == [9, 9, 4]


class TestTweetStore:
    def _store(self):
        s = tp.TweetStore()
        s.create(tp.Tweet(1, author_id=10, text="hello tpu", created_ts=100))
        s.create(
            tp.Tweet(2, author_id=11, text="reply", created_ts=110, reply_to=1)
        )
        s.create(
            tp.Tweet(
                3, author_id=12, text="quote", created_ts=120, quoted_tweet_id=1,
                media=("pic.jpg",), safety_labels={"nsfw"},
            )
        )
        return s

    def test_create_updates_parent_counts(self):
        s = self._store()
        [h] = s.get_tweets([1], tp.HydrationField.COUNTS)
        assert h.counts["reply_count"] == 1
        assert h.counts["quote_count"] == 1

    def test_hydration_field_selection(self):
        s = self._store()
        [h] = s.get_tweets([3], tp.HydrationField.CORE | tp.HydrationField.MEDIA)
        assert h.core["author_id"] == 12
        assert h.media == ["pic.jpg"]
        assert h.counts is None and h.visibility is None

    def test_quoted_hydration(self):
        s = self._store()
        [h] = s.get_tweets([3], tp.HydrationField.QUOTED)
        assert h.quoted["tweet_id"] == 1

    def test_delete_soft(self):
        s = self._store()
        assert s.delete(1)
        [h] = s.get_tweets([1])
        assert not h.found
        assert not s.delete(1)  # already deleted
        # quoted hydration of deleted tweet vanishes
        [h3] = s.get_tweets([3], tp.HydrationField.QUOTED)
        assert h3.quoted is None

    def test_duplicate_create_raises(self):
        s = self._store()
        with pytest.raises(ValueError):
            s.create(tp.Tweet(1, 10, "dup", 1))

    def test_counts_and_author_map(self):
        s = self._store()
        s.increment_counts(1, favs=3, retweets=1)
        [h] = s.get_tweets([1], tp.HydrationField.COUNTS)
        assert h.counts["fav_count"] == 3
        amap = s.author_map()
        assert amap[1] == 10 and len(amap) == 3


class TestWritePath:
    """Tweetypie write pipeline (r4): create/delete/undelete/edit with
    chain-scoped lifetime and takedown integrity + async fanout."""

    def _svc(self):
        from the_algorithm_tpu.storage import tweetypie as tp

        return tp.TweetWriteService(), tp

    def test_post_assigns_time_ordered_ids_and_conversation(self):
        svc, tp = self._svc()
        a = svc.post_tweet(1, "root tweet", now=100)
        b = svc.post_tweet(2, "reply", now=101, reply_to=a.tweet_id)
        c = svc.post_tweet(3, "deeper", now=102, reply_to=b.tweet_id)
        assert a.tweet_id < b.tweet_id < c.tweet_id
        assert a.conversation_id == a.tweet_id
        assert b.conversation_id == a.tweet_id
        assert c.conversation_id == a.tweet_id
        # same-timestamp posts stay unique and ordered
        d = svc.post_tweet(1, "x", now=200)
        e = svc.post_tweet(1, "y", now=200)
        assert d.tweet_id < e.tweet_id

    def test_post_validation(self):
        svc, tp = self._svc()
        with pytest.raises(tp.WriteError):
            svc.post_tweet(1, "   ", now=100)
        with pytest.raises(tp.WriteError):
            svc.post_tweet(1, "reply to ghost", now=100, reply_to=999)
        t = svc.post_tweet(1, "ok", now=100)
        svc.delete_tweet(t.tweet_id)
        with pytest.raises(tp.WriteError):
            svc.post_tweet(2, "reply to deleted", now=101,
                           reply_to=t.tweet_id)

    def test_edit_chain_integrity(self):
        svc, tp = self._svc()
        t = svc.post_tweet(1, "v0", now=100)
        v1 = svc.edit_tweet(t.tweet_id, "v1", now=200)
        v2 = svc.edit_tweet(t.tweet_id, "v2", now=300)
        assert svc.edits.latest(t.tweet_id) == v2.tweet_id
        assert svc.edits.versions(v1.tweet_id) == [
            t.tweet_id, v1.tweet_id, v2.tweet_id]
        assert svc.edits.is_stale(t.tweet_id)
        assert not svc.edits.is_stale(v2.tweet_id)
        # edit window enforced from the INITIAL version's timestamp
        with pytest.raises(tp.WriteError):
            svc.edit_tweet(v2.tweet_id, "too late", now=100 + 3601)

    def test_delete_and_undelete_cascade_over_chain(self):
        svc, tp = self._svc()
        t = svc.post_tweet(1, "v0", now=100)
        v1 = svc.edit_tweet(t.tweet_id, "v1", now=200)
        deleted = svc.delete_tweet(t.tweet_id)  # deleting ANY version
        assert set(deleted) == {t.tweet_id, v1.tweet_id}
        got = svc.store.get_tweets([t.tweet_id, v1.tweet_id])
        assert not got[0].found and not got[1].found
        # deleted chains are not editable
        with pytest.raises(tp.WriteError):
            svc.edit_tweet(v1.tweet_id, "zombie", now=300)
        restored = svc.undelete_tweet(v1.tweet_id)
        assert set(restored) == {t.tweet_id, v1.tweet_id}
        assert svc.store.get_tweets([v1.tweet_id])[0].found

    def test_takedown_covers_whole_chain_and_new_versions(self):
        svc, tp = self._svc()
        t = svc.post_tweet(1, "v0", now=100)
        v1 = svc.edit_tweet(t.tweet_id, "v1", now=200)
        svc.takedown(t.tweet_id, ["de"])
        # every existing version withheld
        assert svc.takedowns.is_withheld(t.tweet_id, "DE")
        assert svc.takedowns.is_withheld(v1.tweet_id, "DE")
        # a FUTURE edit cannot escape the takedown
        v2 = svc.edit_tweet(v1.tweet_id, "v2", now=300)
        assert svc.takedowns.is_withheld(v2.tweet_id, "DE")
        assert not svc.takedowns.is_withheld(v2.tweet_id, "US")

    def test_fanout_hooks_fire_and_fail_open(self):
        svc, tp = self._svc()
        events = []
        svc.on("create", lambda ev: events.append(("create", ev.tweet.text)))
        svc.on("create", lambda ev: 1 / 0)  # broken consumer never fails writes
        svc.on("delete", lambda ev: events.append(("delete",
                                                   ev.tweet.tweet_id)))
        t = svc.post_tweet(1, "hello", now=100)
        svc.delete_tweet(t.tweet_id)
        assert events == [("create", "hello"), ("delete", t.tweet_id)]

    def test_ingester_fanout_bridges_to_search(self):
        import numpy as np

        from the_algorithm_tpu.search import earlybird as eb
        from the_algorithm_tpu.search.ingester import EarlybirdIngester
        from the_algorithm_tpu.storage import tweetypie as tp

        svc = tp.TweetWriteService()
        ing = EarlybirdIngester(
            eb.EarlybirdConfig(capacity=16, max_tokens=8), store=svc.store)
        tp.ingester_fanout(svc, ing)
        t = svc.post_tweet(1, "the #write path indexes live", now=100)
        ids = np.asarray(ing.index.tweet_ids)
        assert t.tweet_id in ids.tolist()
        svc.delete_tweet(t.tweet_id)
        # tombstoned: the doc's author slot cleared so it stops matching
        row = ids.tolist().index(t.tweet_id)
        assert np.asarray(ing.index.author)[row] == int(
            np.iinfo(np.int32).max)
