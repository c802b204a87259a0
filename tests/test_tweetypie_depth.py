"""Tweetypie depth: entity extraction, conversation resolution, edit chains,
takedowns, read-through cache, and the ingester bridge (≡ tweetypie write
path + repository/caching layers)."""

import numpy as np

from the_algorithm_tpu.storage import tweetypie as tp


def make_thread():
    store = tp.TweetStore()
    store.create(tp.Tweet(1, author_id=7, text="root", created_ts=10))
    store.create(tp.Tweet(2, author_id=7, text="self reply", created_ts=20,
                          reply_to=1))
    store.create(tp.Tweet(3, author_id=9, text="other reply", created_ts=30,
                          reply_to=2))
    return store


class TestEntities:
    def test_extract(self):
        e = tp.extract_entities("look https://x.co/a #jax #tpu @you")
        assert e.urls == ("https://x.co/a",)
        assert e.hashtags == ("jax", "tpu")
        assert e.mentions == ("you",)
        assert e.has_card


class TestConversation:
    def test_root_depth_selfthread(self):
        store = make_thread()
        r = tp.ConversationResolver(store)
        root, depth, selfth = r.resolve(store._tweets[2])
        assert (root, depth, selfth) == (1, 1, True)
        root, depth, selfth = r.resolve(store._tweets[3])
        assert (root, depth) == (1, 2)
        assert not selfth  # author 9 replying into author 7's thread

    def test_root_tweet_not_self_thread(self):
        store = make_thread()
        root, depth, selfth = tp.ConversationResolver(store).resolve(
            store._tweets[1]
        )
        assert (root, depth, selfth) == (1, 0, False)


class TestEditChain:
    def test_latest_and_stale(self):
        ec = tp.EditChainStore()
        ec.record_edit(10, 11)
        ec.record_edit(10, 12)
        assert ec.latest(10) == 12
        assert ec.latest(11) == 12
        assert ec.versions(11) == [10, 11, 12]
        assert ec.is_stale(10) and not ec.is_stale(12)

    def test_unedited_tweet(self):
        ec = tp.EditChainStore()
        assert ec.latest(5) == 5 and not ec.is_stale(5)


class TestTakedowns:
    def test_country_scoped(self):
        td = tp.TakedownStore()
        td.withhold(1, ["de", "FR"])
        assert td.is_withheld(1, "DE") and td.is_withheld(1, "fr")
        assert not td.is_withheld(1, "US")
        assert not td.is_withheld(2, "DE")
        assert td.countries(1) == {"DE", "FR"}


class TestCache:
    def test_read_through_and_hit_accounting(self):
        store = make_thread()
        cache = tp.CachingTweetStore(store, capacity=8)
        a = cache.get_tweets([1, 2], tp.HydrationField.CORE)
        b = cache.get_tweets([1, 2], tp.HydrationField.CORE)
        assert cache.misses == 2 and cache.hits == 2
        assert a[0].core == b[0].core

    def test_negative_caching(self):
        cache = tp.CachingTweetStore(make_thread())
        r1 = cache.get_tweets([99])
        r2 = cache.get_tweets([99])
        assert not r1[0].found and not r2[0].found
        assert cache.hits == 1  # second miss served from negative cache

    def test_invalidation_after_write(self):
        store = make_thread()
        cache = tp.CachingTweetStore(store)
        before = cache.get_tweets([1], tp.HydrationField.COUNTS)[0]
        store.increment_counts(1, favs=5)
        cache.invalidate(1)
        after = cache.get_tweets([1], tp.HydrationField.COUNTS)[0]
        assert after.counts["fav_count"] == before.counts["fav_count"] + 5

    def test_lru_eviction(self):
        store = tp.TweetStore()
        for i in range(10):
            store.create(tp.Tweet(i, author_id=1, text="t", created_ts=i))
        cache = tp.CachingTweetStore(store, capacity=4)
        cache.get_tweets(list(range(10)))
        assert len(cache._cache) == 4


class TestIngesterBridge:
    def test_to_raw_tweet_resolves_conversation(self):
        store = make_thread()
        store.create(tp.Tweet(4, author_id=9,
                              text="check https://x.co pic.jpg", created_ts=40,
                              reply_to=3, media=("a.jpg",)))
        store.increment_counts(1, favs=12)
        raw = tp.to_raw_tweet(store, store._tweets[4], now=100)
        assert raw.is_reply and raw.conversation_depth == 3
        assert raw.num_likes_root == 12
        assert raw.has_card and raw.has_image
        assert not raw.is_self_thread

    def test_bridge_feeds_earlybird_index(self):
        from the_algorithm_tpu.search import earlybird as eb

        store = make_thread()
        cfg = eb.EarlybirdConfig(capacity=8, max_tokens=8)
        raws = [tp.to_raw_tweet(store, t) for t in store._tweets.values()]
        docs = eb.build_documents(raws, cfg)
        index = eb.ingest(eb.init_index(cfg), *docs[:5])
        ix = eb.DOC_FEATURE_INDEX
        feats = np.asarray(index.features)
        # tweet 2 (self reply, depth 1) landed with the right doc features
        slot = int(np.flatnonzero(np.asarray(index.tweet_ids) == 2)[0])
        assert feats[slot, ix["is_reply"]] == 1.0
        assert feats[slot, ix["conversation_depth"]] == 1.0
        assert feats[slot, ix["is_self_thread"]] == 1.0
