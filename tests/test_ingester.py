"""Earlybird ingester: tweetypie → index pipeline, UUA count increments,
delete tombstones, author safety states (≡ search/ingester + the
feature-update + user-updates pipelines)."""

import jax.numpy as jnp
import numpy as np
import pytest

from the_algorithm_tpu.actions.uua import ActionType, UnifiedUserAction
from the_algorithm_tpu.ops.sparse import PAD_ID
from the_algorithm_tpu.search import earlybird as eb
from the_algorithm_tpu.search import ingester as ing
from the_algorithm_tpu.storage import tweetypie as tp


def act(atype, tweet, user=1):
    return UnifiedUserAction(user_id=user, action_type=atype, item_id=tweet,
                             timestamp_ms=0)


def make():
    store = tp.TweetStore()
    for i, author in ((1, 7), (2, 8), (3, 9)):
        store.create(tp.Tweet(i, author_id=author, text=f"hello tweet {i}",
                              created_ts=100 + i))
    g = ing.EarlybirdIngester(
        eb.EarlybirdConfig(capacity=16, max_tokens=8), store=store)
    g.ingest_tweets(list(store._tweets.values()), now=200)
    return store, g


def search_ids(g, text="hello"):
    q = eb.SearchQuery(tokens=jnp.asarray(eb.tokenize(text, 8)),
                       require_all=False, min_ts=jnp.int32(0),
                       max_ts=jnp.int32(1000))
    ids, _ = g.search(q, max_results=8)
    return {int(i) for i in np.asarray(ids) if i != int(PAD_ID)}


class TestIngestion:
    def test_tweetypie_records_become_docs(self):
        _, g = make()
        assert g.log_offset == 3
        assert search_ids(g) == {1, 2, 3}

    def test_engagement_increments_visible(self):
        _, g = make()
        n = g.apply_engagements([
            act(ActionType.CLIENT_TWEET_FAV, 1),
            act(ActionType.CLIENT_TWEET_FAV, 1, user=2),
            act(ActionType.CLIENT_TWEET_UNFAV, 1, user=2),
            act(ActionType.SERVER_TWEET_RETWEET, 2),
            act(ActionType.CLIENT_PROFILE_VISIT, 3),  # not a count action
        ])
        assert n == 2  # two touched (feature, id) cells
        feats = np.asarray(g.index.features)
        tids = np.asarray(g.index.tweet_ids)
        ix = eb.DOC_FEATURE_INDEX
        s1 = int(np.flatnonzero(tids == 1)[0])
        s2 = int(np.flatnonzero(tids == 2)[0])
        assert feats[s1, ix["fav_count"]] == 1.0  # +1 +1 -1
        assert feats[s2, ix["retweet_count"]] == 1.0

    def test_delete_tombstones(self):
        _, g = make()
        g.delete_tweets([2])
        assert search_ids(g) == {1, 3}

    def test_unknown_delete_is_noop(self):
        _, g = make()
        g.delete_tweets([99])
        assert search_ids(g) == {1, 2, 3}


class TestUserUpdates:
    def test_suspended_author_hidden_then_restored(self):
        _, g = make()
        g.apply_user_updates({8: ing.AuthorState.SUSPENDED})
        assert search_ids(g) == {1, 3}
        g.apply_user_updates({8: ing.AuthorState.NORMAL})
        assert search_ids(g) == {1, 2, 3}

    def test_mask_shape(self):
        _, g = make()
        g.apply_user_updates({9: ing.AuthorState.PROTECTED})
        mask = np.asarray(g.visible_author_mask())
        assert mask.shape == (16,)
        tids = np.asarray(g.index.tweet_ids)
        s3 = int(np.flatnonzero(tids == 3)[0])
        assert not mask[s3]


class TestEndToEndLoop:
    def test_full_lifecycle(self):
        """create → engage → rank shift → suspend → delete, one live index."""
        store, g = make()
        # heavy favs on tweet 3 push it to the top under count weighting
        g.apply_engagements([
            act(ActionType.CLIENT_TWEET_FAV, 3, user=u) for u in range(30)
        ])
        q = eb.SearchQuery(tokens=jnp.asarray(eb.tokenize("hello", 8)),
                           require_all=False, min_ts=jnp.int32(0),
                           max_ts=jnp.int32(1000))
        ids, scores = g.search(q, max_results=3)
        assert int(np.asarray(ids)[0]) == 3
        g.apply_user_updates({9: ing.AuthorState.SUSPENDED})  # author of 3
        g.delete_tweets([1])
        assert search_ids(g) == {2}
