"""Table-driven UUA adapter specs — one table per source stream.

≡ the reference's 16 adapter spec files
(``unified_user_actions/adapter/src/test/scala/...`` —
``ClientEventAdapterSpec`` TableDrivenPropertyChecks pattern): each row is
(raw event, expected actions); adapters are pure so the whole matrix is a
parametrized sweep.
"""

import pytest

from the_algorithm_tpu.actions import uua_adapters as A
from the_algorithm_tpu.actions.uua import ActionType, UnifiedUserAction

T = ActionType


def row(source, event, want):
    """want: list of (user, action_type, item) triples, or [] for drop."""
    return pytest.param(source, event, want, id=f"{source}-{event.get('_id','')}")


CASES = [
    # -- client_event ---------------------------------------------------------
    row("client_event",
        {"_id": "fav", "user_id": 1, "item_type": "tweet", "action": "favorite",
         "item_id": 10, "ts_ms": 5},
        [(1, T.CLIENT_TWEET_FAV, 10)]),
    row("client_event",
        {"_id": "unknown-drop", "user_id": 1, "item_type": "tweet",
         "action": "hover", "item_id": 10},
        []),
    row("client_event",
        {"_id": "missing-user-drop", "item_type": "tweet",
         "action": "favorite", "item_id": 10},
        []),
    # -- tls_favs -------------------------------------------------------------
    row("tls_favs",
        {"_id": "fav", "fav_type": "fav", "user_id": 2, "tweet_id": 20,
         "ts_ms": 1},
        [(2, T.SERVER_TWEET_FAV, 20)]),
    row("tls_favs",
        {"_id": "unfav", "fav_type": "unfav", "user_id": 2, "tweet_id": 20},
        [(2, T.SERVER_TWEET_UNFAV, 20)]),
    row("tls_favs", {"_id": "drop", "fav_type": "meh", "user_id": 2,
                     "tweet_id": 20}, []),
    # -- social_graph ---------------------------------------------------------
    row("social_graph",
        {"_id": "follow", "op": "follow", "source_id": 3, "target_id": 4},
        [(3, T.SERVER_FOLLOW, 4)]),
    row("social_graph",
        {"_id": "unfollow", "op": "unfollow", "source_id": 3, "target_id": 4},
        [(3, T.SERVER_UNFOLLOW, 4)]),
    row("social_graph",
        {"_id": "block", "op": "block", "source_id": 3, "target_id": 4},
        [(3, T.SERVER_BLOCK, 4)]),
    row("social_graph",
        {"_id": "mute", "op": "mute", "source_id": 3, "target_id": 4},
        [(3, T.SERVER_MUTE, 4)]),
    row("social_graph",
        {"_id": "bad-op-drop", "op": "poke", "source_id": 3, "target_id": 4},
        []),
    # -- tweetypie_event ------------------------------------------------------
    row("tweetypie_event",
        {"_id": "create", "event": "create", "ts_ms": 9,
         "tweet": {"user_id": 5, "tweet_id": 50}},
        [(5, T.SERVER_TWEET_CREATE, 50)]),
    row("tweetypie_event",
        {"_id": "reply-engages-parent", "event": "create", "ts_ms": 9,
         "tweet": {"user_id": 5, "tweet_id": 51, "in_reply_to_status_id": 40,
                   "in_reply_to_user_id": 6}},
        [(5, T.SERVER_TWEET_REPLY, 40)]),
    row("tweetypie_event",
        {"_id": "retweet-engages-source", "event": "create",
         "tweet": {"user_id": 5, "tweet_id": 52,
                   "share_source_tweet_id": 41, "share_source_user_id": 7}},
        [(5, T.SERVER_TWEET_RETWEET, 41)]),
    row("tweetypie_event",
        {"_id": "quote", "event": "create",
         "tweet": {"user_id": 5, "tweet_id": 53, "quoted_tweet_id": 42}},
        [(5, T.SERVER_TWEET_QUOTE, 42)]),
    row("tweetypie_event",
        {"_id": "edit", "event": "create",
         "tweet": {"user_id": 5, "tweet_id": 54, "initial_tweet_id": 50}},
        [(5, T.SERVER_TWEET_EDIT, 54)]),
    row("tweetypie_event",
        {"_id": "delete", "event": "delete",
         "tweet": {"user_id": 5, "tweet_id": 50}},
        [(5, T.SERVER_TWEET_DELETE, 50)]),
    row("tweetypie_event",
        {"_id": "delete-retweet", "event": "delete",
         "tweet": {"user_id": 5, "tweet_id": 52,
                   "share_source_tweet_id": 41}},
        [(5, T.SERVER_TWEET_UNRETWEET, 52)]),
    row("tweetypie_event",
        {"_id": "contradictory-drop", "event": "create",
         "tweet": {"user_id": 5, "tweet_id": 55,
                   "in_reply_to_status_id": 1, "share_source_tweet_id": 2}},
        []),
    # -- ads_callback ---------------------------------------------------------
    row("ads_callback",
        {"_id": "fav", "engagement_type": "fav", "user_id": 8, "tweet_id": 80},
        [(8, T.SERVER_PROMOTED_TWEET_FAV, 80)]),
    row("ads_callback",
        {"_id": "profile-follow", "engagement_type": "follow", "user_id": 8,
         "profile_id": 9},
        [(8, T.SERVER_PROMOTED_PROFILE_FOLLOW, 9)]),
    row("ads_callback",
        {"_id": "unknown-drop", "engagement_type": "sparkle", "user_id": 8,
         "tweet_id": 80},
        []),
    # -- email_notification ---------------------------------------------------
    row("email_notification",
        {"_id": "click", "type": "click", "user_id": 11,
         "path": "/i/events/status/12345", "impression_id": "abc",
         "ts_ms": 2},
        [(11, T.CLIENT_TWEET_EMAIL_CLICK, 12345)]),
    row("email_notification",
        {"_id": "no-impression-drop", "type": "click", "user_id": 11,
         "path": "/x/status/12345"},
        []),
    row("email_notification",
        {"_id": "non-numeric-drop", "type": "click", "user_id": 11,
         "path": "/x/status/home", "impression_id": "abc"},
        []),
    row("email_notification",
        {"_id": "open-drop", "type": "open", "user_id": 11,
         "path": "/x/status/12345", "impression_id": "abc"},
        []),
    # -- favorite_archival ----------------------------------------------------
    row("favorite_archival",
        {"_id": "archive-default", "favoriter_id": 12, "tweet_id": 120,
         "tweet_user_id": 13},
        [(12, T.SERVER_TWEET_ARCHIVE_FAVORITE, 120)]),
    row("favorite_archival",
        {"_id": "unarchive", "favoriter_id": 12, "tweet_id": 120,
         "is_archiving_action": False},
        [(12, T.SERVER_TWEET_UNARCHIVE_FAVORITE, 120)]),
    # -- retweet_archival -----------------------------------------------------
    row("retweet_archival",
        {"_id": "archive-acts-on-source", "retweet_user_id": 14,
         "retweet_id": 141, "src_tweet_id": 140, "src_tweet_user_id": 15},
        [(14, T.SERVER_TWEET_ARCHIVE_RETWEET, 140)]),
    row("retweet_archival",
        {"_id": "unarchive", "retweet_user_id": 14, "retweet_id": 141,
         "src_tweet_id": 140, "is_archiving_action": False},
        [(14, T.SERVER_TWEET_UNARCHIVE_RETWEET, 140)]),
    # -- user_modification ----------------------------------------------------
    row("user_modification",
        {"_id": "create", "user_id": 16, "create": {}},
        [(16, T.SERVER_USER_CREATE, 16)]),
    row("user_modification",
        {"_id": "update", "user_id": 16, "update": ["bio"]},
        [(16, T.SERVER_USER_UPDATE, 16)]),
    row("user_modification",
        {"_id": "destroy-drop", "user_id": 16, "destroy": {}},
        []),
    # -- interaction_events (rekey) -------------------------------------------
    row("interaction_events",
        {"_id": "impression", "interaction_type": "impression", "user_id": 17,
         "tweet_id": 170, "surface": "home"},
        [(17, T.CLIENT_TWEET_IMPRESSION, 170)]),
    row("interaction_events",
        {"_id": "other-drop", "interaction_type": "scroll", "user_id": 17,
         "tweet_id": 170},
        []),
    # -- video_client_event ---------------------------------------------------
    row("video_client_event",
        {"_id": "p25", "user_id": 18, "tweet_id": 180,
         "playback_percentage": 25},
        [(18, T.CLIENT_TWEET_VIDEO_PLAYBACK_25, 180)]),
    row("video_client_event",
        {"_id": "p95", "user_id": 18, "tweet_id": 180,
         "playback_percentage": 95},
        [(18, T.CLIENT_TWEET_VIDEO_PLAYBACK_95, 180)]),
    row("video_client_event",
        {"_id": "quality-view", "user_id": 18, "tweet_id": 180,
         "quality_view": True},
        [(18, T.CLIENT_TWEET_VIDEO_QUALITY_VIEW, 180)]),
    row("video_client_event",
        {"_id": "odd-pct-drop", "user_id": 18, "tweet_id": 180,
         "playback_percentage": 33},
        []),
]


@pytest.mark.parametrize("source,event,want", CASES)
def test_adapter_table(source, event, want):
    event = {k: v for k, v in event.items() if k != "_id"}
    got = A.adapt(source, event)
    assert [(a.user_id, a.action_type, a.item_id) for a in got] == want


def test_registry_covers_twelve_sources():
    assert len(A.ADAPTERS) >= 11
    # plus the rekey adapter over already-normalized UUAs = 12 sources
    a = UnifiedUserAction(
        user_id=1, action_type=T.CLIENT_TWEET_FAV, item_id=2, timestamp_ms=3
    )
    assert A.rekey_uua_adapter(a) == [(1, a)]


def test_timestamp_and_metadata_preserved():
    got = A.adapt(
        "retweet_archival",
        {"retweet_user_id": 1, "retweet_id": 11, "src_tweet_id": 10,
         "src_tweet_user_id": 2, "ts_ms": 999},
    )
    assert got[0].timestamp_ms == 999
    assert got[0].author_id == 2
    assert got[0].metadata["retweeting_tweet_id"] == 11


def test_extract_tweet_id_from_path():
    f = A.extract_tweet_id_from_path
    assert f("/i/status/123") == 123
    assert f("/i/status/123/") == 123
    assert f("/i/status/123?cn=x") == 123
    assert f("/i/home") is None
    assert f(None) is None


# -- topic-id + search-info extraction (≡ TopicsIdUtilsSpec / SearchInfoUtilsSpec)

TOPIC_CASES = [
    ({"topic_id": 7}, [7]),
    ({"suggestion_topic_id": 8, "controller_topic_id": 9}, [8, 9]),
    ({"topic_ids": [3, 1, 3]}, [1, 3]),
    ({"topic_id": 5, "topic_ids": [5, 6]}, [5, 6]),
    ({}, []),
]


def test_topic_ids_from_event():
    for event, want in TOPIC_CASES:
        assert A.topic_ids_from_event(event) == want, event


def test_search_info_extraction():
    assert A.search_info({"surface": "home", "query": "x"}) is None
    assert A.search_info({"surface": "search"}) is None
    got = A.search_info({"surface": "search",
                         "search_details": {"query": "jax tpu", "rank": 3}})
    assert got == {"query": "jax tpu", "rank": 3}
    got = A.search_info({"surface": "search", "query": "cats"})
    assert got == {"query": "cats"}


def test_enriched_client_event_carries_topic_and_search_metadata():
    got = A.adapt("client_event", {
        "user_id": 1, "item_type": "tweet", "action": "favorite",
        "item_id": 10, "ts_ms": 5, "surface": "search",
        "topic_id": 42, "search_details": {"query": "q", "rank": 1},
    })
    assert len(got) == 1
    assert got[0].metadata["topic_ids"] == [42]
    assert got[0].metadata["search_info"]["rank"] == 1
    # non-search home event: no search_info key
    got = A.adapt("client_event", {
        "user_id": 1, "item_type": "tweet", "action": "favorite",
        "item_id": 10, "ts_ms": 5, "surface": "home",
    })
    assert "search_info" not in got[0].metadata
    assert "topic_ids" not in got[0].metadata
