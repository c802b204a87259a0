"""Tweetypie-equivalent: the tweet CRUD source of truth + hydration pipeline.

≡ ``tweetypie/`` (SURVEY.md L0): ``GetTweetsHandler`` read path over
Manhattan+cache, a ``TweetHydration`` pipeline filling optional field groups
(core data, counts, media, visibility, quoted tweet), write/delete paths.

In-process: a dict-backed store (the Manhattan stand-in — SURVEY.md §4
"fake stores (dict-backed)") with the same shape: typed Tweet records,
hydration options selecting field groups, soft deletes, count updates fed by
the UUA stream. The serving pipelines hydrate candidate features from here.
"""

from __future__ import annotations

import dataclasses
import enum
import threading
from typing import Dict, List, Mapping, Optional, Sequence, Set


class HydrationField(enum.Flag):
    """≡ the hydration option groups in GetTweetOptions."""

    CORE = enum.auto()  # text, author, created_at
    COUNTS = enum.auto()  # fav/retweet/reply/quote counts
    MEDIA = enum.auto()
    VISIBILITY = enum.auto()  # safety labels
    QUOTED = enum.auto()  # one level of quoted-tweet core
    ALL = CORE | COUNTS | MEDIA | VISIBILITY | QUOTED


@dataclasses.dataclass
class Tweet:
    tweet_id: int
    author_id: int
    text: str
    created_ts: int
    reply_to: Optional[int] = None
    quoted_tweet_id: Optional[int] = None
    media: Sequence[str] = ()
    fav_count: int = 0
    retweet_count: int = 0
    reply_count: int = 0
    quote_count: int = 0
    safety_labels: Set[str] = dataclasses.field(default_factory=set)
    deleted: bool = False


@dataclasses.dataclass
class HydratedTweet:
    """The GetTweetResult analog: only requested groups are populated."""

    tweet_id: int
    core: Optional[Mapping] = None
    counts: Optional[Mapping] = None
    media: Optional[Sequence[str]] = None
    visibility: Optional[Set[str]] = None
    quoted: Optional[Mapping] = None
    found: bool = True


class TweetStore:
    """Thread-safe CRUD + hydration (cache layer folded into the dict)."""

    def __init__(self):
        self._lock = threading.Lock()
        self._tweets: Dict[int, Tweet] = {}

    # -- write path (PostTweet / DeleteTweet handlers) ----------------------

    def create(self, tweet: Tweet) -> None:
        with self._lock:
            if tweet.tweet_id in self._tweets:
                raise ValueError(f"tweet {tweet.tweet_id} exists")
            self._tweets[tweet.tweet_id] = tweet
            if tweet.reply_to is not None:
                parent = self._tweets.get(tweet.reply_to)
                if parent:
                    parent.reply_count += 1
            if tweet.quoted_tweet_id is not None:
                q = self._tweets.get(tweet.quoted_tweet_id)
                if q:
                    q.quote_count += 1

    def delete(self, tweet_id: int) -> bool:
        """Soft delete (the reference tombstones; hydration reports !found)."""
        with self._lock:
            t = self._tweets.get(tweet_id)
            if t is None or t.deleted:
                return False
            t.deleted = True
            return True

    def increment_counts(
        self, tweet_id: int, favs: int = 0, retweets: int = 0
    ) -> None:
        with self._lock:
            t = self._tweets.get(tweet_id)
            if t and not t.deleted:
                t.fav_count += favs
                t.retweet_count += retweets

    # -- read path (GetTweetsHandler + TweetHydration) ----------------------

    def get_tweets(
        self,
        tweet_ids: Sequence[int],
        fields: HydrationField = HydrationField.CORE,
    ) -> List[HydratedTweet]:
        """Batched hydration; missing/deleted → found=False (same order)."""
        out: List[HydratedTweet] = []
        with self._lock:
            for tid in tweet_ids:
                t = self._tweets.get(tid)
                if t is None or t.deleted:
                    out.append(HydratedTweet(tweet_id=tid, found=False))
                    continue
                h = HydratedTweet(tweet_id=tid)
                if fields & HydrationField.CORE:
                    h.core = {
                        "author_id": t.author_id,
                        "text": t.text,
                        "created_ts": t.created_ts,
                        "reply_to": t.reply_to,
                    }
                if fields & HydrationField.COUNTS:
                    h.counts = {
                        "fav_count": t.fav_count,
                        "retweet_count": t.retweet_count,
                        "reply_count": t.reply_count,
                        "quote_count": t.quote_count,
                    }
                if fields & HydrationField.MEDIA:
                    h.media = list(t.media)
                if fields & HydrationField.VISIBILITY:
                    h.visibility = set(t.safety_labels)
                if fields & HydrationField.QUOTED and t.quoted_tweet_id:
                    q = self._tweets.get(t.quoted_tweet_id)
                    if q and not q.deleted:
                        h.quoted = {
                            "tweet_id": q.tweet_id,
                            "author_id": q.author_id,
                            "text": q.text,
                        }
                out.append(h)
        return out

    def author_map(self) -> Dict[int, int]:
        """tweet→author snapshot (feeds the UUA AuthorHydrator)."""
        with self._lock:
            return {
                tid: t.author_id
                for tid, t in self._tweets.items()
                if not t.deleted
            }
