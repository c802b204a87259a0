"""Earlybird ingester: event streams → live index maintenance.

≡ ``src/java/com/twitter/search/ingester/`` (9.1k LoC: the tweet ingestion
pipeline — tweetypie create/delete events through text analysis into index
documents — plus the engagement-count updater and the user-updates pipeline
that pushes author safety states into the index) and the
``feature_update_service/``.

One coordinator class consumes the framework's real streams:

- tweet creates (``storage/tweetypie.Tweet``) → :func:`to_raw_tweet`
  conversation/entity enrichment → ``build_documents`` → ``ingest``;
- UUA engagement actions → in-index count **increments**
  (``persistence.increment_feature``);
- tweet deletes → in-index tombstone (author := PAD so the doc stops
  matching — the reference's delete pipeline);
- user updates (suspend/protect) → an author-state table consulted at
  query time via ``SearchQuery.followed_authors``-style filtering or the
  author-state mask exposed to collectors.

Batches are micro-batched (the Kafka consumer's poll loop) so each device
update is one jitted call.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Dict, Iterable, List, Mapping, Optional, Sequence, Set

import jax.numpy as jnp
import numpy as np

from the_algorithm_tpu.actions.uua import ActionType, UnifiedUserAction
from the_algorithm_tpu.ops.sparse import PAD_ID
from the_algorithm_tpu.search import earlybird as eb
from the_algorithm_tpu.search import persistence
from the_algorithm_tpu.storage import tweetypie as tp

# UUA engagement → which doc-feature count it bumps (the engagement
# updater's mapping; unfavs decrement)
_ACTION_TO_FEATURE: Dict[ActionType, tuple] = {
    ActionType.CLIENT_TWEET_FAV: ("fav_count", 1.0),
    ActionType.SERVER_TWEET_FAV: ("fav_count", 1.0),
    ActionType.CLIENT_TWEET_UNFAV: ("fav_count", -1.0),
    ActionType.SERVER_TWEET_UNFAV: ("fav_count", -1.0),
    ActionType.CLIENT_TWEET_REPLY: ("reply_count", 1.0),
    ActionType.SERVER_TWEET_REPLY: ("reply_count", 1.0),
    ActionType.CLIENT_TWEET_RETWEET: ("retweet_count", 1.0),
    ActionType.SERVER_TWEET_RETWEET: ("retweet_count", 1.0),
    ActionType.CLIENT_TWEET_QUOTE: ("quote_count", 1.0),
    ActionType.SERVER_TWEET_QUOTE: ("quote_count", 1.0),
}


class AuthorState(enum.IntEnum):
    """≡ the user-updates pipeline's antisocial states."""

    NORMAL = 0
    PROTECTED = 1
    SUSPENDED = 2
    DEACTIVATED = 3


class EarlybirdIngester:
    """The ingestion pipelines around one live index."""

    def __init__(
        self,
        config: eb.EarlybirdConfig,
        index: Optional[eb.EarlybirdIndex] = None,
        store: Optional[tp.TweetStore] = None,
        ui_language: str = "en",
        url_reputation: Optional[Mapping] = None,  # domain -> rep [0,1]
        card_store: Optional[Mapping] = None,  # tweet_id -> card type
    ):
        self.config = config
        self.index = index if index is not None else eb.init_index(config)
        self.store = store
        self.ui_language = ui_language
        self.author_state: Dict[int, AuthorState] = {}
        self.log_offset = 0  # consumed-event offset (Kafka-offset analog)
        # the URL/card resolution stores (the ingester resolve stage:
        # shortener expansion + domain reputation + card hydration)
        self.url_reputation = url_reputation
        self.card_store = card_store

    # -- tweet ingestion pipeline -------------------------------------------

    def ingest_tweets(self, tweets: Sequence, *, now: int = 0) -> int:
        """Tweet creates → documents → ring append. Accepts RawTweet or
        tweetypie Tweet records (enriched via the tweetypie bridge)."""
        raws = []
        for t in tweets:
            if isinstance(t, eb.RawTweet):
                raws.append(t)
            elif self.store is not None:
                raws.append(tp.to_raw_tweet(
                    self.store, t, now=now, language=self.ui_language))
            else:
                raise ValueError(
                    "tweetypie Tweet ingestion needs a TweetStore"
                )
        if not raws:
            return 0
        docs = eb.build_documents(
            raws, self.config, ui_language=self.ui_language, now=now,
            url_reputation=self.url_reputation, card_store=self.card_store,
        )
        self.index = eb.ingest(self.index, *docs[:5])
        self.log_offset += len(raws)
        return len(raws)

    # -- engagement-count updater -------------------------------------------

    def apply_engagements(self, actions: Sequence[UnifiedUserAction]) -> int:
        """UUA actions → batched in-index count increments (one device call
        per touched feature column)."""
        by_feature: Dict[str, Dict[int, float]] = {}
        for a in actions:
            m = _ACTION_TO_FEATURE.get(a.action_type)
            if m is None:
                continue
            name, delta = m
            col = by_feature.setdefault(name, {})
            col[int(a.item_id)] = col.get(int(a.item_id), 0.0) + delta
        n = 0
        for name, deltas in by_feature.items():
            ids = np.fromiter(deltas.keys(), np.int32, len(deltas))
            vals = np.fromiter(deltas.values(), np.float32, len(deltas))
            self.index = persistence.increment_feature(
                self.index,
                jnp.asarray(ids),
                jnp.int32(eb.DOC_FEATURE_INDEX[name]),
                jnp.asarray(vals),
            )
            n += ids.shape[0]
        self.log_offset += len(actions)
        return n

    # -- delete pipeline ------------------------------------------------------

    def delete_tweets(self, tweet_ids: Sequence[int]) -> None:
        """Tombstone: clear the author column so the doc stops matching
        (every query requires ``author != PAD``)."""
        ids = jnp.asarray(np.asarray(tweet_ids, np.int32))
        hit = self.index.tweet_ids[None, :] == ids[:, None]
        slot = jnp.argmax(hit, axis=1)
        found = hit.any(axis=1)
        safe = jnp.where(found, slot, self.index.capacity)
        self.index = self.index._replace(
            author=self.index.author.at[safe].set(PAD_ID, mode="drop")
        )

    # -- user-updates pipeline -------------------------------------------------

    def apply_user_updates(
        self, updates: Mapping[int, AuthorState]
    ) -> None:
        """Author safety-state stream (suspend/protect/deactivate)."""
        self.author_state.update(
            {int(k): AuthorState(v) for k, v in updates.items()}
        )

    def visible_author_mask(self) -> jnp.ndarray:
        """[T] bool — docs whose author is currently servable; AND this
        into ``match_mask`` output (the collector-level author filter)."""
        bad = np.asarray(
            [a for a, s in self.author_state.items()
             if s != AuthorState.NORMAL],
            np.int32,
        )
        if bad.size == 0:
            return jnp.ones((self.index.capacity,), bool)
        authors = self.index.author
        return ~jnp.isin(authors, jnp.asarray(bad))

    # -- search with ingester-side filters ------------------------------------

    def search(self, query: eb.SearchQuery, *, max_results: int, **kw):
        """Query the live index with the author-state mask applied
        (one ``eb.search`` call — the mask rides ``extra_mask``)."""
        return eb.search(
            self.index, query, max_results=max_results,
            extra_mask=self.visible_author_mask(), **kw,
        )
