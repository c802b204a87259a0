"""Earlybird index persistence, feature updates, and query caching.

≡ three earlybird subsystems (SURVEY.md §2.1, §5.3-5.4):

- **flush/load** (``earlybird/partition/{EarlybirdIndexFlusher,
  EarlybirdIndexLoader,KafkaStartup}.java``): segments are periodically
  flushed to HDFS with the Kafka offset they cover; on startup a server
  loads the newest flushed segment and replays the log from that offset
  ("fresh startup" replays everything). Here: the device index snapshots to
  one ``.npz`` with a ``log_offset``, and :func:`load_index` replays the
  tail of the ingest log through the normal ``ingest`` path.
- **feature-update service** (``earlybird/feature_update_service/``): live
  engagement counters (fav/RT/reply counts) are written *into the index*
  after indexing. Here: an in-place batched scatter keyed by tweet id.
- **query cache** (``earlybird/querycache/``): repeated queries are served
  from a TTL cache invalidated by index writes (tracked by write
  generation, the analog of segment version).
"""

from __future__ import annotations

import os
import time
from collections import OrderedDict
from typing import Callable, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from the_algorithm_tpu.ops.sparse import PAD_ID
from the_algorithm_tpu.search.earlybird import EarlybirdIndex, ingest


def flush_index(index: EarlybirdIndex, path: str, log_offset: int) -> None:
    """Snapshot the device index + the ingest-log offset it covers."""
    np.savez_compressed(
        path,
        tokens=np.asarray(index.tokens),
        author=np.asarray(index.author),
        created_ts=np.asarray(index.created_ts),
        features=np.asarray(index.features),
        tweet_ids=np.asarray(index.tweet_ids),
        write_pos=np.asarray(index.write_pos),
        log_offset=np.asarray(log_offset, np.int64),
    )


def load_index(
    path: str,
    replay: Optional[Callable[[int], Tuple]] = None,
) -> Tuple[EarlybirdIndex, int]:
    """Load a flushed snapshot; if ``replay(offset)`` is given, it must
    return batched ingest args for log entries past ``offset`` (or None) —
    the Kafka catch-up of ``KafkaStartup.java``. Returns (index, offset
    after replay)."""
    with np.load(path) as z:
        index = EarlybirdIndex(
            tokens=jnp.asarray(z["tokens"]),
            author=jnp.asarray(z["author"]),
            created_ts=jnp.asarray(z["created_ts"]),
            features=jnp.asarray(z["features"]),
            tweet_ids=jnp.asarray(z["tweet_ids"]),
            write_pos=jnp.asarray(z["write_pos"]),
        )
        offset = int(z["log_offset"])
    if replay is not None:
        tail = replay(offset)
        if tail is not None:
            tokens, authors, ts, feats, ids, new_offset = tail
            if len(np.asarray(ids)):
                index = ingest(
                    index,
                    jnp.asarray(tokens), jnp.asarray(authors),
                    jnp.asarray(ts), jnp.asarray(feats), jnp.asarray(ids),
                )
            offset = new_offset
    return index, offset


# -- archive tier: realtime roll-off -------------------------------------------


def roll_expired(
    realtime: EarlybirdIndex,
    archive: EarlybirdIndex,
    *,
    now: int,
    retention_s: int,
) -> Tuple[EarlybirdIndex, EarlybirdIndex, int]:
    """Move documents older than the realtime retention into the archive
    tier (≡ the segment optimizer + ``EarlybirdIndexFlusher`` roll-off that
    keeps the realtime cluster at ~7 days and hands older segments to the
    full-archive cluster, ``src/java/com/twitter/search/README.md:15``).

    Host-side maintenance pass (the flusher is host-side in the reference
    too): expired live docs append into the archive ring via the normal
    ``ingest`` path, their realtime slots empty (author/tweet_id → PAD).
    Returns (new_realtime, new_archive, n_rolled).
    """
    author = np.asarray(realtime.author)
    ts = np.asarray(realtime.created_ts)
    live = author != int(PAD_ID)
    expired = live & (ts < int(now) - int(retention_s))
    n = int(expired.sum())
    if n == 0:
        return realtime, archive, 0
    sel = np.nonzero(expired)[0]
    archive = ingest(
        archive,
        realtime.tokens[sel],
        realtime.author[sel],
        realtime.created_ts[sel],
        realtime.features[sel],
        realtime.tweet_ids[sel],
    )
    exp = jnp.asarray(expired)
    realtime = realtime._replace(
        author=jnp.where(exp, PAD_ID, realtime.author),
        tweet_ids=jnp.where(exp, PAD_ID, realtime.tweet_ids),
    )
    return realtime, archive, n


# -- feature-update service ----------------------------------------------------


def apply_feature_updates(
    index: EarlybirdIndex,
    tweet_ids: jnp.ndarray,  # [B] external ids to update
    feature_idx: jnp.ndarray,  # [B] which doc-feature column
    values: jnp.ndarray,  # [B] new values
) -> EarlybirdIndex:
    """In-place engagement-counter updates keyed by tweet id.

    Ids not in the ring (already evicted — the reference drops these too)
    are ignored. One jittable batched scatter: slot lookup is an equality
    match over the id column (the ring is small enough that a [B, T] mask
    beats host round-trips for a slot map).
    """
    hit = index.tweet_ids[None, :] == tweet_ids[:, None]  # [B, T]
    slot = jnp.argmax(hit, axis=1)  # first match (ids unique in ring)
    found = hit.any(axis=1)
    T = index.capacity
    safe_slot = jnp.where(found, slot, T)  # drop misses
    features = index.features.at[safe_slot, feature_idx].set(
        values, mode="drop"
    )
    return index._replace(features=features)


def increment_feature(
    index: EarlybirdIndex,
    tweet_ids: jnp.ndarray,
    feature_idx: jnp.ndarray,
    deltas: jnp.ndarray,
) -> EarlybirdIndex:
    """Additive variant (fav_count += 1 streams)."""
    hit = index.tweet_ids[None, :] == tweet_ids[:, None]
    slot = jnp.argmax(hit, axis=1)
    found = hit.any(axis=1)
    safe_slot = jnp.where(found, slot, index.capacity)
    features = index.features.at[safe_slot, feature_idx].add(
        jnp.where(found, deltas, 0.0), mode="drop"
    )
    return index._replace(features=features)


# -- query cache ----------------------------------------------------------------


class QueryCache:
    """TTL + write-generation query cache (≡ ``earlybird/querycache/``).

    A cached entry is valid while (a) younger than ``ttl_s`` and (b) the
    index generation hasn't advanced past ``max_stale_writes`` ingests since
    the entry was stored — recency queries tolerate slightly stale results
    (the reference refreshes cached queries on a schedule, not per write).
    """

    def __init__(
        self,
        max_items: int = 1024,
        ttl_s: float = 5.0,
        max_stale_writes: int = 0,
        clock: Callable[[], float] = time.monotonic,
    ):
        self.max_items = max_items
        self.ttl_s = ttl_s
        self.max_stale_writes = max_stale_writes
        self._clock = clock
        self._generation = 0
        self._cache: "OrderedDict[Tuple, Tuple[float, int, object]]" = (
            OrderedDict()
        )
        self.hits = 0
        self.misses = 0

    def on_write(self, n_batches: int = 1) -> None:
        self._generation += n_batches

    def get_or_compute(self, key: Tuple, compute: Callable[[], object]):
        now = self._clock()
        entry = self._cache.get(key)
        if entry is not None:
            t, gen, value = entry
            if (
                now - t <= self.ttl_s
                and self._generation - gen <= self.max_stale_writes
            ):
                self._cache.move_to_end(key)
                self.hits += 1
                return value
            del self._cache[key]
        self.misses += 1
        value = compute()
        self._cache[key] = (now, self._generation, value)
        while len(self._cache) > self.max_items:
            self._cache.popitem(last=False)
        return value
