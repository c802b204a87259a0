"""Representation Manager (RMS): one facade for every embedding lookup.

≡ ``representation-manager/server/.../store/{User,Tweet,Topic}
SimClustersEmbeddingStore.scala`` + the client ``StoreBuilder``
(``representation-manager/client/.../StoreBuilder.scala``): a single typed
facade that serves SimClusters/TwHIN embeddings for users, tweets and topics
from underlying stores, with a cache layer in front of each store.

TPU re-design: the "underlying Manhattan store" is a device-resident
embedding table ([N, K] (cluster-id, score) pairs, row = entity); a multiget
is a batched gather (one XLA op) instead of an RPC fan-out. The memcache
layer survives as a host-side LRU+TTL cache at the serving edge — useful
because the serving front is host code batching requests *before* they hit
the device (mirroring ``CacheModule.scala`` in RMS/RSX/simclusters-ann).
"""

from __future__ import annotations

import dataclasses
import enum
import time
from collections import OrderedDict
from typing import Callable, Dict, Optional, Protocol, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from the_algorithm_tpu.core.metrics import NullStats, StatsReceiver
from the_algorithm_tpu.ops.sparse import PAD_ID, SparseEmbedding


class EntityKind(enum.Enum):
    """≡ thrift ``InternalId`` arms used by RMS columns."""

    USER = "user"
    TWEET = "tweet"
    TOPIC = "topic"


class EmbeddingKind(enum.Enum):
    """≡ thrift ``EmbeddingType`` values RMS serves
    (``src/thrift/com/twitter/simclusters_v2/embedding.thrift``)."""

    FAV_BASED_PRODUCER = "FavBasedProducer"
    FOLLOW_BASED_PRODUCER = "FollowBasedProducer"
    AGGREGATABLE_PRODUCER = "AggregatableLogFavBasedProducer"
    FAV_BASED_USER_INTERESTED_IN = "FavBasedUserInterestedIn"
    FOLLOW_BASED_USER_INTERESTED_IN = "FollowBasedUserInterestedIn"
    LOG_FAV_BASED_TWEET = "LogFavBasedTweet"
    FAV_TFG_TOPIC = "FavTfgTopic"
    LOG_FAV_BASED_KGO_TOPIC = "LogFavBasedKgoApeTopic"


@dataclasses.dataclass(frozen=True)
class EmbeddingId:
    """≡ ``SimClustersEmbeddingId`` (embedding.thrift): what × version × who."""

    kind: EmbeddingKind
    entity: EntityKind
    model_version: str = "20m145k2020"


class EmbeddingStore(Protocol):
    """A store serves a batch of entity ids → padded sparse embeddings."""

    def multiget(self, ids: np.ndarray) -> SparseEmbedding:  # [B] → [B, K]
        ...


class TableEmbeddingStore:
    """Device-resident embedding table; multiget = gather.

    ``row_of``: host-side entity-id → row mapping (dict). Missing ids get an
    all-PAD row (the reference returns ``None``/empty embedding on miss).
    """

    def __init__(
        self,
        cluster_ids: jnp.ndarray,  # [N, K] int32 (PAD_ID padded)
        scores: jnp.ndarray,  # [N, K] float32
        row_of: Dict[int, int],
    ):
        self.cluster_ids = cluster_ids
        self.scores = scores
        self.row_of = row_of
        self._k = int(cluster_ids.shape[1])

    @property
    def capacity(self) -> int:
        return self._k

    def multiget(self, ids: np.ndarray) -> SparseEmbedding:
        rows = np.asarray(
            [self.row_of.get(int(i), -1) for i in np.asarray(ids)], np.int32
        )
        present = rows >= 0
        safe = np.where(present, rows, 0)
        out_ids = jnp.asarray(self.cluster_ids)[safe]
        out_scores = jnp.asarray(self.scores)[safe]
        mask = jnp.asarray(present)[:, None]
        return SparseEmbedding(
            jnp.where(mask, out_ids, PAD_ID),
            jnp.where(mask, out_scores, 0.0),
        )


class CachedEmbeddingStore:
    """Host-side LRU+TTL cache in front of a store (the memcache layer).

    ≡ ``representation-manager`` cache modules: per-entity cached rows with
    a TTL; eviction is LRU at ``max_items``.
    """

    def __init__(
        self,
        underlying: EmbeddingStore,
        *,
        ttl_s: float = 600.0,
        max_items: int = 100_000,
        stats: Optional[StatsReceiver] = None,
        clock: Callable[[], float] = time.monotonic,
    ):
        self.underlying = underlying
        self.ttl_s = ttl_s
        self.max_items = max_items
        self.stats = (stats or NullStats()).scope("rms_cache")
        self._clock = clock
        self._cache: "OrderedDict[int, Tuple[float, np.ndarray, np.ndarray]]" = (
            OrderedDict()
        )

    def multiget(self, ids: np.ndarray) -> SparseEmbedding:
        ids = np.asarray(ids)
        now = self._clock()
        missing: list = []
        hit_rows: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        for i in ids:
            key = int(i)
            entry = self._cache.get(key)
            if entry is not None and now - entry[0] <= self.ttl_s:
                self._cache.move_to_end(key)
                hit_rows[key] = (entry[1], entry[2])
            else:
                missing.append(key)
        self.stats.counter("hits", len(ids) - len(missing))
        self.stats.counter("misses", len(missing))
        if missing:
            fetched = self.underlying.multiget(np.asarray(missing, np.int64))
            f_ids = np.asarray(fetched.ids)
            f_scores = np.asarray(fetched.scores)
            for j, key in enumerate(missing):
                self._cache[key] = (now, f_ids[j], f_scores[j])
                self._cache.move_to_end(key)
                hit_rows[key] = (f_ids[j], f_scores[j])
            while len(self._cache) > self.max_items:
                self._cache.popitem(last=False)
        out_ids = np.stack([hit_rows[int(i)][0] for i in ids])
        out_scores = np.stack([hit_rows[int(i)][1] for i in ids])
        return SparseEmbedding(jnp.asarray(out_ids), jnp.asarray(out_scores))


class RepresentationManager:
    """The facade: (EmbeddingId → store) registry with typed lookups.

    ≡ the RMS Strato column surface — every consumer (SANN source-embedding
    fetch, RSX pair scoring, TSPS topic relevance) resolves embeddings here.
    """

    def __init__(self, stats: Optional[StatsReceiver] = None):
        self._stores: Dict[EmbeddingId, EmbeddingStore] = {}
        self.stats = (stats or NullStats()).scope("rms")

    def register(self, eid: EmbeddingId, store: EmbeddingStore) -> None:
        self._stores[eid] = store

    def has(self, eid: EmbeddingId) -> bool:
        return eid in self._stores

    def multiget(self, eid: EmbeddingId, ids) -> SparseEmbedding:
        store = self._stores.get(eid)
        if store is None:
            raise KeyError(f"no store registered for {eid}")
        self.stats.counter(f"{eid.kind.value}/requests", len(ids))
        return store.multiget(np.asarray(ids))

    def get(self, eid: EmbeddingId, entity_id: int) -> SparseEmbedding:
        batch = self.multiget(eid, np.asarray([entity_id]))
        return SparseEmbedding(batch.ids[0], batch.scores[0])


def store_from_pairs(
    entity_ids: Sequence[int],
    cluster_ids: np.ndarray,  # [N, K]
    scores: np.ndarray,  # [N, K]
    *,
    cached: bool = False,
    ttl_s: float = 600.0,
) -> EmbeddingStore:
    """≡ client ``StoreBuilder`` convenience: build a (cached) table store."""
    row_of = {int(e): i for i, e in enumerate(entity_ids)}
    store: EmbeddingStore = TableEmbeddingStore(
        jnp.asarray(cluster_ids.astype(np.int32)),
        jnp.asarray(scores.astype(np.float32)),
        row_of,
    )
    if cached:
        store = CachedEmbeddingStore(store, ttl_s=ttl_s)
    return store
