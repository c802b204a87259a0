"""Streaming updates into the LIVE device-resident serve state.

≡ the reference's realtime ingestion loops, folded straight into the HBM
tables the batched product engine is serving from:

  - the Storm/Summingbird tweet job folding ~6K fav-events/s into the
    SimClusters serving indexes
    (``src/scala/com/twitter/simclusters_v2/summingbird/storm/TweetJob.scala:33-110``)
  - the Heron realtime aggregates
    (``timelines/data_processing/ml_util/aggregation_framework/heron/``)
  - the User Signal Service ingestion path (USS ring stores).

TPU-native shape: a **single writer** folds event micro-batches with jitted
programs (`lax.scan` per-event composition, batched row folds) producing a
NEW ``DeviceWideTables`` pytree whose untouched leaves alias the old ones,
then swaps the serve engine's table pointer atomically. In-flight serve
programs keep the snapshot they captured (programs are serialized on the
device stream); the next dispatch reads fresh state — the same
copy-on-write versioned-swap semantics as the native HNSW store. No
donation on the update programs: a concurrently-dispatching server thread
may still hold the previous pytree.

Freshness contract (tested in ``tests/test_live_updates.py``): an event
folded at T is visible to every request scored after the swap — the
candidate's aggregate features (and, after ``refresh_index``, its
retrieval rank) move in the very next request.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from the_algorithm_tpu.features import aggregation
from the_algorithm_tpu.features.user_signals import SignalType
from the_algorithm_tpu.mixers import device_hydration as dh
from the_algorithm_tpu.ops.sparse import PAD_ID, SparseEmbedding
from the_algorithm_tpu.simclusters import tweet_embeddings as te

# engagement label index (fs.ENGAGEMENT_LABELS order) per UUA-ish action
LABEL_OF_ACTION = {
    "fav": 0, "reply": 1, "retweet": 2, "quote": 3, "click": 4,
    "profile_click": 5, "video_view": 6, "share": 7, "bookmark": 8,
    "dwell": 9, "open_link": 10, "screenshot": 11, "report": 12,
    "negative_feedback": 13, "good_click": 14,
}
SIGNAL_OF_ACTION = {
    "fav": int(SignalType.TWEET_FAVORITE),
    "retweet": int(SignalType.RETWEET),
    "reply": int(SignalType.REPLY),
    "share": int(SignalType.TWEET_SHARE),
    "bookmark": int(SignalType.TWEET_BOOKMARK),
    "click": int(SignalType.TWEET_CLICK),
    "video_view": int(SignalType.TWEET_VIDEO_QUALITY_VIEW),
    "profile_click": int(SignalType.PROFILE_CLICK),
    "report": int(SignalType.TWEET_REPORT),
}
# rsx.SIGNAL_TYPES index per action (engagement-history kinds:
# fav, retweet, reply, share, original_tweet, video_playback)
ENG_OF_ACTION = {"fav": 0, "retweet": 1, "reply": 2, "share": 3,
                 "video_view": 5}


class UpdateBatch(NamedTuple):
    """One event micro-batch (stream order). -1 in an index column = skip
    that store for the event."""

    user_ids: np.ndarray  # [E] int64 raw viewer ids
    tweet_ids: np.ndarray  # [E] int64 raw tweet ids
    author_ids: np.ndarray  # [E] int64 raw author ids
    label_idx: np.ndarray  # [E] int32 → fs.ENGAGEMENT_LABELS
    signal_idx: np.ndarray  # [E] int32 → SignalType (-1 = none)
    eng_idx: np.ndarray  # [E] int32 → rsx.SIGNAL_TYPES (-1 = none)
    timestamps: np.ndarray  # [E] int32, non-decreasing


def batch_from_actions(
    events: Sequence[Tuple[int, int, int, str, int]],
) -> UpdateBatch:
    """[(user, tweet, author, action, ts), ...] → UpdateBatch."""
    E = len(events)
    out = UpdateBatch(
        np.empty(E, np.int64), np.empty(E, np.int64), np.empty(E, np.int64),
        np.empty(E, np.int32), np.empty(E, np.int32), np.empty(E, np.int32),
        np.empty(E, np.int32),
    )
    for i, (u, t, a, action, ts) in enumerate(events):
        out.user_ids[i] = u
        out.tweet_ids[i] = t
        out.author_ids[i] = a
        out.label_idx[i] = LABEL_OF_ACTION.get(action, 0)
        out.signal_idx[i] = SIGNAL_OF_ACTION.get(action, -1)
        out.eng_idx[i] = ENG_OF_ACTION.get(action, -1)
        out.timestamps[i] = ts
    return out


# the serve stores an engagement event touches (key builders get the batch)
_STORE_KEYS = {
    "tweet_agg": lambda b: (b.tweet_ids, None),
    "author_agg": lambda b: (b.author_ids, None),
    "user_author_agg": lambda b: (b.user_ids, b.author_ids),
    "user_agg": lambda b: (b.user_ids, None),
}


class LiveUpdater:
    """Single-writer streaming updater over a serve engine's HBM tables.

    ``scorer``: a :class:`DeviceHydrationScorer` (or anything exposing a
    ``tables`` DeviceWideTables attribute and a ``builder`` with the
    aggregate-store resolvers). ``group`` must match the stores' stored
    layout (defaults to the serve schema's rollup spec).

    Optionally owns the realtime tweet-embedding state feeding the SANN
    serving index (``emb_state`` + ``user_interests``); ``refresh_index``
    rebuilds the cluster→tweet index from it (the ClusterTopKTweetsNode
    rebuild), to be swapped into the retrieval source.
    """

    def __init__(
        self,
        scorer,
        *,
        group: Optional[aggregation.AggregateGroup] = None,
        emb_state: Optional[te.TweetEmbeddingState] = None,
        user_interests: Optional[SparseEmbedding] = None,
        emb_config: Optional[te.TweetEmbeddingConfig] = None,
        num_clusters: Optional[int] = None,
        stats=None,
    ):
        from the_algorithm_tpu.mixers import wide_hydrators as wh

        self.scorer = scorer
        self.group = group or wh.make_aggregate_group("live")
        self.stats = stats
        self.events_applied = 0

        # store slot index within DeviceWideTables.agg_values
        order = (*dh.CAND_KEYED_AGG, *dh.VIEWER_KEYED_AGG)
        self._slot = {n: order.index(n) for n in _STORE_KEYS}

        grp = self.group

        def fold(values, last_ts, rows, label_onehot, ts):
            st = aggregation.AggregateStore(values, last_ts)
            new = aggregation.update(
                grp, st, rows,
                jnp.ones((rows.shape[0], 1), jnp.float32),
                label_onehot, ts)
            return new.values, new.last_ts

        self._fold = jax.jit(fold)
        self._ring_push = jax.jit(_ring_push)
        self._eng_push = jax.jit(_eng_push)

        self.emb_state = emb_state
        self.emb_config = emb_config or te.TweetEmbeddingConfig()
        self.num_clusters = num_clusters
        self._user_interests = user_interests
        if emb_state is not None and user_interests is not None:
            self._apply_favs = jax.jit(functools.partial(
                te.apply_fav_events, config=self.emb_config))
            self._build_index = jax.jit(functools.partial(
                te.build_cluster_index, num_clusters=num_clusters,
                config=self.emb_config))

    # -- one micro-batch -----------------------------------------------------

    def apply(self, batch: UpdateBatch) -> Dict[str, int]:
        """Fold one event micro-batch into the live tables and swap.

        Returns per-subsystem applied-event counts.
        """
        tables = self.scorer.tables
        resolvers = self.scorer.builder.resolvers
        E = len(batch.user_ids)
        # pin the small event arrays to the TABLES' device: an uncommitted
        # operand under a host default_device would otherwise pull the
        # committed HBM tables to the host on every fold (measured r4:
        # half-GB/call through the tunnel)
        try:
            dev = next(iter(tables.uss_ids.devices()))
        except Exception:
            dev = None

        def pin(x):
            a = jnp.asarray(x)
            return jax.device_put(a, dev) if dev is not None else a

        ts_dev = pin(np.asarray(batch.timestamps, np.int32))
        onehot = np.zeros((E, len(self.group.labels)), np.float32)
        onehot[np.arange(E), np.clip(batch.label_idx, 0, None)] = 1.0
        onehot_dev = pin(onehot)

        agg_values = list(tables.agg_values)
        agg_last = list(tables.agg_last_ts)
        counts = {}
        for name, key_of in _STORE_KEYS.items():
            si = self._slot[name]
            k0, k1 = key_of(batch)
            keys = (list(zip(k0.tolist(), k1.tolist())) if k1 is not None
                    else [(int(k),) for k in k0])
            try:
                rows = resolvers[name].resolve(keys)
            except KeyError:
                # store capacity exhausted: fold only events whose key
                # already owns a row (the reference's realtime stores
                # shed the same way under key-space pressure)
                rows = resolvers[name].lookup(keys)
            cap = int(agg_values[si].shape[0])
            ok = (rows >= 0) & (rows < cap)
            safe_rows = pin(np.where(ok, rows, 0).astype(np.int32))
            # masked events fold a zero label-vector (no-op on values);
            # row 0's last_ts still advances — acceptable for a serving
            # store (decay-to-now is monotone), counted for observability
            oh = jnp.where(pin(ok)[:, None], onehot_dev, 0.0)
            v, l = self._fold(agg_values[si], agg_last[si], safe_rows,
                              oh, ts_dev)
            agg_values[si], agg_last[si] = v, l
            counts[name] = int(ok.sum())

        # USS rings + RSX engagement history (viewer-keyed, modulo rows)
        U_s = tables.uss_ids.shape[0]
        u_s = pin((batch.user_ids % U_s).astype(np.int32))
        uss_ids, uss_ts = self._ring_push(
            tables.uss_ids, tables.uss_ts, u_s,
            pin(np.asarray(batch.signal_idx, np.int32)),
            pin((batch.tweet_ids.astype(np.int64) % (1 << 31))
                .astype(np.int32)),
            ts_dev)
        U_e = tables.eng_ids.shape[0]
        u_e = pin((batch.user_ids % U_e).astype(np.int32))
        eng_ids, eng_type, eng_ts, eng_valid = self._eng_push(
            tables.eng_ids, tables.eng_type, tables.eng_ts,
            tables.eng_valid, u_e,
            pin(np.asarray(batch.eng_idx, np.int32)),
            pin((batch.tweet_ids.astype(np.int64) % (1 << 31))
                .astype(np.int32)),
            ts_dev)

        # realtime tweet embeddings (feeds the SANN index refresh)
        if self.emb_state is not None and self._user_interests is not None:
            T = self.emb_state.cluster_ids.shape[0]
            U_i = self._user_interests.ids.shape[0]
            self.emb_state = self._apply_favs(
                self.emb_state, self._user_interests,
                pin((batch.user_ids % U_i).astype(np.int32)),
                pin((batch.tweet_ids % T).astype(np.int32)),
                ts_dev)

        # atomic pointer swap: in-flight serves keep their snapshot
        self.scorer.tables = tables._replace(
            agg_values=tuple(agg_values), agg_last_ts=tuple(agg_last),
            uss_ids=uss_ids, uss_ts=uss_ts,
            eng_ids=eng_ids, eng_type=eng_type, eng_ts=eng_ts,
            eng_valid=eng_valid,
        )
        self.events_applied += E
        if self.stats is not None:
            self.stats.counter("live_update_events", E)
        counts["events"] = E
        return counts

    def refresh_index(self, now: int):
        """Rebuild the cluster→tweet serving index from the live embedding
        state (≡ the ClusterTopKTweetsNode refresh). Caller swaps the
        result into its retrieval source."""
        if self.emb_state is None:
            raise RuntimeError("LiveUpdater built without emb_state")
        return self._build_index(self.emb_state, now=jnp.int32(now))


def _ring_push(ids, tss, u, s, t, ts):
    """[U, S, W] newest-first ring push, one event per scan step
    (stream-order composition for duplicate (u, s) within the batch)."""

    def step(carry, ev):
        cid, cts = carry
        u_, s_, t_, ts_ = ev
        ok = s_ >= 0
        s_safe = jnp.maximum(s_, 0)
        row_ids = cid[u_, s_safe]
        row_ts = cts[u_, s_safe]
        new_ids = jnp.where(
            ok, jnp.concatenate([t_[None], row_ids[:-1]]), row_ids)
        new_ts = jnp.where(
            ok, jnp.concatenate([ts_[None], row_ts[:-1]]), row_ts)
        return (cid.at[u_, s_safe].set(new_ids),
                cts.at[u_, s_safe].set(new_ts)), ()

    (ids, tss), _ = jax.lax.scan(step, (ids, tss), (u, s, t, ts))
    return ids, tss


def _eng_push(eids, etype, ets, evalid, u, kind, t, ts):
    """[U, E] engagement-history push (id, type, ts, valid) newest-first."""

    def step(carry, ev):
        cid, cty, cts, cva = carry
        u_, k_, t_, ts_ = ev
        ok = k_ >= 0
        row = cid[u_]
        new_id = jnp.where(ok, jnp.concatenate([t_[None], row[:-1]]), row)
        rowt = cty[u_]
        new_ty = jnp.where(ok, jnp.concatenate([k_[None], rowt[:-1]]), rowt)
        rows = cts[u_]
        new_ts = jnp.where(ok, jnp.concatenate([ts_[None], rows[:-1]]), rows)
        rowv = cva[u_]
        new_va = jnp.where(
            ok, jnp.concatenate([jnp.ones((1,), rowv.dtype), rowv[:-1]]),
            rowv)
        return (cid.at[u_].set(new_id), cty.at[u_].set(new_ty),
                cts.at[u_].set(new_ts), cva.at[u_].set(new_va)), ()

    (eids, etype, ets, evalid), _ = jax.lax.scan(
        step, (eids, etype, ets, evalid), (u, kind, t, ts))
    return eids, etype, ets, evalid
