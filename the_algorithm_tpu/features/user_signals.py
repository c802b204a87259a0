"""User Signal Service (USS): centralized engagement-signal store.

≡ ``user-signal-service/server/.../signals/`` + ``RETREIVAL_SIGNALS.md:7-27``:
one fetch surface for explicit signals (follows, favs, retweets, replies,
shares, bookmarks) and implicit ones (clicks, video views, profile visits,
notification opens) plus negative signals — each a (targetId, timestamp)
stream per user, consumed by tweet-mixer/cr-mixer source-signal extraction
and RSX's engagement fetch.

TPU-native shape: signals live in fixed-width per-user device tables
([U, S, W] target ids + timestamps per signal type) maintained by the host
feed; ``fetch`` gathers and time-filters in-graph.
"""

from __future__ import annotations

import enum
from typing import Dict, NamedTuple, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from the_algorithm_tpu.ops.sparse import PAD_ID


class SignalType(enum.IntEnum):
    """≡ RETREIVAL_SIGNALS.md signal inventory (17 types)."""

    ACCOUNT_FOLLOW = 0
    REPEATED_PROFILE_VISIT = 1
    TWEET_FAVORITE = 2
    RETWEET = 3
    REPLY = 4
    TWEET_SHARE = 5
    TWEET_BOOKMARK = 6
    ORIGINAL_TWEET = 7
    TWEET_CLICK = 8
    TWEET_VIDEO_OPEN = 9
    TWEET_VIDEO_QUALITY_VIEW = 10
    NOTIFICATION_OPEN = 11
    PROFILE_CLICK = 12
    ACCOUNT_MUTE = 13
    ACCOUNT_BLOCK = 14
    TWEET_REPORT = 15
    TWEET_DONT_LIKE = 16


NEGATIVE_SIGNALS = {
    SignalType.ACCOUNT_MUTE,
    SignalType.ACCOUNT_BLOCK,
    SignalType.TWEET_REPORT,
    SignalType.TWEET_DONT_LIKE,
}


class SignalStore(NamedTuple):
    """[U, S, W] ring-buffered signals: newest-first per (user, signal)."""

    target_ids: jnp.ndarray  # int32, PAD_ID padded
    timestamps: jnp.ndarray  # int32

    @property
    def width(self) -> int:
        return self.target_ids.shape[2]


def init_store(num_users: int, width: int = 64) -> SignalStore:
    S = len(SignalType)
    return SignalStore(
        jnp.full((num_users, S, width), PAD_ID, jnp.int32),
        jnp.zeros((num_users, S, width), jnp.int32),
    )


def record(
    store: SignalStore,
    user_ids: np.ndarray,
    signal_types: np.ndarray,
    target_ids: np.ndarray,
    timestamps: np.ndarray,
) -> SignalStore:
    """Host-side batch append (newest-first shift). Events in time order."""
    tids = np.asarray(store.target_ids).copy()
    ts = np.asarray(store.timestamps).copy()
    for u, s, t, tm in zip(user_ids, signal_types, target_ids, timestamps):
        tids[u, s, 1:] = tids[u, s, :-1]
        ts[u, s, 1:] = ts[u, s, :-1]
        tids[u, s, 0] = t
        ts[u, s, 0] = tm
    return SignalStore(jnp.asarray(tids), jnp.asarray(ts))


def fetch(
    store: SignalStore,
    user_id: jnp.ndarray,
    signal_type: SignalType,
    *,
    min_timestamp: Optional[jnp.ndarray] = None,
):
    """(target_ids[W], timestamps[W], valid[W]) for one user+signal."""
    ids = store.target_ids[user_id, int(signal_type)]
    ts = store.timestamps[user_id, int(signal_type)]
    valid = ids != PAD_ID
    if min_timestamp is not None:
        valid = valid & (ts >= min_timestamp)
    return ids, ts, valid


def fetch_engagement_tweets(
    store: SignalStore,
    user_id: jnp.ndarray,
    signal_types: Sequence[SignalType],
    min_timestamp: Optional[jnp.ndarray] = None,
):
    """Concatenated positive tweet engagements — RSX's USS fetch
    (``twistlyfeatures/UserSignalServiceRecentEngagementsClient.scala``)."""
    all_ids, all_ts, all_valid, all_type = [], [], [], []
    for st in signal_types:
        ids, ts, valid = fetch(store, user_id, st, min_timestamp=min_timestamp)
        all_ids.append(ids)
        all_ts.append(ts)
        all_valid.append(valid)
        all_type.append(jnp.full(ids.shape, int(st), jnp.int32))
    return (
        jnp.concatenate(all_ids),
        jnp.concatenate(all_ts),
        jnp.concatenate(all_valid),
        jnp.concatenate(all_type),
    )
