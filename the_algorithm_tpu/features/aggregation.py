"""Timelines aggregation framework: grouped decayed-counter features.

≡ ``timelines/data_processing/ml_util/aggregation_framework/`` — an
``AggregateGroup`` is (keys × features × labels × metrics × half-lives)
(``AggregateGroup.scala``, ``TypedAggregateGroup.scala``); metrics are
count/sum/sumsq/max/latest (``metrics/*.scala``) with exponential half-life
decay (``metrics/AggregationMetricCommon.toDecayedValue:21``); outputs feed
the heavy ranker as DataRecord features (Timelines configs:
``TimelinesAggregationConfigDetails.scala``, realtime variant
``real_time/TimelinesOnlineAggregationConfigBase.scala``).

TPU design: each group is a device-resident [capacity, n_outputs] float32
table plus per-row last-update timestamps; updates are scatter-adds with
decay folded in, reads decay to `now` — both jittable. Key→row assignment
(the "group by" of the Scalding/Heron jobs) happens on the host via a dict
(the memcache-key analog).
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

METRICS = ("count", "sum", "sumsq", "max", "latest", "last_reset")


@dataclasses.dataclass(frozen=True)
class AggregateGroup:
    """≡ ``AggregateGroup.scala``: the cross-product spec."""

    name: str
    features: Tuple[str, ...]  # continuous inputs (e.g. "fav_count")
    labels: Tuple[str, ...]  # binary conditions (e.g. "is_favorited"); "any" = unconditioned
    metrics: Tuple[str, ...] = ("count", "sum")
    half_lives_s: Tuple[float, ...] = (50 * 86400.0,)  # 50-day default

    def output_names(self) -> List[str]:
        """≡ TypedAggregateGroup feature naming."""
        out = []
        for f, l, m, hl in itertools.product(
            self.features, self.labels, self.metrics, self.half_lives_s
        ):
            out.append(f"{self.name}.{f}.{l}.{m}.{_hl_name(hl)}")
        return out

    @property
    def n_outputs(self) -> int:
        return (
            len(self.features)
            * len(self.labels)
            * len(self.metrics)
            * len(self.half_lives_s)
        )


def _hl_name(hl: float) -> str:
    return f"{int(hl // 86400)}d" if hl >= 86400 else f"{int(hl)}s"


class AggregateStore(NamedTuple):
    values: jnp.ndarray  # [capacity, n_outputs]
    last_ts: jnp.ndarray  # [capacity] int32


def init_store(group: AggregateGroup, capacity: int) -> AggregateStore:
    return AggregateStore(
        jnp.zeros((capacity, group.n_outputs), jnp.float32),
        jnp.zeros((capacity,), jnp.int32),
    )


def _layout(group: AggregateGroup):
    """index math: output column for (f_idx, l_idx, m_idx, h_idx)."""
    nl, nm, nh = len(group.labels), len(group.metrics), len(group.half_lives_s)

    def col(f, l, m, h):
        return ((f * nl + l) * nm + m) * nh + h

    return col


def update(
    group: AggregateGroup,
    store: AggregateStore,
    row_ids: jnp.ndarray,  # [B] int32 pre-resolved key rows
    feature_values: jnp.ndarray,  # [B, F]
    label_values: jnp.ndarray,  # [B, L] in {0,1}
    timestamps: jnp.ndarray,  # [B] int32 (non-decreasing)
) -> AggregateStore:
    """Fold an event batch into the store (decay at each touched row).

    Decays each touched row to the batch max timestamp then adds the batch's
    contributions (events within the batch are treated as simultaneous at
    batch time — the realtime Heron job's micro-batching semantics).
    """
    now = jnp.max(timestamps)
    B = row_ids.shape[0]
    F, L = len(group.features), len(group.labels)
    M, H = len(group.metrics), len(group.half_lives_s)

    # per-(feature, metric) event values [B, F, M], gated per label and
    # broadcast over half-lives — one einsum instead of a per-column loop
    # (layout col = ((f*L + l)*M + m)*H + h matches _layout)
    base_cols = []
    for metric in group.metrics:
        if metric == "count":
            base_cols.append(jnp.ones_like(feature_values))
        elif metric in ("sum", "max", "latest"):
            base_cols.append(feature_values)
        elif metric == "sumsq":
            base_cols.append(feature_values * feature_values)
        elif metric == "last_reset":
            # value := the event timestamp (≡ LastResetMetric: when the
            # label last fired)
            base_cols.append(
                jnp.broadcast_to(
                    timestamps.astype(jnp.float32)[:, None],
                    feature_values.shape))
        else:
            raise ValueError(f"unsupported metric {metric}")
    base = jnp.stack(base_cols, axis=-1)  # [B, F, M]
    gated = jnp.einsum("bfm,bl->bflm", base, label_values)  # [B, F, L, M]
    contrib = jnp.broadcast_to(
        gated[..., None], (B, F, L, M, H)
    ).reshape(B, group.n_outputs)
    def metric_mask(pred):
        flags = np.asarray([pred(m) for m in group.metrics])
        return jnp.asarray(
            np.broadcast_to(
                flags[None, None, :, None], (F, L, M, H)
            ).reshape(group.n_outputs)
        )

    is_max = metric_mask(lambda m: m == "max")
    # set-semantics metrics (LatestMetric / LastResetMetric): the batch
    # winner per (row, label) is the LAST qualifying event — found with a
    # scatter-max of batch position, then only the winner's contribution
    # lands (a batched analog of the reference's per-event set)
    is_set = metric_mask(lambda m: m in ("latest", "last_reset"))

    # decay touched rows to `now` per half-life column
    hl_cols = jnp.asarray(
        [
            group.half_lives_s[h]
            for f in range(F)
            for l in range(L)
            for m in range(len(group.metrics))
            for h in range(len(group.half_lives_s))
        ],
        jnp.float32,
    )
    dt = (now - store.last_ts[row_ids]).astype(jnp.float32)  # [B]
    decay = jnp.exp2(-dt[:, None] / hl_cols[None, :])  # [B, n_outputs]

    # set-semantics metrics don't decay: undo the decay on their columns
    decay = jnp.where(is_set[None, :], 1.0, decay)
    old_rows = store.values[row_ids] * decay
    # additive metrics scatter-add; max metrics scatter-max
    add_contrib = jnp.where(is_max[None, :] | is_set[None, :], 0.0, contrib)
    max_contrib = jnp.where(is_max[None, :], contrib, -jnp.inf)

    values = store.values.at[row_ids].set(old_rows)
    values = values.at[row_ids].add(add_contrib)
    values = values.at[row_ids].max(max_contrib)

    if bool(np.any(np.asarray([m in ("latest", "last_reset")
                               for m in group.metrics]))):
        # winner position per (row, label): the last event in the batch
        # whose label fired for that row
        pos = jnp.arange(B, dtype=jnp.int32)  # event order within batch
        fired = label_values > 0  # [B, L]
        pos_gated = jnp.where(fired, pos[:, None], -1)  # [B, L]
        cap = store.values.shape[0]
        winner = jnp.full((cap, L), -1, jnp.int32).at[row_ids].max(
            pos_gated)  # [cap, L]
        is_winner = (pos_gated >= 0) & (
            pos_gated == winner[row_ids])  # [B, L]
        win_mask = jnp.broadcast_to(
            is_winner[:, None, :, None, None], (B, F, L, M, H)
        ).reshape(B, group.n_outputs) & is_set[None, :]
        fired_mask = jnp.broadcast_to(
            fired[:, None, :, None, None], (B, F, L, M, H)
        ).reshape(B, group.n_outputs) & is_set[None, :]
        # REPLACE semantics as clear-then-max: first drive the fired
        # (row, label) set-columns to -inf (a smaller new latest must
        # still win), then max in exactly the winner's value
        values = values.at[row_ids].min(
            jnp.where(fired_mask, -jnp.inf, jnp.inf))
        values = values.at[row_ids].max(
            jnp.where(win_mask, contrib, -jnp.inf))
    last_ts = store.last_ts.at[row_ids].set(now.astype(jnp.int32))
    return AggregateStore(values, last_ts)


def read(
    group: AggregateGroup,
    store: AggregateStore,
    row_ids: jnp.ndarray,  # [B]
    now: jnp.ndarray,
) -> jnp.ndarray:
    """[B, n_outputs] decayed to ``now`` — the DataRecord hydration read."""
    col = _layout(group)
    F, L = len(group.features), len(group.labels)
    hl_cols = jnp.asarray(
        [
            group.half_lives_s[h]
            for f in range(F)
            for l in range(L)
            for m in range(len(group.metrics))
            for h in range(len(group.half_lives_s))
        ],
        jnp.float32,
    )
    dt = (now - store.last_ts[row_ids]).astype(jnp.float32)
    decay = jnp.exp2(-dt[:, None] / hl_cols[None, :])
    M = len(group.metrics)
    set_m = np.asarray([m in ("latest", "last_reset")
                        for m in group.metrics])
    if set_m.any():  # set-semantics columns read undecayed
        H = len(group.half_lives_s)
        is_set = jnp.asarray(np.broadcast_to(
            set_m[None, None, :, None], (F, L, M, H)
        ).reshape(group.n_outputs))
        decay = jnp.where(is_set[None, :], 1.0, decay)
    return store.values[row_ids] * decay


class KeyResolver:
    """Host-side key→row assignment (the group-by / memcache-key layer)."""

    def __init__(self, capacity: int):
        self.capacity = capacity
        self._map: Dict[Tuple, int] = {}

    def resolve(self, keys: Sequence[Tuple]) -> np.ndarray:
        """Write-path resolution: unknown keys allocate a new row."""
        out = np.empty(len(keys), np.int32)
        for i, k in enumerate(keys):
            if k not in self._map:
                if len(self._map) >= self.capacity:
                    raise KeyError("aggregate store capacity exhausted")
                self._map[k] = len(self._map)
            out[i] = self._map[k]
        return out

    def lookup(self, keys: Sequence[Tuple]) -> np.ndarray:
        """Read-path resolution: unknown keys → -1, NO allocation (serving
        reads must not consume store rows — fresh tweets/authors simply have
        no aggregates yet)."""
        out = np.empty(len(keys), np.int32)
        for i, k in enumerate(keys):
            out[i] = self._map.get(k, -1)
        return out

    @staticmethod
    def _encode(k0: np.ndarray, k1: Optional[np.ndarray]) -> np.ndarray:
        k0 = np.asarray(k0, np.int64)
        if k1 is None:
            return k0
        # pairs pack as k0·2³² + (k1 mod 2³²) — unique for int32-domain keys
        return k0 * (1 << 32) + (np.asarray(k1, np.int64) & 0xFFFFFFFF)

    def lookup_vec(
        self, k0: np.ndarray, k1: Optional[np.ndarray] = None
    ) -> np.ndarray:
        """Vectorized read-path lookup for 1- or 2-int key columns.

        The serve path resolves ~18 stores × ~1.5k candidates per request;
        per-key dict gets cost more than the feature math. A sorted encoded
        index (rebuilt lazily when the map grows) turns the whole column
        into one ``searchsorted``.
        """
        if getattr(self, "_enc_n", -1) != len(self._map):
            items = list(self._map.items())
            codes = np.empty(len(items), np.int64)
            rows = np.empty(len(items), np.int32)
            for i, (k, r) in enumerate(items):
                codes[i] = (k[0] if len(k) == 1
                            else k[0] * (1 << 32) + (k[1] & 0xFFFFFFFF))
                rows[i] = r
            order = np.argsort(codes)
            self._enc_codes = codes[order]
            self._enc_rows = rows[order]
            self._enc_n = len(items)
        want = self._encode(k0, k1)
        if self._enc_n == 0:
            return np.full(want.shape[0], -1, np.int32)
        pos = np.searchsorted(self._enc_codes, want)
        pos = np.clip(pos, 0, self._enc_n - 1)
        hit = self._enc_codes[pos] == want
        return np.where(hit, self._enc_rows[pos], -1).astype(np.int32)
