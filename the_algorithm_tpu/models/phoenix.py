"""Phoenix: user-action-sequence transformer scorer ("predict next actions").

The reference's current-gen heavy scorer is Phoenix — home-mixer sends the
viewer's aggregated action sequence plus the candidate set to a
``RecsysPredictor.predictNextActions`` gRPC cluster and reads back
per-candidate per-action probabilities
(``home-mixer/server/.../functional_component/scorer/PhoenixScorer.scala``,
``util/PhoenixUtils.scala:34-100`` — MaxCandidates=1400, TopLogProbsNum=50;
request = CandidateSet(userId, TweetInfo*) + user action sequence). The
model itself is external to the reference repo; this module supplies the
TPU-native equivalent.

Architecture (TPU-first): a causal pre-LN transformer encodes the action
history — each history token embeds (action, author-hash, age-bucket) — and
every candidate forms a query token (author-hash + bool-feature embedding)
that cross-attends into the encoded history; a shared head projects each
candidate readout to ``len(ActionVocab)`` logits = p(next action | user
history, candidate). Everything is static-shape bf16 matmuls (MXU) with
f32 accumulation at logits; history length and candidate count are padded
to fixed sizes and masked.

History assembly ≡ ``UserActionsQueryFeatureHydrator.scala``: raw UUA
events are aggregated into 5-minute windows, newest-last, truncated to
``max_length`` (reference maxLength=1024, windowTimeMs=300000).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class ActionName(enum.IntEnum):
    """≡ com.x.user_action_sequence.ActionName (subset used by the Phoenix
    head registry, ``PhoenixPredictedScoreFeature.scala``)."""

    PAD = 0
    SERVER_TWEET_FAV = 1
    SERVER_TWEET_REPLY = 2
    SERVER_TWEET_RETWEET = 3
    SERVER_TWEET_QUOTE = 4
    CLIENT_TWEET_CLICK = 5
    CLIENT_TWEET_PHOTO_EXPAND = 6
    CLIENT_TWEET_CLICK_PROFILE = 7
    CLIENT_TWEET_VIDEO_QUALITY_VIEW = 8
    CLIENT_TWEET_SHARE = 9
    CLIENT_TWEET_SHARE_VIA_COPY_LINK = 10
    CLIENT_TWEET_CLICK_SEND_VIA_DIRECT_MESSAGE = 11
    CLIENT_TWEET_RECAP_DWELLED = 12
    CLIENT_TWEET_OPEN_LINK = 13
    CLIENT_TWEET_TAKE_SCREENSHOT = 14
    CLIENT_TWEET_BOOKMARK = 15
    CLIENT_TWEET_NOT_INTERESTED_IN = 16
    CLIENT_TWEET_BLOCK_AUTHOR = 17
    CLIENT_TWEET_MUTE_AUTHOR = 18
    CLIENT_TWEET_REPORT = 19
    SERVER_USER_FOLLOW = 20
    CLIENT_TWEET_VIDEO_WATCH_TIME = 21
    IMPRESSION = 22


NUM_ACTIONS = len(ActionName)


class UserActionSequence(NamedTuple):
    """Fixed-length aggregated action history (newest-last, left-padded)."""

    action_ids: jnp.ndarray  # [L] int32 (ActionName)
    author_hashes: jnp.ndarray  # [L] int32 in [0, author_buckets)
    age_s: jnp.ndarray  # [L] int32 seconds before `now`
    valid: jnp.ndarray  # [L] bool


class CandidateFeatures(NamedTuple):
    """≡ TweetInfo + TweetBoolFeatures (PhoenixUtils.getTweetInfoFromCandidates)."""

    author_hashes: jnp.ndarray  # [C] int32
    bool_features: jnp.ndarray  # [C, NUM_BOOL_FEATURES] float32 {0,1}
    valid: jnp.ndarray  # [C] bool


BOOL_FEATURES = ("is_retweet", "is_reply", "is_quote", "is_for_you", "is_promoted")
NUM_BOOL_FEATURES = len(BOOL_FEATURES)

AGE_BUCKET_BOUNDS_S = (60, 300, 900, 3600, 4 * 3600, 24 * 3600, 7 * 86400)


@dataclasses.dataclass(frozen=True)
class PhoenixConfig:
    d_model: int = 256
    n_layers: int = 4
    n_heads: int = 8
    mlp_ratio: int = 4
    max_history: int = 256  # reference aggregates to maxLength=1024
    author_buckets: int = 1 << 16
    dtype: str = "bfloat16"

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


def _attend(q, k, v, mask, dtype):
    """Standard scaled dot-product attention with additive mask [..., Tq, Tk]."""
    d = q.shape[-1]
    logits = jnp.einsum("...qhd,...khd->...hqk", q, k).astype(jnp.float32)
    logits = logits / np.sqrt(d) + mask
    w = jax.nn.softmax(logits, axis=-1).astype(dtype)
    return jnp.einsum("...hqk,...khd->...qhd", w, v)


class Block(nn.Module):
    n_heads: int
    dtype: jnp.dtype
    causal: bool

    @nn.compact
    def __call__(self, x, valid):
        # x: [L, D]; valid: [L]
        L, D = x.shape
        H = self.n_heads
        h = nn.LayerNorm(dtype=jnp.float32)(x).astype(self.dtype)
        qkv = nn.Dense(3 * D, use_bias=False, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv.reshape(L, 3 * H, D // H), 3, axis=1)
        mask = jnp.where(valid[None, None, :], 0.0, -1e9)  # [1, 1, L]
        if self.causal:
            causal = jnp.tril(jnp.ones((L, L), bool))
            mask = mask + jnp.where(causal[None], 0.0, -1e9)
        a = _attend(q, k, v, mask, self.dtype).reshape(L, D)
        x = x + nn.Dense(D, use_bias=False, dtype=self.dtype, name="proj")(a)
        h = nn.LayerNorm(dtype=jnp.float32)(x).astype(self.dtype)
        h = nn.Dense(4 * D, dtype=self.dtype, name="mlp_up")(h)
        h = nn.gelu(h)
        x = x + nn.Dense(D, dtype=self.dtype, name="mlp_down")(h)
        return x


class PhoenixModel(nn.Module):
    """History encoder + candidate cross-attention readout → action logits."""

    config: PhoenixConfig

    @nn.compact
    def __call__(
        self, seq: UserActionSequence, cands: CandidateFeatures
    ) -> jnp.ndarray:
        cfg = self.config
        dt = cfg.compute_dtype
        D = cfg.d_model

        act_emb = nn.Embed(NUM_ACTIONS, D, dtype=dt, name="action_emb")
        auth_emb = nn.Embed(cfg.author_buckets, D, dtype=dt, name="author_emb")
        age_emb = nn.Embed(len(AGE_BUCKET_BOUNDS_S) + 1, D, dtype=dt, name="age_emb")
        pos_emb = self.param(
            "pos_emb", nn.initializers.normal(0.02), (cfg.max_history, D)
        )

        age_bucket = jnp.searchsorted(
            jnp.asarray(AGE_BUCKET_BOUNDS_S, jnp.int32), seq.age_s
        )
        x = (
            act_emb(seq.action_ids)
            + auth_emb(seq.author_hashes % cfg.author_buckets)
            + age_emb(age_bucket)
            + pos_emb.astype(dt)
        )
        for i in range(cfg.n_layers):
            x = Block(cfg.n_heads, dt, causal=True, name=f"enc_{i}")(x, seq.valid)
        x = nn.LayerNorm(dtype=jnp.float32, name="enc_ln")(x).astype(dt)  # [L, D]

        # candidate query tokens
        cq = auth_emb(cands.author_hashes % cfg.author_buckets) + nn.Dense(
            D, dtype=dt, name="bool_proj"
        )(cands.bool_features.astype(dt))
        cq = nn.LayerNorm(dtype=jnp.float32, name="cand_ln")(cq).astype(dt)  # [C, D]

        # cross attention: candidates read the encoded history
        H = cfg.n_heads
        q = nn.Dense(D, use_bias=False, dtype=dt, name="xq")(cq).reshape(
            -1, H, D // H
        )
        k = nn.Dense(D, use_bias=False, dtype=dt, name="xk")(x).reshape(
            -1, H, D // H
        )
        v = nn.Dense(D, use_bias=False, dtype=dt, name="xv")(x).reshape(
            -1, H, D // H
        )
        mask = jnp.where(seq.valid[None, None, :], 0.0, -1e9)
        r = _attend(q, k, v, mask, dt).reshape(-1, D)
        r = r + cq
        h = nn.Dense(D, dtype=dt, name="head_mlp")(
            nn.LayerNorm(dtype=jnp.float32, name="head_ln")(r).astype(dt)
        )
        h = nn.gelu(h)
        logits = nn.Dense(NUM_ACTIONS, dtype=jnp.float32, name="action_head")(
            h.astype(jnp.float32)
        )
        return logits  # [C, NUM_ACTIONS]


def predict_next_actions(
    model: PhoenixModel, params, seq: UserActionSequence, cands: CandidateFeatures
) -> jnp.ndarray:
    """[C, NUM_ACTIONS] per-candidate action probabilities (masked rows 0)."""
    probs = jax.nn.sigmoid(model.apply(params, seq, cands))
    return probs * cands.valid[:, None]


def multi_action_loss(
    logits: jnp.ndarray,  # [C, A]
    labels: jnp.ndarray,  # [C, A] {0,1} observed next actions
    valid: jnp.ndarray,  # [C]
) -> jnp.ndarray:
    ce = (
        jnp.maximum(logits, 0.0)
        - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    ce = ce * valid[:, None]
    return jnp.sum(ce) / jnp.maximum(jnp.sum(valid) * logits.shape[-1], 1.0)


# -- history assembly (host side) ---------------------------------------------

WINDOW_MS = 5 * 60 * 1000  # UserActionsQueryFeatureHydrator windowTimeMs


def aggregate_history(
    events: Sequence[Tuple[int, int, int]],  # (ts_ms, action_id, author_hash)
    *,
    now_ms: int,
    max_length: int,
    exclude_dwells: bool = False,
) -> Dict[str, np.ndarray]:
    """Raw events → aggregated fixed-length arrays.

    ≡ AggregationProcessor(AggregationConfig(windowTimeMs=5min, maxLength,
    AggregationAlgorithmV1)): events of the same (action, author) inside one
    5-minute window collapse to one aggregated action; newest `max_length`
    kept, newest-last; optional dwell exclusion (the dense variant's
    ``filterDwells``).
    """
    dwells = {
        int(ActionName.CLIENT_TWEET_RECAP_DWELLED),
    }
    seen = set()
    agg = []
    for ts_ms, action_id, author in sorted(events):
        if exclude_dwells and action_id in dwells:
            continue
        key = (ts_ms // WINDOW_MS, action_id, author)
        if key in seen:
            continue
        seen.add(key)
        agg.append((ts_ms, action_id, author))
    agg = agg[-max_length:]
    L = max_length
    action_ids = np.zeros(L, np.int32)
    author_hashes = np.zeros(L, np.int32)
    age_s = np.zeros(L, np.int32)
    valid = np.zeros(L, bool)
    off = L - len(agg)
    for i, (ts_ms, action_id, author) in enumerate(agg):
        action_ids[off + i] = action_id
        author_hashes[off + i] = author
        age_s[off + i] = max(0, (now_ms - ts_ms) // 1000)
        valid[off + i] = True
    return {
        "action_ids": action_ids,
        "author_hashes": author_hashes,
        "age_s": age_s,
        "valid": valid,
    }
