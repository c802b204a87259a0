"""The heavy-ranker feature schema + columnar feature store.

≡ home-mixer's ~6000-feature hydration width (``home-mixer/README.md:22-24``,
109 shared + ~30 scored-tweets hydrators under
``functional_component/feature_hydrator/``) and the segdense slot mapping
that densifies them for the model (``navi/segdense/src/mapper.rs``).

TPU-first re-design: hydrators emit **columnar** blocks — ``{name: [B] or
[B, K] numpy array}`` per candidate batch — into a per-request
:class:`ColumnarFeatureStore`; the scorer assembles the model's [B, F]
matrix with pure numpy column stacking and searchsorted id-alignment.
No per-candidate (or per-candidate-per-feature) Python loop touches the
hot path.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Mapping, Sequence, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class FeatureSpec:
    """One schema entry: a scalar (width=1) or a vector feature family."""

    name: str
    width: int = 1


def expand(schema: Sequence[FeatureSpec]) -> List[str]:
    """Flat column names (vector features expand name_0..name_{K-1})."""
    out: List[str] = []
    for s in schema:
        if s.width == 1:
            out.append(s.name)
        else:
            out.extend(f"{s.name}_{i}" for i in range(s.width))
    return out


def total_width(schema: Sequence[FeatureSpec]) -> int:
    return sum(s.width for s in schema)


class ColumnarFeatureStore:
    """Per-request accumulator of vectorized hydrator outputs.

    Blocks are keyed by candidate id, so assembly stays correct after
    filters shrink or reorder the candidate list between hydration and
    scoring (the engine runs globalFilters after hydration,
    ``RecommendationPipelineConfig.scala:57-201``).
    """

    def __init__(self):
        # name -> (sorted_ids [N], values [N] or [N, K])
        self._columns: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}

    def add(self, ids: np.ndarray, columns: Mapping[str, np.ndarray]) -> None:
        ids = np.asarray(ids, np.int64)
        order = np.argsort(ids, kind="stable")
        sorted_ids = ids[order]
        for name, col in columns.items():
            col = np.asarray(col)
            if col.shape[0] != ids.shape[0]:
                raise ValueError(
                    f"column '{name}' has {col.shape[0]} rows for "
                    f"{ids.shape[0]} ids"
                )
            self._columns[name] = (sorted_ids, col[order])

    def names(self) -> List[str]:
        return sorted(self._columns)

    def gather(self, name: str, ids: np.ndarray) -> np.ndarray:
        """Rows for ``ids`` (zeros where absent) — vectorized id-alignment."""
        ids = np.asarray(ids, np.int64)
        entry = self._columns.get(name)
        if entry is None:
            return np.zeros((ids.shape[0],), np.float32)
        sorted_ids, vals = entry
        pos = np.searchsorted(sorted_ids, ids)
        pos = np.clip(pos, 0, sorted_ids.shape[0] - 1)
        found = sorted_ids[pos] == ids
        out = vals[pos].astype(np.float32, copy=True)
        out[~found] = 0.0
        return out

    def assemble(
        self, ids: np.ndarray, schema: Sequence[FeatureSpec]
    ) -> np.ndarray:
        """[B, total_width] matrix in schema order (pure numpy)."""
        ids = np.asarray(ids, np.int64)
        cols: List[np.ndarray] = []
        for spec in schema:
            col = self.gather(spec.name, ids)
            if col.ndim == 1:
                col = col[:, None]
            if col.shape[1] != spec.width:
                fixed = np.zeros((ids.shape[0], spec.width), np.float32)
                w = min(spec.width, col.shape[1])
                fixed[:, :w] = col[:, :w]
                col = fixed
            cols.append(col)
        return np.concatenate(cols, axis=1) if cols else np.zeros((len(ids), 0), np.float32)


# -- columnar hydrator base ----------------------------------------------------


def store_of(query) -> ColumnarFeatureStore:
    """The per-request store, created lazily on ``query.features``."""
    store = query.features.get("columnar_store")
    if store is None:
        store = query.features["columnar_store"] = ColumnarFeatureStore()
    return store


def peek_store(query):
    features = getattr(query, "features", None)
    if not isinstance(features, Mapping):
        return None
    return features.get("columnar_store")


class ColumnarFeatureHydrator:
    """A FeatureHydrator that emits vectorized column blocks into the
    request's :class:`ColumnarFeatureStore` instead of per-candidate dicts.

    Subclasses implement :meth:`hydrate_columns` returning
    ``{name: [B] or [B, K] array}`` for the batch — one vectorized (often
    jitted) call, never a per-candidate loop.
    """

    @property
    def name(self) -> str:
        return type(self).__name__

    def hydrate(self, query, candidates, params) -> None:
        if not candidates:
            return
        ids = np.asarray([c.id for c in candidates], np.int64)
        cols = self.hydrate_columns(query, ids, candidates, params)
        store_of(query).add(ids, cols)

    def hydrate_columns(self, query, ids, candidates, params):
        raise NotImplementedError


# -- the wide schema (≥1000 features across the reference's major families) ---
#
# Family constants are shared with mixers/wide_hydrators.py so the schema and
# the hydrator outputs can never drift apart.

EB_DOC_FEATURES = (
    "fav_count", "reply_count", "retweet_count", "quote_count",
    "bookmark_count", "created_ts", "text_score", "user_rep",
    "has_image", "has_video", "has_card", "has_url", "is_reply",
    "is_retweet", "is_quote", "num_hashtags", "num_mentions",
    "link_language", "language_match", "prev_user_tweet_engagement",
    "from_verified_account", "is_trend_tweet", "has_multiple_media",
    "tweet_age_hours", "parus_score", "from_blue_verified_account",
    "num_likes_root", "num_replies_root", "conversation_depth",
    "is_self_thread",
)
ENGAGEMENT_LABELS = (
    "fav", "reply", "retweet", "quote", "click", "profile_click",
    "video_view", "share", "bookmark", "dwell", "open_link", "screenshot",
    "report", "negative_feedback", "good_click",
)
AGG_HALFLIVES_S = (1800.0, 86400.0, 7 * 86400.0, 50 * 86400.0)
AGG_HALFLIFE_NAMES = ("30m", "1d", "7d", "50d")
TWEET_AGG_METRICS = ("count", "sum", "mean")
# count-only keyed crosses beyond user×author (full-metric)
PAIR_AGG_PREFIXES = (
    "user_author_oon_agg", "user_engager_agg", "user_mention_agg",
    "user_original_author_agg", "user_topic_agg", "user_list_agg",
    "user_dow_agg", "user_hour_agg",
)
AUTHOR_META_FEATURES = (
    "author_follower_count_log", "author_following_count_log",
    "author_account_age_days", "author_is_verified",
)
CONTEXT_FEATURES = (
    "retrieval_score", "social_proof", "author_id", "created_ts",
    "is_in_network", "topic_relevance",
)


def build_wide_schema() -> List[FeatureSpec]:
    """The default wide heavy-ranker schema (~1k flat features).

    Families mirror the reference hydrator families (feature_hydrator/*):
    Earlybird doc features, RealGraph edges, TwHIN user/author/tweet,
    SimClusters engagement similarity (RSX), large user/author embeddings,
    media CLIP clusters, tweet/author/viewer aggregates, USS signal counts,
    GFS intersections, social-proof and context features.
    """
    from the_algorithm_tpu.features import graph_features, user_signals
    from the_algorithm_tpu.features import representation_scorer as rsx
    from the_algorithm_tpu.graph import realgraph

    schema: List[FeatureSpec] = []
    # earlybird doc features (EarlybirdFeatureHydrator)
    schema += [FeatureSpec(f"eb_{n}") for n in EB_DOC_FEATURES]
    # realgraph edge features (RealGraphQueryFeatureHydrator family)
    for t in realgraph.INTERACTION_TYPES:
        schema.append(FeatureSpec(f"realgraph_{t}_decayed"))
    schema += [
        FeatureSpec("realgraph_days_since"),
        FeatureSpec("realgraph_score"),
        FeatureSpec("realgraph_p_interaction"),
    ]
    # twhin embeddings (TwhinUser*/TwhinAuthorFollow hydrators)
    schema.append(FeatureSpec("twhin_user", 64))
    schema.append(FeatureSpec("twhin_author", 64))
    schema.append(FeatureSpec("twhin_tweet", 64))
    # RSX engagement-similarity features (SimClustersEngagementSimilarity…):
    # signal × window × {min,avg,max}, matching representation_scorer's block
    for sig in rsx.SIGNAL_TYPES:
        for w in rsx.WINDOWS_S:
            for agg in ("min", "avg", "max"):
                schema.append(FeatureSpec(f"rsx_{sig}_{w}_{agg}"))
    # large embeddings (user interests / author aggregates)
    schema.append(FeatureSpec("user_interests_emb", 128))
    schema.append(FeatureSpec("author_agg_emb", 128))
    # media CLIP clusters (MediaClusterFeatureHydrator)
    schema.append(FeatureSpec("media_clip_clusters", 64))
    # tweet text embedding (TweetTextEmbedding hydrator family)
    schema.append(FeatureSpec("text_emb", 128))
    # aggregates: tweet × label × metric × halflife (aggregation framework)
    for label in ENGAGEMENT_LABELS:
        for metric in TWEET_AGG_METRICS:
            for hl in AGG_HALFLIFE_NAMES:
                schema.append(FeatureSpec(f"tweet_agg_{label}_{metric}_{hl}"))
    # aggregates: author × label × halflife (count only — the author rollup)
    for label in ENGAGEMENT_LABELS:
        for hl in AGG_HALFLIFE_NAMES:
            schema.append(FeatureSpec(f"author_agg_{label}_count_{hl}"))
    # aggregates: viewer × label × halflife
    for label in ENGAGEMENT_LABELS:
        for hl in AGG_HALFLIFE_NAMES:
            schema.append(FeatureSpec(f"user_agg_{label}_count_{hl}"))
    # pair/keyed aggregate crosses (TimelinesAggregationConfigDetails:
    # user×author with full metrics, user×author out-of-network, and the
    # user×{engager,mention,original-author,topic,list,day-of-week,hour}
    # keyed groups — the reference's big feature mass)
    for label in ENGAGEMENT_LABELS:
        for metric in TWEET_AGG_METRICS:
            for hl in AGG_HALFLIFE_NAMES:
                schema.append(
                    FeatureSpec(f"user_author_agg_{label}_{metric}_{hl}"))
    for prefix in PAIR_AGG_PREFIXES:
        for label in ENGAGEMENT_LABELS:
            for hl in AGG_HALFLIFE_NAMES:
                schema.append(FeatureSpec(f"{prefix}_{label}_count_{hl}"))
    # USS signal counts per signal type (UserSignalService, 17 types)
    for sig in user_signals.SignalType:
        schema.append(FeatureSpec(f"uss_{sig.name.lower()}_count_90d"))
    # graph feature service intersections (canonical GFS pairs + normalized)
    for n in graph_features.FEATURE_PAIRS:
        schema.append(FeatureSpec(n))
        schema.append(FeatureSpec(n + "_normalized"))
    # author reputation + account meta + follow relation
    schema.append(FeatureSpec("tweepcred"))
    schema += [FeatureSpec(n) for n in AUTHOR_META_FEATURES]
    schema += [
        FeatureSpec("viewer_follows_author"),
        FeatureSpec("author_follows_viewer"),
    ]
    # retrieval/context scalars lifted from the candidate object model
    schema += [FeatureSpec(n) for n in CONTEXT_FEATURES]
    return schema


WIDE_SCHEMA = build_wide_schema()
