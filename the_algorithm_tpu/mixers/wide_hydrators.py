"""Wide columnar home-mixer hydrators — the full-width hydration catalog.

≡ the reference hydrator library (``home-mixer/server/.../functional_component/
feature_hydrator/`` — 109 shared + ~30 scored-tweets hydrators feeding the
~6000-feature heavy ranker, ``home-mixer/README.md:22-24``). Each class here
covers one reference hydrator *family* with one vectorized batch call that
emits a columnar block into the request's
:class:`~the_algorithm_tpu.mixers.feature_schema.ColumnarFeatureStore`; the
scorer assembles the [B, F] model matrix by pure column stacking. Together
they populate every family of :data:`feature_schema.WIDE_SCHEMA` (1056
flat features). No per-candidate(-per-feature) Python loop runs on the
vector path.

Family ↔ reference mapping:

- :class:`EarlybirdDocColumnarHydrator`   ≡ ``EarlybirdFeatureHydrator.scala``
  (in-index doc features, 30 columns)
- :class:`RealGraphColumnarHydrator`      ≡ ``RealGraphQueryFeatureHydrator`` /
  ``RealGraphViewerAuthorFeatureHydrator`` (per-edge-type decayed counts +
  p(interaction))
- :class:`TwhinColumnarHydrator`          ≡ TwhinUser/TwhinAuthorFollow/tweet
  embedding hydrators (3 × 64-d)
- :class:`RsxColumnarHydrator`            ≡ ``SimClustersEngagementSimilarity
  FeatureHydrator.scala`` (signal × window × min/avg/max)
- :class:`EmbeddingTableColumnarHydrator` ≡ the large-embedding hydrators
  (UserLargeEmbeddings / AuthorLargeAggregates / MediaCluster / TweetText)
- :class:`DecayedAggregatesColumnarHydrator` ≡ aggregation-framework
  DataRecord hydration (tweet / author / viewer rollups)
- :class:`UssSignalCountColumnarHydrator` ≡ USS signal-count hydration
- :class:`GfsColumnarHydrator`            ≡ GFS two-hop intersections
- :class:`AuthorMetaColumnarHydrator`     ≡ author account-meta + tweepcred +
  follow-relation hydrators
- :class:`CandidateLiftColumnarHydrator`  — bridge lifting retrieval-time
  scalars already on the candidate object model into columns
"""

from __future__ import annotations

from typing import Callable, Dict, List, Mapping, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from the_algorithm_tpu.features import aggregation, graph_features, user_signals
from the_algorithm_tpu.features import representation_scorer as rsx
from the_algorithm_tpu.graph import realgraph
from the_algorithm_tpu.mixers import feature_schema as fs
from the_algorithm_tpu.ops import sparse
from the_algorithm_tpu.ops.sparse import PAD_ID


def _author_ids(candidates) -> np.ndarray:
    return np.asarray(
        [int(c.features.get("author_id", -1)) for c in candidates], np.int64
    )


class EarlybirdDocColumnarHydrator(fs.ColumnarFeatureHydrator):
    """In-index Earlybird doc features, 30 columns per candidate.

    ``doc_fn(ids [B]) -> {name: [B]}`` over :data:`fs.EB_DOC_FEATURES`
    (the earlybird index's per-doc feature read, ``search/earlybird.py``).
    """

    def __init__(self, doc_fn: Callable[[np.ndarray], Mapping[str, np.ndarray]]):
        self._doc_fn = doc_fn

    def hydrate_columns(self, query, ids, candidates, params):
        block = self._doc_fn(ids)
        return {f"eb_{n}": np.asarray(block[n]) for n in fs.EB_DOC_FEATURES}


class RealGraphColumnarHydrator(fs.ColumnarFeatureHydrator):
    """Viewer→author RealGraph edge features.

    Matches each candidate author against the viewer's neighbor row with a
    [B, D] equality mask matmul (one MXU-shaped op), yielding per-edge-type
    decayed counts, days-since-interaction, and the p(interaction) model
    score (``graph/realgraph.py``).
    """

    def __init__(self, table: realgraph.EdgeTable, model_params):
        self._table = table
        self._params = model_params

    def hydrate_columns(self, query, ids, candidates, params):
        uid = int(query.user_id) % int(self._table.neighbor_ids.shape[0])
        now = int(getattr(query, "now", 0))
        nbrs = np.asarray(self._table.neighbor_ids[uid])  # [D]
        # per-user decay only — the whole-table edge_features(table, now)
        # would multiply [U, D, F] per request just to slice one row
        dt = max(now - int(self._table.last_ts[uid]), 0)
        decay = float(np.exp2(-dt / realgraph.DEFAULT_HALF_LIFE_S))
        decayed = np.asarray(self._table.counts[uid]) * decay  # [D, F]
        authors = _author_ids(candidates)
        match = (authors[:, None] == nbrs[None, :]).astype(np.float32)  # [B, D]
        feats = match @ decayed  # [B, F]
        p = np.asarray(
            realgraph.predict_edge_scores(self._params, jnp.asarray(feats))
        )
        days = float(
            max(int(getattr(query, "now", 0)) - int(self._table.last_ts[uid]), 0)
        ) / 86400.0
        cols: Dict[str, np.ndarray] = {
            f"realgraph_{t}_decayed": feats[:, i]
            for i, t in enumerate(realgraph.INTERACTION_TYPES)
        }
        has_edge = match.sum(axis=1) > 0
        cols["realgraph_days_since"] = np.where(has_edge, days, 0.0).astype(
            np.float32
        )
        cols["realgraph_score"] = feats.sum(axis=1)
        cols["realgraph_p_interaction"] = np.where(has_edge, p, 0.0).astype(
            np.float32
        )
        return cols


class TwhinColumnarHydrator(fs.ColumnarFeatureHydrator):
    """TwHIN dense embeddings: viewer (broadcast), author, tweet — 3×64."""

    def __init__(
        self,
        user_table: np.ndarray,  # [U, 64]
        author_table: np.ndarray,  # [A, 64]
        tweet_table: np.ndarray,  # [T, 64]
    ):
        self._u = np.asarray(user_table, np.float32)
        self._a = np.asarray(author_table, np.float32)
        self._t = np.asarray(tweet_table, np.float32)

    def hydrate_columns(self, query, ids, candidates, params):
        B = ids.shape[0]
        u = self._u[int(query.user_id) % self._u.shape[0]]
        authors = _author_ids(candidates) % self._a.shape[0]
        tweets = ids % self._t.shape[0]
        return {
            "twhin_user": np.broadcast_to(u, (B, u.shape[0])),
            "twhin_author": self._a[authors],
            "twhin_tweet": self._t[tweets],
        }


class RsxColumnarHydrator(fs.ColumnarFeatureHydrator):
    """RSX block: cosine(candidate, viewer's recent engagements) aggregated
    signal × window × {min,avg,max} — 36 columns, one jitted call."""

    def __init__(
        self,
        tweet_embedding_fn,  # ids [B] -> SparseEmbedding [B, K]
        engagement_fn,  # user_id -> rsx.EngagementSet
    ):
        self._emb = tweet_embedding_fn
        self._eng = engagement_fn

    def hydrate_columns(self, query, ids, candidates, params):
        cand_emb = self._emb(ids)
        engagements = self._eng(query.user_id)
        block = rsx.engagement_similarity_features(
            cand_emb, engagements, jnp.int32(getattr(query, "now", 0))
        )
        return {f"rsx_{n}": np.asarray(v) for n, v in block.items()}


class EmbeddingTableColumnarHydrator(fs.ColumnarFeatureHydrator):
    """Generic [N, K] embedding-table gather, keyed by tweet id, author id,
    or the viewer (broadcast) — covers the large-embedding hydrator family."""

    def __init__(self, name: str, table: np.ndarray, key: str = "tweet"):
        assert key in ("tweet", "author", "viewer")
        self._name = name
        self._table = np.asarray(table, np.float32)
        self._key = key

    @property
    def name(self) -> str:
        return f"EmbeddingTableColumnarHydrator[{self._name}]"

    def hydrate_columns(self, query, ids, candidates, params):
        N = self._table.shape[0]
        if self._key == "tweet":
            rows = self._table[ids % N]
        elif self._key == "author":
            rows = self._table[_author_ids(candidates) % N]
        else:
            rows = np.broadcast_to(
                self._table[int(query.user_id) % N],
                (ids.shape[0], self._table.shape[1]),
            )
        return {self._name: rows}


_AGG_LABEL_NAMES = fs.ENGAGEMENT_LABELS
_AGG_HL = fs.AGG_HALFLIVES_S
_AGG_HL_NAMES = fs.AGG_HALFLIFE_NAMES


def make_aggregate_group(name: str) -> aggregation.AggregateGroup:
    """The wide-schema rollup spec: engagement value × 15 labels ×
    (count, sum) × 4 half-lives (mean is derived at hydration)."""
    return aggregation.AggregateGroup(
        name=name,
        features=("engagement",),
        labels=_AGG_LABEL_NAMES,
        metrics=("count", "sum"),
        half_lives_s=_AGG_HL,
    )


class DecayedAggregatesColumnarHydrator(fs.ColumnarFeatureHydrator):
    """Decayed aggregate rollups read from the aggregation framework.

    ``key`` selects the entity: per-tweet (count/sum/mean), per-author,
    per-viewer (broadcast), or a pair/keyed cross — "viewer_author",
    "viewer_original_author", "viewer_engager", "viewer_mention",
    "viewer_topic" (candidate-feature second key), "viewer_list" (query
    key), "viewer_dow"/"viewer_hour" (request-time key) — matching the
    TimelinesAggregationConfigDetails keyed groups. Column order inside the
    store row follows :func:`aggregation._layout` for
    ``features=('engagement',)``: ``col = (label*2 + metric)*4 + hl``.
    """

    _PAIR_FEATURE_KEYS = {
        "viewer_author": "author_id",
        "viewer_original_author": "original_author_id",
        "viewer_engager": "engager_id",
        "viewer_mention": "mentioned_user_id",
        "viewer_topic": "topic_id",
    }

    def __init__(
        self,
        group: aggregation.AggregateGroup,
        store: aggregation.AggregateStore,
        resolver: aggregation.KeyResolver,
        key: str,
        prefix: str,  # "tweet_agg" | "author_agg" | "user_agg" | pair prefix
        with_mean: bool = False,
    ):
        assert key in ("tweet", "author", "viewer", "viewer_list",
                       "viewer_dow", "viewer_hour",
                       *self._PAIR_FEATURE_KEYS)
        self._group = group
        self._store = store
        self._resolver = resolver
        self._key = key
        self._prefix = prefix
        self._with_mean = with_mean

    @property
    def name(self) -> str:
        return f"DecayedAggregatesColumnarHydrator[{self._prefix}]"

    def hydrate_columns(self, query, ids, candidates, params):
        uid = int(getattr(query, "user_id", 0))
        now = int(getattr(query, "now", 0))
        if self._key == "tweet":
            keys = [(int(i),) for i in ids]
        elif self._key == "author":
            keys = [(int(a),) for a in _author_ids(candidates)]
        elif self._key == "viewer":
            keys = [(uid,)]
        elif self._key == "viewer_list":
            keys = [(uid, int(getattr(query, "list_id", -1) or -1))]
        elif self._key == "viewer_dow":
            keys = [(uid, (now // 86400) % 7)]
        elif self._key == "viewer_hour":
            keys = [(uid, (now // 3600) % 24)]
        else:  # pair keyed on a per-candidate feature
            feat = self._PAIR_FEATURE_KEYS[self._key]
            default = ("author_id" if self._key == "viewer_original_author"
                       else None)
            keys = []
            for c in candidates:
                second = c.features.get(feat)
                if second is None and default is not None:
                    second = c.features.get(default)
                keys.append((uid, int(second) if second is not None else -1))
        # read path: never allocate — unknown keys read as zero rows
        rows = self._resolver.lookup(keys)
        known = rows >= 0
        block = np.asarray(
            aggregation.read(
                self._group,
                self._store,
                jnp.asarray(np.where(known, rows, 0)),
                jnp.int32(getattr(query, "now", 0)),
            )
        )  # [len(keys), L*2*H]
        block = np.where(known[:, None], block, 0.0)
        if len(keys) == 1 and ids.shape[0] != 1:  # query-keyed → broadcast
            block = np.broadcast_to(block[0], (ids.shape[0], block.shape[1]))
        H = len(_AGG_HL)
        cols: Dict[str, np.ndarray] = {}
        for li, label in enumerate(_AGG_LABEL_NAMES):
            for hi, hl in enumerate(_AGG_HL_NAMES):
                count = block[:, (li * 2 + 0) * H + hi]
                cols[f"{self._prefix}_{label}_count_{hl}"] = count
                if self._with_mean:
                    ssum = block[:, (li * 2 + 1) * H + hi]
                    cols[f"{self._prefix}_{label}_sum_{hl}"] = ssum
                    cols[f"{self._prefix}_{label}_mean_{hl}"] = ssum / np.maximum(
                        count, 1.0
                    )
        return cols


class UssSignalCountColumnarHydrator(fs.ColumnarFeatureHydrator):
    """Viewer signal counts per SignalType over a window (broadcast) — the
    USS count features (17 columns)."""

    def __init__(
        self, store: user_signals.SignalStore, window_s: int = 90 * 86400
    ):
        self._store = store
        self._window_s = window_s

    def hydrate_columns(self, query, ids, candidates, params):
        B = ids.shape[0]
        now = int(getattr(query, "now", 0))
        uid = int(query.user_id) % int(self._store.target_ids.shape[0])
        # one device fetch + one reduction for ALL 17 signal types
        # (per-type fetch loops would pay 17 serial round-trips per request)
        t_ids = self._store.target_ids[uid]  # [S, W]
        t_ts = self._store.timestamps[uid]
        counts = np.asarray(jnp.sum(
            (t_ids != PAD_ID) & (t_ts >= now - self._window_s), axis=-1
        ))  # [S]
        return {
            f"uss_{st.name.lower()}_count_90d": np.full(
                B, float(counts[int(st)]), np.float32
            )
            for st in user_signals.SignalType
        }


class GfsColumnarHydrator(fs.ColumnarFeatureHydrator):
    """GFS two-hop intersections (canonical pairs + normalized) — 8 cols."""

    def __init__(self, tables: graph_features.GraphTables):
        self._tables = tables

    def hydrate_columns(self, query, ids, candidates, params):
        block = graph_features.feature_block(
            self._tables,
            jnp.int32(int(query.user_id) % self._tables.num_users),
            jnp.asarray(
                _author_ids(candidates).clip(min=0) % self._tables.num_users,
                jnp.int32,
            ),
        )
        return {n: np.asarray(v) for n, v in block.items()}


class AuthorMetaColumnarHydrator(fs.ColumnarFeatureHydrator):
    """Author reputation + account meta + viewer↔author follow relation.

    ``meta`` is a [U, 4] table in :data:`fs.AUTHOR_META_FEATURES` order;
    follow relations come from the query's followed set and an optional
    reverse-follow set.
    """

    def __init__(
        self,
        tweepcred: np.ndarray,  # [U]
        meta: np.ndarray,  # [U, 4]
        followers_of_viewer_fn: Optional[Callable[[int], frozenset]] = None,
    ):
        self._rep = np.asarray(tweepcred, np.float32)
        self._meta = np.asarray(meta, np.float32)
        self._followers_fn = followers_of_viewer_fn

    def hydrate_columns(self, query, ids, candidates, params):
        authors = _author_ids(candidates)
        safe = authors.clip(min=0) % self._rep.shape[0]
        ok = authors >= 0
        cols: Dict[str, np.ndarray] = {
            "tweepcred": np.where(ok, self._rep[safe], 0.0).astype(np.float32)
        }
        meta_rows = self._meta[safe % self._meta.shape[0]]
        for j, n in enumerate(fs.AUTHOR_META_FEATURES):
            cols[n] = np.where(ok, meta_rows[:, j], 0.0).astype(np.float32)
        followed = np.asarray(
            sorted(int(a) for a in getattr(query, "followed_authors", ())),
            np.int64,
        )
        cols["viewer_follows_author"] = np.isin(authors, followed).astype(
            np.float32
        )
        if self._followers_fn is not None:
            back = np.asarray(
                sorted(self._followers_fn(int(query.user_id))), np.int64
            )
            cols["author_follows_viewer"] = np.isin(authors, back).astype(
                np.float32
            )
        else:
            cols["author_follows_viewer"] = np.zeros(len(authors), np.float32)
        return cols


class CandidateLiftColumnarHydrator(fs.ColumnarFeatureHydrator):
    """Bridge: lift retrieval-time scalars already on the candidate object
    model (source scores, social proof, context) into columns. One list
    comprehension per *name* (~6), not per candidate-feature pair."""

    def __init__(self, names: Sequence[str] = fs.CONTEXT_FEATURES):
        self._names = tuple(names)

    def hydrate_columns(self, query, ids, candidates, params):
        cols = {}
        for n in self._names:
            cols[n] = np.asarray(
                [float(c.features.get(n) or 0.0) for c in candidates],
                np.float32,
            )
        return cols


# -- catalog assembly ----------------------------------------------------------


def build_wide_hydrators(
    *,
    doc_fn,
    realgraph_table,
    realgraph_params,
    twhin_user,
    twhin_author,
    twhin_tweet,
    tweet_embedding_fn,
    engagement_fn,
    user_interests_table,
    author_agg_table,
    media_cluster_table,
    text_embedding_table,
    tweet_agg: Tuple[aggregation.AggregateStore, aggregation.KeyResolver],
    author_agg: Tuple[aggregation.AggregateStore, aggregation.KeyResolver],
    user_agg: Tuple[aggregation.AggregateStore, aggregation.KeyResolver],
    signal_store,
    gfs_tables,
    tweepcred,
    author_meta,
    followers_of_viewer_fn=None,
    pair_aggs: Optional[Mapping[str, Tuple]] = None,
) -> List[fs.ColumnarFeatureHydrator]:
    """All hydrators needed to populate the full WIDE_SCHEMA.

    ``pair_aggs``: prefix → (store, resolver) for the keyed crosses
    ("user_author_agg" + :data:`feature_schema.PAIR_AGG_PREFIXES`).
    """
    pair_hydrators: List[fs.ColumnarFeatureHydrator] = []
    if pair_aggs:
        key_of = {
            "user_author_agg": "viewer_author",
            "user_author_oon_agg": "viewer_author",
            "user_engager_agg": "viewer_engager",
            "user_mention_agg": "viewer_mention",
            "user_original_author_agg": "viewer_original_author",
            "user_topic_agg": "viewer_topic",
            "user_list_agg": "viewer_list",
            "user_dow_agg": "viewer_dow",
            "user_hour_agg": "viewer_hour",
        }
        for prefix, (store, resolver) in pair_aggs.items():
            pair_hydrators.append(DecayedAggregatesColumnarHydrator(
                make_aggregate_group(prefix), store, resolver,
                key=key_of[prefix], prefix=prefix,
                with_mean=(prefix == "user_author_agg"),
            ))
    return pair_hydrators + [
        EarlybirdDocColumnarHydrator(doc_fn),
        RealGraphColumnarHydrator(realgraph_table, realgraph_params),
        TwhinColumnarHydrator(twhin_user, twhin_author, twhin_tweet),
        RsxColumnarHydrator(tweet_embedding_fn, engagement_fn),
        EmbeddingTableColumnarHydrator(
            "user_interests_emb", user_interests_table, key="viewer"
        ),
        EmbeddingTableColumnarHydrator(
            "author_agg_emb", author_agg_table, key="author"
        ),
        EmbeddingTableColumnarHydrator(
            "media_clip_clusters", media_cluster_table, key="tweet"
        ),
        EmbeddingTableColumnarHydrator(
            "text_emb", text_embedding_table, key="tweet"
        ),
        DecayedAggregatesColumnarHydrator(
            make_aggregate_group("tweet_agg"), tweet_agg[0], tweet_agg[1],
            key="tweet", prefix="tweet_agg", with_mean=True,
        ),
        DecayedAggregatesColumnarHydrator(
            make_aggregate_group("author_agg"), author_agg[0], author_agg[1],
            key="author", prefix="author_agg",
        ),
        DecayedAggregatesColumnarHydrator(
            make_aggregate_group("user_agg"), user_agg[0], user_agg[1],
            key="viewer", prefix="user_agg",
        ),
        UssSignalCountColumnarHydrator(signal_store),
        GfsColumnarHydrator(gfs_tables),
        AuthorMetaColumnarHydrator(
            tweepcred, author_meta, followers_of_viewer_fn
        ),
        CandidateLiftColumnarHydrator(),
    ]


# -- deterministic synthetic world (test/bench/demo fixture) --------------------


def synthetic_world(
    seed: int = 0,
    *,
    num_users: int = 64,
    num_authors: int = 64,
    num_tweets: int = 1 << 14,
    realgraph_degree: int = 16,
    num_clusters: int = 256,
    clusters_per_tweet: int = 8,
    engagement_width: int = 16,
    gfs_degree: int = 8,
    now: int = 10_000_000,
) -> Dict:
    """Keyword args for :func:`build_wide_hydrators`, all tables seeded
    deterministically — the fixture used by tests and the wide-scoring bench.
    Feature values per id are pure functions of (seed, id) so oracle checks
    can recompute any cell independently.
    """
    rng = np.random.default_rng(seed)

    def doc_fn(ids: np.ndarray) -> Dict[str, np.ndarray]:
        ids = np.asarray(ids, np.int64)
        return {
            n: np.sin(0.001 * ids * (j + 1)).astype(np.float32)
            for j, n in enumerate(fs.EB_DOC_FEATURES)
        }

    # realgraph: every user interacts with a few authors
    rg_table = realgraph.init_table(num_users, realgraph_degree)
    n_ev = num_users * 4
    src = rng.integers(0, num_users, n_ev).astype(np.int32)
    dst = rng.integers(0, num_authors, n_ev).astype(np.int32)
    itype = rng.integers(0, len(realgraph.INTERACTION_TYPES), n_ev).astype(np.int32)
    ts = np.sort(rng.integers(now - 30 * 86400, now, n_ev)).astype(np.int32)
    rg_table = realgraph.apply_interactions(
        rg_table, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(itype),
        jnp.asarray(ts),
    )
    rg_params = {
        "w": jnp.asarray(rng.normal(0, 0.1, len(realgraph.INTERACTION_TYPES)),
                         jnp.float32),
        "b": jnp.float32(0.0),
    }

    def tweet_embedding_fn(ids: np.ndarray) -> sparse.SparseEmbedding:
        ids = np.asarray(ids, np.int64)
        K = clusters_per_tweet
        cl = (ids[:, None] * np.arange(1, K + 1)[None, :] * 2654435761) % num_clusters
        sc = 1.0 / (1.0 + np.arange(K))[None, :] * np.ones((ids.shape[0], 1))
        return sparse.make(
            jnp.asarray(cl, jnp.int32), jnp.asarray(sc, jnp.float32), K
        )

    eng_ids = rng.integers(0, num_tweets, (num_users, engagement_width))
    eng_types = rng.integers(0, len(rsx.SIGNAL_TYPES), (num_users, engagement_width))
    eng_ts = rng.integers(now - 6 * 86400, now, (num_users, engagement_width))

    def engagement_fn(user_id: int) -> rsx.EngagementSet:
        u = int(user_id) % num_users
        emb = tweet_embedding_fn(eng_ids[u])
        return rsx.EngagementSet(
            embeddings=emb,
            signal_type=jnp.asarray(eng_types[u], jnp.int32),
            timestamp=jnp.asarray(eng_ts[u], jnp.int32),
            valid=jnp.ones(engagement_width, bool),
        )

    def table(n, k):
        return rng.normal(0, 1, (n, k)).astype(np.float32)

    # aggregate stores with synthetic event history
    def agg_fixture(prefix: str, n_keys: int, key_fn=None):
        group = make_aggregate_group(prefix)
        store = aggregation.init_store(group, capacity=n_keys + 8)
        resolver = aggregation.KeyResolver(capacity=n_keys + 8)
        B = n_keys * 2
        if key_fn is None:
            keys = [(int(k),) for k in rng.integers(0, n_keys, B)]
        else:
            keys = [key_fn(i) for i in range(B)]
        rows = resolver.resolve(keys)
        fv = rng.random((B, 1)).astype(np.float32)
        lv = (rng.random((B, len(fs.ENGAGEMENT_LABELS))) < 0.3).astype(np.float32)
        ets = np.sort(rng.integers(now - 10 * 86400, now, B)).astype(np.int32)
        store = aggregation.update(
            group, store, jnp.asarray(rows), jnp.asarray(fv), jnp.asarray(lv),
            jnp.asarray(ets),
        )
        return store, resolver

    sig_store = user_signals.init_store(num_users, width=8)
    n_sig = num_users * 3
    sig_store = user_signals.record(
        sig_store,
        rng.integers(0, num_users, n_sig),
        rng.integers(0, len(user_signals.SignalType), n_sig),
        rng.integers(0, num_tweets, n_sig),
        np.sort(rng.integers(now - 80 * 86400, now, n_sig)),
    )

    E = len(graph_features.EdgeType)
    nbrs = np.full((E, num_users, gfs_degree), int(PAD_ID), np.int32)
    for e in range(E):
        for u in range(num_users):
            deg = int(rng.integers(1, gfs_degree))
            nbrs[e, u, :deg] = np.sort(
                rng.choice(num_users, size=deg, replace=False)
            )
    gfs_tables = graph_features.GraphTables(jnp.asarray(nbrs))

    meta = np.stack(
        [
            np.log1p(rng.integers(0, 1_000_000, num_authors)),
            np.log1p(rng.integers(0, 5_000, num_authors)),
            rng.integers(0, 5000, num_authors).astype(np.float32),
            (rng.random(num_authors) < 0.1).astype(np.float32),
        ],
        axis=1,
    ).astype(np.float32)

    # pair/keyed crosses: bounded key pools so fixtures stay small
    def _pair_pool(second_max):
        pool = [(int(rng.integers(0, num_users)),
                 int(rng.integers(0, second_max))) for _ in range(24)]
        return lambda i: pool[i % len(pool)]

    pair_aggs = {
        "user_author_agg": agg_fixture(
            "user_author_agg", 32, _pair_pool(num_authors)),
        "user_author_oon_agg": agg_fixture(
            "user_author_oon_agg", 32, _pair_pool(num_authors)),
        "user_engager_agg": agg_fixture(
            "user_engager_agg", 32, _pair_pool(num_users)),
        "user_mention_agg": agg_fixture(
            "user_mention_agg", 32, _pair_pool(num_users)),
        "user_original_author_agg": agg_fixture(
            "user_original_author_agg", 32, _pair_pool(num_authors)),
        "user_topic_agg": agg_fixture(
            "user_topic_agg", 32, _pair_pool(16)),
        "user_list_agg": agg_fixture("user_list_agg", 32, _pair_pool(4)),
        "user_dow_agg": agg_fixture("user_dow_agg", 32, _pair_pool(7)),
        "user_hour_agg": agg_fixture("user_hour_agg", 32, _pair_pool(24)),
    }

    return dict(
        doc_fn=doc_fn,
        pair_aggs=pair_aggs,
        realgraph_table=rg_table,
        realgraph_params=rg_params,
        twhin_user=table(num_users, 64),
        twhin_author=table(num_authors, 64),
        twhin_tweet=table(num_tweets, 64),
        tweet_embedding_fn=tweet_embedding_fn,
        engagement_fn=engagement_fn,
        user_interests_table=table(num_users, 128),
        author_agg_table=table(num_authors, 128),
        media_cluster_table=table(num_tweets, 64),
        text_embedding_table=table(num_tweets, 128),
        tweet_agg=agg_fixture("tweet_agg", min(num_tweets, 512)),
        author_agg=agg_fixture("author_agg", num_authors),
        user_agg=agg_fixture("user_agg", num_users),
        signal_store=sig_store,
        gfs_tables=gfs_tables,
        tweepcred=rng.integers(0, 100, num_authors).astype(np.float32),
        author_meta=meta,
        followers_of_viewer_fn=lambda uid: frozenset(
            int(x) for x in range(0, num_authors, 7)
        ),
    )
