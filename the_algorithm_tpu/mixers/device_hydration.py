"""Device-side wide hydration: the serve-path feature store in HBM.

≡ the reference's hydration tier (``home-mixer/server/.../functional_component/
feature_hydrator/`` batching RPCs to Manhattan/memcache/GFS/RSX stores, then
``navi/dr_transform`` densifying the result for the model) — re-designed
TPU-first: every feature table is **device-resident**, and hydration +
densification + MaskNet scoring run as ONE compiled XLA program per request
batch. The host never materializes (or ships) the [B, ~6.7k] feature matrix;
it only resolves ids→rows (the memcache-key layer) and uploads a few int32
index arrays per request.

Why this shape: the host-columnar path (``wide_hydrators.py``) costs ~50 ms
of numpy per request plus a multi-MB feature-matrix upload per scoring call
— at 6.7k features × 1.5k candidates that is the entire latency budget. On
TPU the same work is a handful of gathers fused into the ranker's first
matmul, and R concurrent requests share one program dispatch.

Parity: :func:`assemble` emits columns in **exactly**
:data:`feature_schema.WIDE_SCHEMA` order; ``tests/test_device_hydration.py``
asserts equality against the host hydrator catalog per family.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from the_algorithm_tpu.features import aggregation, graph_features, user_signals
from the_algorithm_tpu.features import representation_scorer as rsx
from the_algorithm_tpu.graph import realgraph
from the_algorithm_tpu.mixers import feature_schema as fs
from the_algorithm_tpu.ops.sparse import PAD_ID

# aggregate-store catalog order == schema prefix order (feature_schema.py):
# first the candidate-keyed stores (a [B] row vector each), then the
# viewer-keyed stores (one row broadcast over the batch)
CAND_KEYED_AGG = (
    "tweet_agg", "author_agg", "user_author_agg", "user_author_oon_agg",
    "user_engager_agg", "user_mention_agg", "user_original_author_agg",
    "user_topic_agg", "author_topic_agg", "user_source_agg",
    "user_language_agg", "user_media_agg", "user_conversation_agg",
    "topic_agg",
)
VIEWER_KEYED_AGG = ("user_agg", "user_list_agg", "user_dow_agg",
                    "user_hour_agg")
# schema emission order of all agg prefixes (feature_schema.build_wide_schema)
AGG_SCHEMA_ORDER = (
    "tweet_agg", "author_agg", "user_agg", "user_author_agg",
    *fs.PAIR_AGG_PREFIXES, *fs.EXTRA_AGG_PREFIXES,
)

_L = len(fs.ENGAGEMENT_LABELS)
_H = len(fs.AGG_HALFLIVES_S)
_M_STORED = 4  # count, sum, sumsq, max


class DeviceWideTables(NamedTuple):
    """Every serve-path feature table, device-resident (one pytree).

    Passed to the jitted program as an ARGUMENT (closed-over device arrays
    embed as HLO constants and blow the remote-compile payload limit).
    """

    # earlybird in-index doc features [Td, n_doc] (ids gather mod Td)
    doc_table: jnp.ndarray
    # realgraph viewer rows
    rg_nbr_ids: jnp.ndarray  # [U, D] int32
    rg_counts: jnp.ndarray  # [U, D, Fr] f32
    rg_last_ts: jnp.ndarray  # [U] int32
    rg_w: jnp.ndarray  # [Fr] edge-model weights
    rg_b: jnp.ndarray  # [] bias
    # twhin embedding tables
    twhin_user: jnp.ndarray  # [U, 64]
    twhin_author: jnp.ndarray  # [A, 64]
    twhin_tweet: jnp.ndarray  # [Tw, 64]
    twhin_user_negative: jnp.ndarray  # [U, 64]
    twhin_author_follow: jnp.ndarray  # [A, 64]
    # rsx engagement history (per viewer)
    eng_ids: jnp.ndarray  # [U, E] int32 engaged-tweet ids
    eng_type: jnp.ndarray  # [U, E] int32
    eng_ts: jnp.ndarray  # [U, E] int32
    eng_valid: jnp.ndarray  # [U, E] bool
    # large embeddings
    user_interests: jnp.ndarray  # [U, 128]
    author_agg_emb: jnp.ndarray  # [A, 128]
    media_clip: jnp.ndarray  # [Tw, 64]
    text_emb: jnp.ndarray  # [Tw, 128]
    # aggregate stores, order = CAND_KEYED_AGG + VIEWER_KEYED_AGG
    agg_values: Tuple[jnp.ndarray, ...]  # each [cap_i, L*4*H]
    agg_last_ts: Tuple[jnp.ndarray, ...]  # each [cap_i]
    # USS ring buffers
    uss_ids: jnp.ndarray  # [U, S, W] int32
    uss_ts: jnp.ndarray  # [U, S, W] int32
    # GFS adjacency
    gfs_neighbors: jnp.ndarray  # [E, U, D] int32
    # author meta
    tweepcred: jnp.ndarray  # [A]
    author_meta: jnp.ndarray  # [A, 4]


@dataclasses.dataclass(frozen=True)
class DeviceFns:
    """Static, jax-traceable feature formulas (NOT pytree leaves).

    Production backs these with table gathers; the synthetic world supplies
    the same closed-form functions its host fixtures use.
    """

    # ids [...] -> (cluster_ids [..., K] int32, scores [..., K] f32)
    tweet_emb: Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]
    # (uid [..], authors [...]) -> bool [...]: does author follow viewer
    author_follows_viewer: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


class DeviceRequests(NamedTuple):
    """One batch of R requests, PB candidate slots each (host-built)."""

    cand_ids: jnp.ndarray  # [R, PB] int32 (PAD_ID for empty slots)
    author_ids: jnp.ndarray  # [R, PB] int32 (-1 for empty)
    agg_rows: jnp.ndarray  # [R, PB, len(CAND_KEYED_AGG)] int32 (-1 = miss)
    viewer_agg_rows: jnp.ndarray  # [R, len(VIEWER_KEYED_AGG)] int32
    uid: jnp.ndarray  # [R] int32
    now: jnp.ndarray  # [R] int32
    follows: jnp.ndarray  # [R, FW] int32 (PAD_ID padded)
    lift: jnp.ndarray  # [R, PB, 6] f32 — CONTEXT_FEATURES order
    ctx_hour: jnp.ndarray  # [R] int32
    ctx_dow: jnp.ndarray  # [R] int32
    ctx_client: jnp.ndarray  # [R] int32
    ctx_scalars: jnp.ndarray  # [R, 4] f32
    source_idx: jnp.ndarray  # [R, PB] int32 (-1 = unknown source)


def _bucket_proj(cl: jnp.ndarray, sc: jnp.ndarray, buckets: int) -> jnp.ndarray:
    """[..., K] sparse pairs → [..., buckets] hash-bucketed dense sum
    (the SparseProjectionColumnarHydrator math)."""
    valid = cl != PAD_ID
    b = jnp.where(valid, cl % buckets, 0)
    onehot = jax.nn.one_hot(b, buckets, dtype=sc.dtype)
    return jnp.einsum("...k,...kb->...b", jnp.where(valid, sc, 0.0), onehot)


def _agg_expose_rows(
    block: jnp.ndarray,  # [..., L*4*H] gathered at max(rows, 0)
    last: jnp.ndarray,  # [...] gathered last_ts
    rows: jnp.ndarray,  # [...] int32, -1 = missing (mask only)
    now: jnp.ndarray,  # [...] or broadcastable int32
) -> jnp.ndarray:
    """Decay-to-now + expose pre-gathered store rows → [..., L*H*5].

    Stored layout col=((l*4 + m)*H + h) (``aggregation._layout`` with F=1);
    exposed order (label, half-life, count/sum/mean/sumsq/max) — mirrors
    ``DecayedAggregatesColumnarHydrator._read`` + ``_expose``. Split from
    the gather so the sharded engine can fetch rows with the all-to-all
    multiget first.
    """
    dt = (now - last).astype(jnp.float32)[..., None]
    hl = jnp.asarray(fs.AGG_HALFLIVES_S, jnp.float32)  # [H]
    hl_cols = jnp.tile(hl, _L * _M_STORED)  # h fastest, matches storage
    block = block * jnp.exp2(-dt / hl_cols)
    block = jnp.where((rows >= 0)[..., None], block, 0.0)
    shape = block.shape[:-1]
    cube = block.reshape(*shape, _L, _M_STORED, _H)
    cube = jnp.swapaxes(cube, -1, -2)  # [..., L, H, M_STORED]
    count, ssum = cube[..., 0], cube[..., 1]
    out = jnp.stack(
        [count, ssum, ssum / jnp.maximum(count, 1.0), cube[..., 2],
         cube[..., 3]],
        axis=-1,
    )  # [..., L, H, 5]
    return out.reshape(*shape, _L * _H * 5)


def _agg_expose(
    values: jnp.ndarray,  # [cap, L*4*H]
    last_ts: jnp.ndarray,  # [cap]
    rows: jnp.ndarray,  # [...] int32, -1 = missing
    now: jnp.ndarray,  # scalar int32
) -> jnp.ndarray:
    """Gather + decay-to-now + expose → [..., L*H*5] (local-gather form)."""
    safe = jnp.maximum(rows, 0)
    return _agg_expose_rows(values[safe], last_ts[safe], rows, now)


def _cap_of(caps: Optional[Dict[str, int]], name: str, arr, axis: int = 0):
    """True (unpadded) row count of a keyed table.

    Inside the sharded engine the leaf only holds its LOCAL shard (and may
    be zero-padded to a shard multiple), so modulo keys must come from the
    recorded logical capacities, not ``shape[0]``.
    """
    if caps is not None and name in caps:
        return caps[name]
    return arr.shape[axis]


def keyed_table_plan(
    tables: DeviceWideTables,
    caps: Optional[Dict[str, int]] = None,
) -> Dict[Tuple[str, int], Dict[str, jnp.ndarray]]:
    """The shared gather route plan: (key flavor, capacity) → named table
    group. Used by :func:`gather_rows` (which computes the key per route)
    AND by the sharded engine's placement packer (which concatenates each
    group's leaves into one exchange buffer) — one source of truth so the
    two can never disagree on what rides which route."""
    A_m = _cap_of(caps, "tweepcred", tables.tweepcred)
    A_m2 = _cap_of(caps, "author_meta", tables.author_meta)
    U_g = _cap_of(caps, "gfs_neighbors", tables.gfs_neighbors, axis=1)
    plan: Dict[Tuple[str, int], Dict[str, jnp.ndarray]] = {}

    def add(flavor, name, tab, cap=None):
        cap = int(cap if cap is not None else _cap_of(caps, name, tab))
        plan.setdefault((flavor, cap), {})[name] = tab

    add("ids", "doc", tables.doc_table)
    add("ids", "tw_tweet", tables.twhin_tweet)
    add("ids", "media_clip", tables.media_clip)
    add("ids", "text_emb", tables.text_emb)
    add("authors", "tw_author", tables.twhin_author)
    add("authors", "tw_author_follow", tables.twhin_author_follow)
    add("authors", "author_agg_emb", tables.author_agg_emb)
    add("clip", "tweepcred", tables.tweepcred, A_m)
    if A_m2 == A_m:
        add("clip", "author_meta", tables.author_meta, A_m)
    add("uid", "rg_nbrs", tables.rg_nbr_ids)
    add("uid", "rg_counts", tables.rg_counts)
    add("uid", "rg_last", tables.rg_last_ts)
    add("uid", "tw_user", tables.twhin_user)
    add("uid", "tw_user_neg", tables.twhin_user_negative)
    add("uid", "eng_ids", tables.eng_ids)
    add("uid", "eng_type", tables.eng_type)
    add("uid", "eng_ts", tables.eng_ts)
    add("uid", "eng_valid", tables.eng_valid)
    add("uid", "user_interests", tables.user_interests)
    add("uid", "uss_ids", tables.uss_ids)
    add("uid", "uss_ts", tables.uss_ts)
    # GFS adjacency per canonical pair ([E_ent, U, D]: entity slice is a
    # static index, the U axis is the sharded/keyed one)
    for name, (ue, ce) in graph_features.FEATURE_PAIRS.items():
        add("uid", f"gfs_a::{name}", tables.gfs_neighbors[int(ue)], U_g)
        add("clip", f"gfs_b::{name}", tables.gfs_neighbors[int(ce)], U_g)
    return plan


def gather_rows(
    tables: DeviceWideTables,
    req: DeviceRequests,
    *,
    gather: Optional[Callable] = None,
    caps: Optional[Dict[str, int]] = None,
    agg_packed=None,
) -> Dict[str, Any]:
    """Resolve every keyed table row the assembly math needs.

    ``gather(group, key)`` fetches rows for one key array from a dict of
    same-row-count tables (``{name: [rows, ...]}`` → ``{name: key.shape +
    ...}``). Default: local HBM indexing. The sharded engine passes an
    all-to-all multiget (``parallel.sharded_table.route_and_gather``) over
    the ``model`` mesh axis instead — the TPU twin of the reference's
    sharded store-fleet multiget (``graph-feature-service/.../worker/
    handlers/WorkerGetIntersectionHandler.scala:18-31``).

    Tables sharing the same key flavor AND row count ride one gather call
    (one id routing in the sharded case) — the route count is what the
    sharded serve program's latency pays for, so the grouping is
    aggressive: all viewer-keyed tables with one capacity are one route,
    as are all tweet-keyed and author-keyed dense tables.

    ``agg_packed``: optional ``(values_cat, last_cat, row_offsets)`` —
    the 18 aggregate stores concatenated row-wise (offsets: np [S+V]).
    When given, ALL candidate-keyed store rows resolve in ONE gather (and
    the viewer stores in one more) instead of 18 — the sharded engine's
    placement builds this packing.
    """
    if gather is None:
        def gather(group, key):
            return {n: t[key] for n, t in group.items()}

    ids = req.cand_ids
    authors = req.author_ids
    uid = req.uid
    rows: Dict[str, Any] = {}

    A_m = _cap_of(caps, "tweepcred", tables.tweepcred)
    A_m2 = _cap_of(caps, "author_meta", tables.author_meta)
    clip_a = jnp.clip(authors, 0)

    # key flavor per table: same (flavor, cap) ⇒ identical key array ⇒
    # shared route. ``clip``: clip-then-mod (host-hydrator author-meta and
    # GFS keying); author_meta's double modulo collapses into it when the
    # capacities agree (the common case), else routes alone.
    flavors = {
        "ids": lambda cap: ids % cap,
        "authors": lambda cap: authors % cap,
        "clip": lambda cap: clip_a % cap,
        "uid": lambda cap: uid % cap,
    }
    plan = keyed_table_plan(tables, caps)

    for (flavor, cap), group in plan.items():
        rows.update(gather(group, flavors[flavor](cap)))
    if A_m2 != A_m:
        rows.update(gather({"author_meta": tables.author_meta},
                           (clip_a % A_m) % A_m2))
    rows["gfs_a"] = {n: rows.pop(f"gfs_a::{n}")
                     for n in graph_features.FEATURE_PAIRS}
    rows["gfs_b"] = {n: rows.pop(f"gfs_b::{n}")
                     for n in graph_features.FEATURE_PAIRS}

    # aggregate stores: host-resolved row indices (-1 = miss; gather at
    # max(rows, 0), the expose masks)
    S = len(CAND_KEYED_AGG)
    V = len(VIEWER_KEYED_AGG)
    if agg_packed is not None:
        values_cat, last_cat, offsets = agg_packed
        off = jnp.asarray(offsets, jnp.int32)
        keys = jnp.maximum(req.agg_rows, 0) + off[None, None, :S]
        got = gather({"av": values_cat, "al": last_cat}, keys)
        rows["agg_cand_vals"] = tuple(
            got["av"][:, :, si] for si in range(S))
        rows["agg_cand_last"] = tuple(
            got["al"][:, :, si] for si in range(S))
        vkeys = jnp.maximum(req.viewer_agg_rows, 0) + off[None, S:]
        got_v = gather({"av": values_cat, "al": last_cat}, vkeys)
        rows["agg_viewer_vals"] = tuple(
            got_v["av"][:, vi] for vi in range(V))
        rows["agg_viewer_last"] = tuple(
            got_v["al"][:, vi] for vi in range(V))
    else:
        cand_vals, cand_last = [], []
        for si in range(S):
            r = jnp.maximum(req.agg_rows[:, :, si], 0)
            got = gather({"v": tables.agg_values[si],
                          "l": tables.agg_last_ts[si]}, r)
            cand_vals.append(got["v"])
            cand_last.append(got["l"])
        viewer_vals, viewer_last = [], []
        for vi in range(V):
            si = S + vi
            r = jnp.maximum(req.viewer_agg_rows[:, vi], 0)
            got = gather({"v": tables.agg_values[si],
                          "l": tables.agg_last_ts[si]}, r)
            viewer_vals.append(got["v"])
            viewer_last.append(got["l"])
        rows["agg_cand_vals"] = tuple(cand_vals)
        rows["agg_cand_last"] = tuple(cand_last)
        rows["agg_viewer_vals"] = tuple(viewer_vals)
        rows["agg_viewer_last"] = tuple(viewer_last)

    # replicated parameters the math phase needs
    rows["rg_w"] = tables.rg_w
    rows["rg_b"] = tables.rg_b
    return rows


def assemble_from_rows(
    rows: Dict[str, Any],
    fns: DeviceFns,
    req: DeviceRequests,
    *,
    n_sources: int,
    eng_rows: int,
    sc_buckets: int = 64,
) -> jnp.ndarray:
    """[R, PB, total_width(WIDE_SCHEMA)] from pre-gathered rows.

    Pure per-candidate math — no table indexing — so it runs identically
    on local-gathered rows (single chip) and multiget-gathered rows (the
    model-sharded serve engine, where PB is this shard's candidate slice).
    ``eng_rows``: logical row count of the engagement table (the viewer
    InterestedIn fixture keys on it).
    """
    R, PB = req.cand_ids.shape
    ids = req.cand_ids
    authors = req.author_ids
    now_c = req.now[:, None]  # [R, 1]
    pieces: List[jnp.ndarray] = []

    def emit(x):
        pieces.append(x if x.ndim == 3 else x[..., None])

    # 1. earlybird doc features [R, PB, n_doc]
    emit(rows["doc"])

    # 2. realgraph viewer→author edge block
    nbrs = rows["rg_nbrs"]  # [R, D]
    dt = jnp.maximum(req.now - rows["rg_last"], 0).astype(jnp.float32)
    decay = jnp.exp2(-dt / realgraph.DEFAULT_HALF_LIFE_S)  # [R]
    decayed = rows["rg_counts"] * decay[:, None, None]  # [R, D, Fr]
    match = (authors[:, :, None] == nbrs[:, None, :]).astype(jnp.float32)
    feats = jnp.einsum("rbd,rdf->rbf", match, decayed)  # [R, PB, Fr]
    # the RealGraph edge model: sigmoid(log1p(f)·w + b)
    # (``realgraph.predict_edge_scores``)
    p = jax.nn.sigmoid(jnp.log1p(feats) @ rows["rg_w"] + rows["rg_b"])
    has_edge = jnp.sum(match, axis=2) > 0
    days = (dt / 86400.0)[:, None]  # [R, 1]
    emit(feats)
    emit(jnp.where(has_edge, days, 0.0))
    emit(jnp.sum(feats, axis=-1))
    emit(jnp.where(has_edge, p, 0.0))

    # 3. twhin blocks (5 × 64)
    emit(jnp.broadcast_to(rows["tw_user"][:, None, :], (R, PB, 64)))
    emit(rows["tw_author"])
    emit(rows["tw_tweet"])
    emit(jnp.broadcast_to(rows["tw_user_neg"][:, None, :], (R, PB, 64)))
    emit(rows["tw_author_follow"])

    # 4. RSX engagement-similarity block (kind × window × signal × agg)
    cand_cl, cand_sc = fns.tweet_emb(ids)  # [R, PB, K]
    eng_cl, eng_sc = fns.tweet_emb(rows["eng_ids"])  # [R, E, K]
    eng_age = now_c - rows["eng_ts"]  # [R, E]
    rsx_cols = _rsx_block(
        cand_cl, cand_sc, eng_cl, eng_sc, rows["eng_type"], eng_age,
        rows["eng_valid"])
    emit(rsx_cols)  # [R, PB, n_rsx] in schema order

    # 5. simclusters projections: viewer InterestedIn then candidate tweet
    ii_cl, ii_sc = fns.tweet_emb(req.uid % eng_rows)  # [R, K]
    emit(jnp.broadcast_to(
        _bucket_proj(ii_cl, ii_sc, sc_buckets)[:, None, :],
        (R, PB, sc_buckets)))
    emit(_bucket_proj(cand_cl, cand_sc, sc_buckets))

    # 6. large embeddings
    emit(jnp.broadcast_to(
        rows["user_interests"][:, None, :],
        (R, PB, rows["user_interests"].shape[-1])))
    emit(rows["author_agg_emb"])
    emit(rows["media_clip"])
    emit(rows["text_emb"])

    # 7. aggregate groups (schema prefix order)
    cand_store_idx = {n: i for i, n in enumerate(CAND_KEYED_AGG)}
    viewer_store_idx = {n: i for i, n in enumerate(VIEWER_KEYED_AGG)}
    for prefix in AGG_SCHEMA_ORDER:
        if prefix in cand_store_idx:
            si = cand_store_idx[prefix]
            r = req.agg_rows[:, :, si]  # [R, PB]
            block = _agg_expose_rows(
                rows["agg_cand_vals"][si], rows["agg_cand_last"][si],
                r, now_c)  # [R, PB, L*H*5]
        else:
            vi = viewer_store_idx[prefix]
            r = req.viewer_agg_rows[:, vi]  # [R]
            one = _agg_expose_rows(
                rows["agg_viewer_vals"][vi], rows["agg_viewer_last"][vi],
                r, req.now)  # [R, L*H*5]
            block = jnp.broadcast_to(one[:, None, :], (R, PB, one.shape[-1]))
        emit(block)

    # 8. USS signal counts per window × signal (broadcast)
    t_ids = rows["uss_ids"]  # [R, S, W]
    t_ts = rows["uss_ts"]
    windows = jnp.asarray(
        [90 * 86400, 30 * 86400, 7 * 86400], jnp.int32)  # [3] (USS order)
    cutoffs = req.now[:, None] - windows[None, :]  # [R, 3]
    counts = jnp.sum(
        (t_ids != PAD_ID)[:, None, :, :]
        & (t_ts[:, None, :, :] >= cutoffs[:, :, None, None]),
        axis=-1,
    ).astype(jnp.float32)  # [R, 3, S]
    S = t_ids.shape[1]
    emit(jnp.broadcast_to(
        counts.reshape(R, 1, 3 * S), (R, PB, 3 * S)))

    # 9. GFS intersections (count + normalized per canonical pair)
    gfs_cols = []
    for name in graph_features.FEATURE_PAIRS:
        a_row = rows["gfs_a"][name]  # [R, D]
        b_rows = rows["gfs_b"][name]  # [R, PB, D]
        av = a_row != PAD_ID
        bv = b_rows != PAD_ID
        eq = ((a_row[:, None, :, None] == b_rows[:, :, None, :])
              & av[:, None, :, None] & bv[:, :, None, :])
        cnt = jnp.sum(eq, axis=(2, 3)).astype(jnp.float32)  # [R, PB]
        deg = jnp.sum(av, axis=1).astype(jnp.float32)[:, None]  # [R, 1]
        gfs_cols.append(cnt)
        gfs_cols.append(cnt / jnp.maximum(deg, 1.0))
    emit(jnp.stack(gfs_cols, axis=-1))

    # 10. author meta + follow relations
    ok = (authors >= 0).astype(jnp.float32)
    emit(rows["tweepcred"] * ok)
    emit(rows["author_meta"] * ok[..., None])
    follows_match = jnp.any(
        (authors[:, :, None] == req.follows[:, None, :])
        & (req.follows != PAD_ID)[:, None, :],
        axis=2,
    ).astype(jnp.float32)
    emit(follows_match)
    emit(fns.author_follows_viewer(req.uid[:, None], authors)
         .astype(jnp.float32) * ok)

    # 11. context features lifted from the candidate object model
    emit(req.lift)  # [R, PB, 6] in CONTEXT_FEATURES order

    # 12. serving-context one-hots + scalars (broadcast)
    emit(jnp.broadcast_to(
        jax.nn.one_hot(req.ctx_hour, 24)[:, None, :], (R, PB, 24)))
    emit(jnp.broadcast_to(
        jax.nn.one_hot(req.ctx_dow, 7)[:, None, :], (R, PB, 7)))
    emit(jnp.broadcast_to(
        jax.nn.one_hot(req.ctx_client, fs.CONTEXT_CLIENTS)[:, None, :],
        (R, PB, fs.CONTEXT_CLIENTS)))
    emit(jnp.broadcast_to(
        req.ctx_scalars[:, None, :], (R, PB, 4)))

    # 13. source one-hot
    emit(jax.nn.one_hot(req.source_idx, n_sources))

    return jnp.concatenate(pieces, axis=-1)


def assemble(
    tables: DeviceWideTables,
    fns: DeviceFns,
    req: DeviceRequests,
    *,
    n_sources: int,
    sc_buckets: int = 64,
) -> jnp.ndarray:
    """[R, PB, total_width(WIDE_SCHEMA)] — device twin of the host catalog.

    Families emit in exactly ``feature_schema.build_wide_schema`` order;
    every block mirrors its ``wide_hydrators`` twin's math (same modulo
    keying, same decay, same layouts). Local-gather composition of
    :func:`gather_rows` + :func:`assemble_from_rows`.
    """
    rows = gather_rows(tables, req)
    return assemble_from_rows(
        rows, fns, req, n_sources=n_sources,
        eng_rows=tables.eng_ids.shape[0], sc_buckets=sc_buckets)


def _rsx_block(
    cand_cl, cand_sc,  # [R, PB, K]
    eng_cl, eng_sc,  # [R, E, K]
    eng_type,  # [R, E]
    eng_age,  # [R, E]
    valid,  # [R, E] bool
) -> jnp.ndarray:
    """[R, PB, n_rsx] — kind × window × signal × (avg, max, min), matching
    ``rsx.engagement_similarity_features`` column order (hydrated under the
    ``rsx_`` prefix in schema order)."""
    from the_algorithm_tpu.ops import sparse
    out_cols: List[jnp.ndarray] = []
    for kind in rsx.SIMILARITY_KINDS:
        fn = {
            "cosine": sparse.cosine, "dot": sparse.dot,
            "log_cosine": sparse.log_norm_cosine,
            "euclidean": sparse.euclidean,
        }[kind]

        def pair(c_cl, c_sc, e_cl, e_sc):
            # [PB, K] × [E, K] pairwise over one request
            return sparse.pairwise_matrix(
                fn,
                sparse.SparseEmbedding(c_cl, c_sc),
                sparse.SparseEmbedding(e_cl, e_sc),
            )  # [PB, E]

        sim = jax.vmap(pair)(cand_cl, cand_sc, eng_cl, eng_sc)  # [R, PB, E]
        for w_secs in rsx.WINDOWS_S.values():
            in_w = valid & (eng_age <= w_secs)  # [R, E]
            for s_idx in range(len(rsx.SIGNAL_TYPES)):
                m = in_w & (eng_type == s_idx)  # [R, E]
                mf = m.astype(jnp.float32)[:, None, :]  # [R, 1, E]
                count = jnp.sum(mf, axis=2)  # [R, 1]
                has = count > 0
                avg = jnp.where(
                    has,
                    jnp.sum(jnp.where(m[:, None, :], sim, 0.0), axis=2)
                    / jnp.maximum(count, 1.0), 0.0)
                mx = jnp.where(
                    has,
                    jnp.max(jnp.where(m[:, None, :], sim, -jnp.inf), axis=2),
                    0.0)
                mn = jnp.where(
                    has,
                    jnp.min(jnp.where(m[:, None, :], sim, jnp.inf), axis=2),
                    0.0)
                out_cols += [avg, mx, mn]
    return jnp.stack(out_cols, axis=-1)


def diversity_select(
    combined: jnp.ndarray,  # [R, PB] combined scores
    author_ids: jnp.ndarray,  # [R, PB] (-1 = unknown)
    cand_ids: jnp.ndarray,  # [R, PB] (PAD_ID = empty slot)
    k: int,
    *,
    decay: float = 0.5,
    floor: float = 0.25,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Author-diversity rescore + top-K ON DEVICE → (sel_idx [R, k],
    sel_ids [R, k], sel_scores [R, k]).

    The vectorized twin of ``BatchedForYouEngine._rescore_select`` (itself
    ≡ the ListwiseRescoringProvider author-diversity rule): rank by
    combined score, decay each author's n-th appearance by decay**n
    (floored), re-rank, take K. Keeping selection on device shrinks the
    result fetch from [R, PB, H+1] to [R, k, ·] — the fetch was ~35% of a
    32-request serve batch on a tunneled chip.
    """
    R, PB = combined.shape
    valid = cand_ids != PAD_ID
    masked = jnp.where(valid, combined, -jnp.inf)

    def one(scores, authors, vmask):
        order = jnp.argsort(-scores, stable=True)  # [PB] ranked positions
        a_ranked = authors[order]
        # occurrence index of each author within the ranked list:
        # stable-sort ranked authors, count run positions, invert
        by_author = jnp.argsort(a_ranked, stable=True)
        a_sorted = a_ranked[by_author]
        new_run = jnp.concatenate(
            [jnp.ones((1,), bool), a_sorted[1:] != a_sorted[:-1]])
        pos = jnp.arange(PB)
        run_start = jax.lax.associative_scan(
            jnp.maximum, jnp.where(new_run, pos, 0))
        occ_sorted = pos - run_start
        occ = jnp.zeros((PB,), jnp.int32).at[by_author].set(
            occ_sorted.astype(jnp.int32))
        factor = jnp.maximum(decay ** occ.astype(jnp.float32), floor)
        factor = jnp.where(a_ranked >= 0, factor, 1.0)
        rescored = scores[order] * factor
        rescored = jnp.where(vmask[order], rescored, -jnp.inf)
        top, sel = jax.lax.top_k(rescored, k)
        return order[sel], top

    sel_idx, sel_scores = jax.vmap(one)(masked, author_ids, valid)
    sel_ids = jnp.take_along_axis(cand_ids, sel_idx, axis=1)
    sel_ids = jnp.where(jnp.isfinite(sel_scores), sel_ids, PAD_ID)
    return sel_idx, sel_ids, sel_scores


# -- host-side request building ------------------------------------------------


class HostRequestBuilder:
    """Per-request id→row resolution (the memcache-key layer kept on host).

    Produces the int32 index arrays of :class:`DeviceRequests` from the
    pipeline's (query, candidates). All per-candidate work is vectorized
    numpy except the key-tuple construction for the aggregate resolvers.
    """

    def __init__(
        self,
        resolvers: Dict[str, aggregation.KeyResolver],
        source_names: Optional[Sequence[str]] = None,
        pad_b: int = 512,
        follow_width: int = 64,
    ):
        self.resolvers = resolvers
        names = (tuple(source_names) if source_names is not None
                 else tuple(fs.candidate_source_names()))
        self.source_index = {n: i for i, n in enumerate(names)}
        self.n_sources = len(names)
        self.pad_b = pad_b
        self.follow_width = follow_width

    def _cand_feature(self, candidates, feat, default_feat=None):
        out = []
        for c in candidates:
            v = c.features.get(feat)
            if v is None and default_feat is not None:
                v = c.features.get(default_feat)
            out.append(int(v) if v is not None else -1)
        return out

    def build(self, query, candidates) -> DeviceRequests:
        """One request → single-row (R=1) DeviceRequests (batch by
        tree-concatenating along axis 0)."""
        PB = self.pad_b
        B = min(len(candidates), PB)
        cands = candidates[:B]
        uid = int(getattr(query, "user_id", 0))
        now = int(getattr(query, "now", 0))

        ids = np.full(PB, int(PAD_ID), np.int32)
        authors = np.full(PB, -1, np.int32)
        lift = np.zeros((PB, len(fs.CONTEXT_FEATURES)), np.float32)
        src = np.full(PB, -1, np.int32)
        for i, c in enumerate(cands):
            ids[i] = c.id
            a = c.features.get("author_id")
            authors[i] = int(a) if a is not None else -1
            for j, n in enumerate(fs.CONTEXT_FEATURES):
                v = c.features.get(n)
                if v is not None:
                    lift[i, j] = float(v)
            s = self.source_index.get(str(c.source))
            if s is not None:
                src[i] = s

        # aggregate rows per store
        agg_rows = np.full((PB, len(CAND_KEYED_AGG)), -1, np.int32)
        key_lists = self._agg_keys(query, cands, uid, now, ids, authors)
        for si, name in enumerate(CAND_KEYED_AGG):
            r = self.resolvers[name].lookup(key_lists[name])
            agg_rows[:len(r), si] = r
        viewer_rows = np.empty(len(VIEWER_KEYED_AGG), np.int32)
        viewer_keys = {
            "user_agg": (uid,),
            "user_list_agg": (uid, int(getattr(query, "list_id", -1) or -1)),
            "user_dow_agg": (uid, (now // 86400) % 7),
            "user_hour_agg": (uid, (now // 3600) % 24),
        }
        for vi, name in enumerate(VIEWER_KEYED_AGG):
            viewer_rows[vi] = self.resolvers[name].lookup(
                [viewer_keys[name]])[0]

        follows = np.full(self.follow_width, int(PAD_ID), np.int32)
        fl = sorted(int(a) for a in getattr(query, "followed_authors", ()))
        follows[:min(len(fl), self.follow_width)] = \
            fl[:self.follow_width]

        served = len(getattr(query, "served_tweet_ids", ()) or ())
        refresh = int(getattr(query, "refresh_count", 0) or 0)
        session_age = float(getattr(query, "session_age_s", 0) or 0) / 60.0
        ctx_scalars = np.asarray([
            float(getattr(query, "since_id", None) is None
                  and getattr(query, "max_id", None) is None
                  and served == 0),
            float(np.log1p(refresh)),
            float(np.log1p(session_age)),
            float(served),
        ], np.float32)

        return DeviceRequests(
            cand_ids=ids[None], author_ids=authors[None],
            agg_rows=agg_rows[None], viewer_agg_rows=viewer_rows[None],
            uid=np.asarray([uid], np.int32),
            now=np.asarray([now], np.int32),
            follows=follows[None], lift=lift[None],
            ctx_hour=np.asarray([(now // 3600) % 24], np.int32),
            ctx_dow=np.asarray([(now // 86400) % 7], np.int32),
            ctx_client=np.asarray(
                [int(getattr(query, "client_id", 0) or 0)
                 % fs.CONTEXT_CLIENTS], np.int32),
            ctx_scalars=ctx_scalars[None],
            source_idx=src[None],
        )

    def build_columnar(
        self, query, cols: Dict[str, np.ndarray], n: int
    ) -> DeviceRequests:
        """Columnar twin of :meth:`build` — per-candidate data arrives as
        numpy columns (the batched product engine's representation), so no
        per-candidate Python executes. ``cols`` must carry ``ids``; other
        recognized columns: author_id, created_ts, topic_id, language_id,
        media_type, conversation_id, engager_id, mentioned_user_id,
        original_author_id, retrieval_score, social_proof, is_in_network,
        topic_relevance, source_idx, source_hash (absent → defaults).
        """
        PB = self.pad_b
        B = min(n, PB)
        uid = int(getattr(query, "user_id", 0))
        now = int(getattr(query, "now", 0))

        def col(name, default, dtype=np.int64):
            v = cols.get(name)
            if v is None:
                return np.full(B, default, dtype)
            return np.asarray(v[:B], dtype)

        ids_c = col("ids", int(PAD_ID))
        ids = np.full(PB, int(PAD_ID), np.int32)
        ids[:B] = ids_c
        author_c = col("author_id", -1)
        authors = np.full(PB, -1, np.int32)
        authors[:B] = author_c

        lift = np.zeros((PB, len(fs.CONTEXT_FEATURES)), np.float32)
        for j, name in enumerate(fs.CONTEXT_FEATURES):
            v = cols.get(name)
            if v is not None:
                lift[:B, j] = np.asarray(v[:B], np.float32)

        src = np.full(PB, -1, np.int32)
        if "source_idx" in cols:
            src[:B] = np.asarray(cols["source_idx"][:B], np.int32)

        # vectorized store-row resolution (one searchsorted per store)
        uid_col = np.full(B, uid, np.int64)
        topic = col("topic_id", -1)
        orig_author = cols.get("original_author_id")
        orig = (np.asarray(orig_author[:B], np.int64)
                if orig_author is not None else author_c)
        key_cols = {
            "tweet_agg": (ids_c, None),
            "author_agg": (author_c, None),
            "user_author_agg": (uid_col, author_c),
            "user_author_oon_agg": (uid_col, author_c),
            "user_engager_agg": (uid_col, col("engager_id", -1)),
            "user_mention_agg": (uid_col, col("mentioned_user_id", -1)),
            "user_original_author_agg": (uid_col, orig),
            "user_topic_agg": (uid_col, topic),
            "author_topic_agg": (author_c, topic),
            "user_source_agg": (uid_col, col("source_hash", -1)),
            "user_language_agg": (uid_col, col("language_id", -1)),
            "user_media_agg": (uid_col, col("media_type", -1)),
            "user_conversation_agg": (uid_col, col("conversation_id", -1)),
            "topic_agg": (topic, None),
        }
        agg_rows = np.full((PB, len(CAND_KEYED_AGG)), -1, np.int32)
        for si, name in enumerate(CAND_KEYED_AGG):
            k0, k1 = key_cols[name]
            agg_rows[:B, si] = self.resolvers[name].lookup_vec(k0, k1)
        viewer_keys = {
            "user_agg": (uid,),
            "user_list_agg": (uid, int(getattr(query, "list_id", -1) or -1)),
            "user_dow_agg": (uid, (now // 86400) % 7),
            "user_hour_agg": (uid, (now // 3600) % 24),
        }
        viewer_rows = np.empty(len(VIEWER_KEYED_AGG), np.int32)
        for vi, name in enumerate(VIEWER_KEYED_AGG):
            viewer_rows[vi] = self.resolvers[name].lookup(
                [viewer_keys[name]])[0]

        follows = np.full(self.follow_width, int(PAD_ID), np.int32)
        fl = sorted(int(a) for a in getattr(query, "followed_authors", ()))
        follows[:min(len(fl), self.follow_width)] = fl[:self.follow_width]

        served = len(getattr(query, "served_tweet_ids", ()) or ())
        refresh = int(getattr(query, "refresh_count", 0) or 0)
        session_age = float(getattr(query, "session_age_s", 0) or 0) / 60.0
        ctx_scalars = np.asarray([
            float(getattr(query, "since_id", None) is None
                  and getattr(query, "max_id", None) is None
                  and served == 0),
            float(np.log1p(refresh)),
            float(np.log1p(session_age)),
            float(served),
        ], np.float32)

        return DeviceRequests(
            cand_ids=ids[None], author_ids=authors[None],
            agg_rows=agg_rows[None], viewer_agg_rows=viewer_rows[None],
            uid=np.asarray([uid], np.int32),
            now=np.asarray([now], np.int32),
            follows=follows[None], lift=lift[None],
            ctx_hour=np.asarray([(now // 3600) % 24], np.int32),
            ctx_dow=np.asarray([(now // 86400) % 7], np.int32),
            ctx_client=np.asarray(
                [int(getattr(query, "client_id", 0) or 0)
                 % fs.CONTEXT_CLIENTS], np.int32),
            ctx_scalars=ctx_scalars[None],
            source_idx=src[None],
        )

    def _agg_keys(self, query, cands, uid, now, ids, authors):
        """Key tuples per candidate-keyed store (hydrator key semantics)."""
        B = len(cands)
        topic = self._cand_feature(cands, "topic_id")
        out = {
            "tweet_agg": [(int(i),) for i in ids[:B]],
            "author_agg": [(int(a),) for a in authors[:B]],
            "user_author_agg": [(uid, int(a)) for a in authors[:B]],
            "user_author_oon_agg": [(uid, int(a)) for a in authors[:B]],
            "user_engager_agg": [
                (uid, v) for v in self._cand_feature(cands, "engager_id")],
            "user_mention_agg": [
                (uid, v)
                for v in self._cand_feature(cands, "mentioned_user_id")],
            "user_original_author_agg": [
                (uid, v) for v in self._cand_feature(
                    cands, "original_author_id", "author_id")],
            "user_topic_agg": [(uid, t) for t in topic],
            "author_topic_agg": [
                (int(a), t) for a, t in zip(authors[:B], topic)],
            "user_source_agg": [
                (uid, _source_hash(c.source)) for c in cands],
            "user_language_agg": [
                (uid, v) for v in self._cand_feature(cands, "language_id")],
            "user_media_agg": [
                (uid, v) for v in self._cand_feature(cands, "media_type")],
            "user_conversation_agg": [
                (uid, v)
                for v in self._cand_feature(cands, "conversation_id")],
            "topic_agg": [(t,) for t in topic],
        }
        return out


def _source_hash(source) -> int:
    import zlib

    return zlib.crc32(str(source or "").encode()) % 1024


def batch_requests(reqs: Sequence[DeviceRequests]) -> DeviceRequests:
    """Stack R single-row requests into one [R, ...] batch."""
    return jax.tree_util.tree_map(
        lambda *xs: np.concatenate(xs, axis=0), *reqs)


_N_LIFT = len(fs.CONTEXT_FEATURES)


def pack_requests(req: DeviceRequests,
                  compact_rows: bool = False) -> np.ndarray:
    """DeviceRequests → ONE int32 [R, PB, W] transfer buffer.

    On a tunneled accelerator every host→device array pays a fixed
    round-trip (~24 ms here), so 13 small leaves cost ~10× more in RTTs
    than in bytes. Layout: cand int32 columns ‖ store rows ‖ bitcast(f32
    lift) ‖ one metadata column whose leading rows carry the per-request
    ints (uid, now, hour, dow, client, viewer rows, follows) and, after
    them, the bitcast ctx scalars. Requires PB ≥ 5+V+FW+4.

    ``compact_rows``: the 14 store-row columns pack as int16 pairs in 7
    int32 lanes (−29% upload bytes — the transfer dominates the scoring
    phase on a tunneled chip). Valid only when every aggregate store's
    capacity < 32768; the scorer checks and selects the format.
    """
    R, PB = req.cand_ids.shape
    S = len(CAND_KEYED_AGG)
    V = len(VIEWER_KEYED_AGG)
    FW = req.follows.shape[1]
    n_meta = 5 + V + FW + 4
    if PB < n_meta:
        raise ValueError(f"pad_b={PB} < metadata rows {n_meta}")
    SW = S // 2 if compact_rows else S  # packed width of the row block
    W = 3 + SW + _N_LIFT + 1
    out = np.empty((R, PB, W), np.int32)
    out[..., 0] = req.cand_ids
    out[..., 1] = req.author_ids
    out[..., 2] = req.source_idx
    if compact_rows:
        out[..., 3:3 + SW] = (
            np.ascontiguousarray(req.agg_rows, np.int32)
            .astype(np.int16).reshape(R, PB, SW, 2).view(np.int32)[..., 0])
    else:
        out[..., 3:3 + SW] = req.agg_rows
    out[..., 3 + SW:3 + SW + _N_LIFT] = (
        np.ascontiguousarray(req.lift, np.float32).view(np.int32))
    meta = out[..., -1]
    meta[:, 0] = req.uid
    meta[:, 1] = req.now
    meta[:, 2] = req.ctx_hour
    meta[:, 3] = req.ctx_dow
    meta[:, 4] = req.ctx_client
    meta[:, 5:5 + V] = req.viewer_agg_rows
    meta[:, 5 + V:5 + V + FW] = req.follows
    meta[:, 5 + V + FW:n_meta] = (
        np.ascontiguousarray(req.ctx_scalars, np.float32).view(np.int32))
    return out


def unpack_requests(packed: jnp.ndarray, follow_width: int,
                    compact_rows: bool = False) -> DeviceRequests:
    """jit-side inverse of :func:`pack_requests` (pure slicing/bitcast)."""
    S = len(CAND_KEYED_AGG)
    V = len(VIEWER_KEYED_AGG)
    FW = follow_width
    SW = S // 2 if compact_rows else S
    meta = packed[..., -1]
    bc = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)  # noqa: E731
    if compact_rows:
        rows16 = jax.lax.bitcast_convert_type(
            packed[..., 3:3 + SW], jnp.int16)  # [R, PB, SW, 2]
        agg_rows = rows16.reshape(*packed.shape[:-1], S).astype(jnp.int32)
    else:
        agg_rows = packed[..., 3:3 + SW]
    return DeviceRequests(
        cand_ids=packed[..., 0], author_ids=packed[..., 1],
        source_idx=packed[..., 2], agg_rows=agg_rows,
        lift=bc(packed[..., 3 + SW:3 + SW + _N_LIFT]),
        uid=meta[:, 0], now=meta[:, 1],
        ctx_hour=meta[:, 2], ctx_dow=meta[:, 3], ctx_client=meta[:, 4],
        viewer_agg_rows=meta[:, 5:5 + V],
        follows=meta[:, 5 + V:5 + V + FW],
        ctx_scalars=bc(meta[:, 5 + V + FW:5 + V + FW + 4]),
    )


def build_from_world(world: Dict, device_spec: Dict):
    """(DeviceWideTables, DeviceFns, resolvers) from a hydrator world.

    ``world``: the :func:`wide_hydrators.build_wide_hydrators` kwargs;
    ``device_spec``: the extra arrays + traceable formulas from
    ``synthetic_world(include_device_spec=True)`` (production supplies its
    own tables + gather formulas here).
    """
    def store_of(name):
        if name in ("tweet_agg", "author_agg", "user_agg"):
            return world[name]
        return world["pair_aggs"][name]

    agg_values, agg_last_ts, resolvers = [], [], {}
    for name in (*CAND_KEYED_AGG, *VIEWER_KEYED_AGG):
        store, resolver = store_of(name)
        agg_values.append(jnp.asarray(store.values))
        agg_last_ts.append(jnp.asarray(store.last_ts))
        resolvers[name] = resolver

    rg = world["realgraph_table"]
    sig = world["signal_store"]
    E = device_spec["eng_ids"].shape[1]
    tables = DeviceWideTables(
        doc_table=jnp.asarray(device_spec["doc_table"]),
        rg_nbr_ids=jnp.asarray(rg.neighbor_ids),
        rg_counts=jnp.asarray(rg.counts),
        rg_last_ts=jnp.asarray(rg.last_ts),
        rg_w=jnp.asarray(world["realgraph_params"]["w"]),
        rg_b=jnp.asarray(world["realgraph_params"]["b"]),
        twhin_user=jnp.asarray(world["twhin_user"]),
        twhin_author=jnp.asarray(world["twhin_author"]),
        twhin_tweet=jnp.asarray(world["twhin_tweet"]),
        twhin_user_negative=jnp.asarray(world["twhin_user_negative"]),
        twhin_author_follow=jnp.asarray(world["twhin_author_follow"]),
        eng_ids=jnp.asarray(device_spec["eng_ids"]),
        eng_type=jnp.asarray(device_spec["eng_types"]),
        eng_ts=jnp.asarray(device_spec["eng_ts"]),
        eng_valid=jnp.ones(device_spec["eng_ids"].shape, bool),
        user_interests=jnp.asarray(world["user_interests_table"]),
        author_agg_emb=jnp.asarray(world["author_agg_table"]),
        media_clip=jnp.asarray(world["media_cluster_table"]),
        text_emb=jnp.asarray(world["text_embedding_table"]),
        agg_values=tuple(agg_values),
        agg_last_ts=tuple(agg_last_ts),
        uss_ids=jnp.asarray(sig.target_ids),
        uss_ts=jnp.asarray(sig.timestamps),
        gfs_neighbors=jnp.asarray(world["gfs_tables"].neighbors),
        tweepcred=jnp.asarray(world["tweepcred"]),
        author_meta=jnp.asarray(world["author_meta"]),
    )
    fns = DeviceFns(
        tweet_emb=device_spec["tweet_emb_device"],
        author_follows_viewer=device_spec["author_follows_viewer_device"],
    )
    return tables, fns, resolvers


# -- the fused hydrate+score engine -------------------------------------------


class DeviceHydrationScorer:
    """Fused wide-hydration + MaskNet scoring, one program per request batch.

    ``score_requests([(query, candidates), ...])`` returns per-request
    ``(probs [B_i, H], combined [B_i])`` — the model-scorer contract of
    ``MaskNetScorer`` with the feature matrix never leaving the device.
    """

    def __init__(
        self,
        tables: DeviceWideTables,
        fns: DeviceFns,
        resolvers: Dict[str, aggregation.KeyResolver],
        model,
        params,
        head_weights,
        *,
        pad_b: int = 512,
        source_names: Optional[Sequence[str]] = None,
        compute_dtype=jnp.bfloat16,
        device=None,
        select_top_k: Optional[int] = None,
        diversity_decay: float = 0.5,
        diversity_floor: float = 0.25,
    ):
        self.builder = HostRequestBuilder(
            resolvers, source_names=source_names, pad_b=pad_b)
        if device is not None:
            tables = jax.device_put(tables, device)
            params = jax.device_put(params, device)
        self.tables = tables
        self.fns = fns
        self._device = device
        n_sources = self.builder.n_sources
        if model is None:  # assembly-only (parity/debug) use
            self.params = params
            self._jit = None
            return

        follow_width = self.builder.follow_width
        # compact int16 row packing when every store's capacity fits
        self._compact_rows = all(
            int(v.shape[0]) < 32768 for v in tables.agg_values)
        compact = self._compact_rows
        self.select_top_k = select_top_k
        self.diversity_decay = diversity_decay
        self.diversity_floor = diversity_floor

        def run(tables, params, packed):
            from the_algorithm_tpu.models import masknet

            req = unpack_requests(packed, follow_width,
                                  compact_rows=compact)
            x = assemble(tables, fns, req, n_sources=n_sources)
            R, PB, F = x.shape
            probs = jax.nn.sigmoid(
                model.apply(params, x.reshape(R * PB, F)
                            .astype(compute_dtype)))
            probs = probs.reshape(R, PB, -1).astype(jnp.float32)
            combined = masknet.weighted_model_score(
                probs, jnp.asarray(head_weights, jnp.float32))
            if select_top_k is not None:
                # device-side diversity rescore + top-K: the fetch shrinks
                # from [R, PB, H+1] to [R, K, H+2]
                sel_idx, sel_ids, sel_scores = diversity_select(
                    combined, req.author_ids, req.cand_ids, select_top_k,
                    decay=diversity_decay, floor=diversity_floor)
                sel_probs = jnp.take_along_axis(
                    probs, sel_idx[..., None], axis=1)  # [R, K, H]
                return jnp.concatenate([
                    sel_probs,
                    sel_scores[..., None],
                    jax.lax.bitcast_convert_type(
                        sel_ids, jnp.float32)[..., None],
                ], axis=-1)
            # ONE output array (probs ‖ combined): a single device→host
            # fetch instead of two round trips
            return jnp.concatenate([probs, combined[..., None]], axis=-1)

        self.params = params
        self._jit = jax.jit(run)

    def assemble_features(self, query, candidates) -> np.ndarray:
        """[B, F] device-assembled feature matrix (parity/debug path)."""
        req = self.builder.build(query, candidates)
        if not hasattr(self, "_jit_assemble"):
            self._jit_assemble = jax.jit(
                lambda t, r: assemble(
                    t, self.fns, r, n_sources=self.builder.n_sources))
        x = self._jit_assemble(
            self.tables, jax.tree_util.tree_map(jnp.asarray, req))
        return np.asarray(x)[0, :len(candidates)]

    def _dispatch(self, reqs):
        stacked = batch_requests(reqs)
        packed = pack_requests(
            stacked, compact_rows=self._compact_rows)  # ONE upload
        if self._device is not None:
            packed = jax.device_put(packed, self._device)
        out = np.asarray(
            self._jit(self.tables, self.params, packed))  # ONE fetch
        return out[..., :-1], out[..., -1]

    def score_requests(self, batch):
        """batch: [(query, candidates), ...] → [(probs, combined), ...]."""
        reqs = [self.builder.build(q, c) for q, c in batch]
        probs, combined = self._dispatch(reqs)
        out = []
        for i, (q, c) in enumerate(batch):
            B = min(len(c), probs.shape[1])
            out.append((probs[i, :B], combined[i, :B]))
        return out

    def score_columnar(self, batch):
        """batch: [(query, cols, n), ...] (columnar candidates) →
        [(probs [n, H], combined [n]), ...] — the zero-object hot path."""
        if self.select_top_k is not None:
            raise RuntimeError(
                "scorer built with select_top_k: use select_columnar")
        reqs = [self.builder.build_columnar(q, cols, n)
                for q, cols, n in batch]
        probs, combined = self._dispatch(reqs)
        out = []
        for i, (q, cols, n) in enumerate(batch):
            B = min(n, probs.shape[1])
            out.append((probs[i, :B], combined[i, :B]))
        return out

    def select_columnar(self, batch):
        """Device-selected path: [(query, cols, n), ...] →
        [(sel_ids [K], sel_scores [K], sel_probs [K, H]), ...]."""
        reqs = [self.builder.build_columnar(q, cols, n)
                for q, cols, n in batch]
        stacked = batch_requests(reqs)
        packed = pack_requests(stacked, compact_rows=self._compact_rows)
        if self._device is not None:
            packed = jax.device_put(packed, self._device)
        out = np.asarray(self._jit(self.tables, self.params, packed))
        probs = out[..., :-2]
        scores = out[..., -2]
        ids = np.ascontiguousarray(out[..., -1]).view(np.int32)
        res = []
        for i in range(len(batch)):
            ok = np.isfinite(scores[i])
            res.append((ids[i][ok], scores[i][ok], probs[i][ok]))
        return res
