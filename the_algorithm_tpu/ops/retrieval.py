"""Approximate-cosine top-K retrieval over a cluster→tweet index.

TPU-native re-design of simclusters-ann's scan
(``simclusters-ann/server/.../candidate_source/ApproximateCosineSimilarity.scala:57-128``):

Reference (JVM): for each of the source's top-N clusters, walk its top-M
(tweetId, score) row; accumulate per-tweet ``score += tweetScore·srcScore``
and ``norm += tweetScore²`` in hashmaps; normalize per ScoringAlgorithm;
filter by age/minScore; sort; take X.

Here (XLA): the whole scan is one static-shaped program —
gather N index rows → broadcast multiply (VPU) → **dedup via sort +
segment-sum by tweet id** (a tweet appears in many cluster rows; the
hashmap-accumulate becomes a sort/segment reduction — SURVEY.md "hard
parts") → normalize → mask → ``lax.top_k``. Tweet ids are compact int32
row ids (snowflake→compact mapping lives on the host feed); ages come from
a parallel timestamp array rather than snowflake bit-twiddling.

Everything is jit/vmap-compatible; the batched form scores Q queries at once.
"""

from __future__ import annotations

import enum
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from the_algorithm_tpu.ops import sparse
from the_algorithm_tpu.ops.sparse import PAD_ID, SparseEmbedding

# On TPU, rows at least this wide dedup through the Pallas in-VMEM
# segmented-scan kernel (ops/seg_scan.py) instead of lax.associative_scan
# (which makes ~log2(W) full HBM passes). Tests may force either path.
PALLAS_DEDUP_MIN_WIDTH = 2048
FORCE_DEDUP_PATH: Optional[str] = None  # None | "pallas" | "scan"


class ScoringAlgorithm(enum.Enum):
    """≡ thrift ``ScoringAlgorithm`` (simclusters-ann/thrift/.../simClustersAnn.thrift)."""

    DOT_PRODUCT = "dot_product"
    COSINE = "cosine"
    LOG_COSINE = "log_cosine"
    COSINE_NO_SOURCE_NORM = "cosine_no_source_norm"


class ClusterTweetIndex(NamedTuple):
    """Top-M tweets per cluster (the realtime index built by TweetJob).

    ``tweet_ids[c]`` is score-descending; PAD_ID marks empty slots.
    ``timestamps`` (seconds, arbitrary epoch) drive the age filter.
    """

    tweet_ids: jnp.ndarray  # [C, M] int32, PAD_ID = empty
    scores: jnp.ndarray  # [C, M] float32
    timestamps: jnp.ndarray  # [C, M] int32 (0 if unused)

    @property
    def num_clusters(self) -> int:
        return self.tweet_ids.shape[0]

    @property
    def tweets_per_cluster(self) -> int:
        return self.tweet_ids.shape[1]


def _dedup_sum(
    ids: jnp.ndarray, *values: jnp.ndarray
) -> Tuple[jnp.ndarray, ...]:
    """Sort by id and collapse equal runs by summation.

    Returns (rep_ids, *summed) where non-representative slots are PAD_ID/0.
    Callers must not depend on WHICH slot of a run is the representative:
    the TPU path (Pallas in-VMEM segmented scan, ops/seg_scan.py) populates
    run ends, the portable path populates run starts.

    Portable path: one multi-operand lax.sort (key + carried values)
    followed by a *reverse segmented inclusive scan*
    (``lax.associative_scan`` with a run-boundary reset operator): after
    the scan each slot holds the sum from itself to its run end, so run
    starts hold the full run total. No scatter and no data-dependent
    gather — the scatter-based ``segment_sum`` formulation is ~10× slower
    on TPU and its vmapped compile blows up.
    """
    sorted_all = jax.lax.sort((ids,) + tuple(values), num_keys=1)
    ids = sorted_all[0]
    values = sorted_all[1:]

    use_pallas = FORCE_DEDUP_PATH == "pallas" or (
        FORCE_DEDUP_PATH is None
        and jax.default_backend() == "tpu"
        and ids.shape[0] >= PALLAS_DEDUP_MIN_WIDTH
    )
    if use_pallas:
        from the_algorithm_tpu.ops import seg_scan

        return seg_scan.run_collapse_sorted_1d(ids, *values)

    boundary = ids[1:] != ids[:-1]
    first = jnp.concatenate([jnp.ones((1,), jnp.bool_), boundary])
    last = jnp.concatenate([boundary, jnp.ones((1,), jnp.bool_)])

    def seg_op(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, tuple(
            x2 + jnp.where(fb, 0.0, x1) for x1, x2 in zip(va, vb)
        )

    _, scanned = jax.lax.associative_scan(
        seg_op, (last[::-1], tuple(v[::-1] for v in values))
    )
    out = tuple(jnp.where(first, s[::-1], 0.0) for s in scanned)
    rep_ids = jnp.where(first, ids, PAD_ID)
    return (rep_ids,) + out


def accumulate_candidates(
    index: ClusterTweetIndex,
    source: SparseEmbedding,
    *,
    max_top_tweets_per_cluster: Optional[int] = None,
    exclude_tweet_id: Optional[jnp.ndarray] = None,
    earliest_ts: Optional[jnp.ndarray] = None,
    latest_ts: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The accumulation half of the scan: returns deduped
    (tweet_ids, Σ tweetScore·srcScore, Σ tweetScore²) — raw partials, so
    sharded callers can merge across shards before normalizing."""
    M = index.tweets_per_cluster
    if max_top_tweets_per_cluster is not None and max_top_tweets_per_cluster < M:
        M = max_top_tweets_per_cluster

    src_valid = source.valid_mask()  # [N]
    safe_cluster = jnp.where(src_valid, source.ids, 0)
    rows_ids = index.tweet_ids[safe_cluster, :M]  # [N, M]
    rows_scores = index.scores[safe_cluster, :M]
    rows_ts = index.timestamps[safe_cluster, :M]
    return accumulate_from_rows(
        rows_ids, rows_scores, rows_ts, source,
        exclude_tweet_id=exclude_tweet_id,
        earliest_ts=earliest_ts, latest_ts=latest_ts,
    )


def accumulate_from_rows(
    rows_ids: jnp.ndarray,  # [N, M] cluster rows already fetched
    rows_scores: jnp.ndarray,  # [N, M]
    rows_ts: jnp.ndarray,  # [N, M]
    source: SparseEmbedding,  # [N]
    *,
    exclude_tweet_id: Optional[jnp.ndarray] = None,
    earliest_ts: Optional[jnp.ndarray] = None,
    latest_ts: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The accumulation over rows fetched elsewhere — the multiget-then-
    score split of the reference (rows arrive from the all-to-all row
    exchange in the query-sharded fan-out)."""
    src_valid = source.valid_mask()  # [N]
    valid = (rows_ids != PAD_ID) & src_valid[:, None]
    if exclude_tweet_id is not None:
        valid &= rows_ids != exclude_tweet_id
    if earliest_ts is not None:
        valid &= rows_ts >= earliest_ts
    if latest_ts is not None:
        valid &= rows_ts <= latest_ts

    contrib = jnp.where(
        valid, rows_scores * source.scores[:, None], 0.0
    )  # score · srcClusterScore
    norm_part = jnp.where(valid, rows_scores * rows_scores, 0.0)
    flat_ids = jnp.where(valid, rows_ids, PAD_ID).reshape(-1)

    return _dedup_sum(flat_ids, contrib.reshape(-1), norm_part.reshape(-1))


def normalize_scores(
    sum_contrib: jnp.ndarray,
    sum_norm: jnp.ndarray,
    source_l2_norm: jnp.ndarray,
    source_log_norm: jnp.ndarray,
    algorithm: ScoringAlgorithm,
) -> jnp.ndarray:
    """≡ ApproximateCosineSimilarity.scala:105-121 per-algorithm scaling."""
    eps = 1e-30
    if algorithm == ScoringAlgorithm.DOT_PRODUCT:
        return sum_contrib
    if algorithm == ScoringAlgorithm.COSINE:
        return sum_contrib / jnp.maximum(source_l2_norm * jnp.sqrt(sum_norm), eps)
    if algorithm == ScoringAlgorithm.LOG_COSINE:
        return sum_contrib / jnp.maximum(
            source_log_norm * jnp.log1p(sum_norm), eps
        )
    if algorithm == ScoringAlgorithm.COSINE_NO_SOURCE_NORM:
        return sum_contrib / jnp.maximum(jnp.sqrt(sum_norm), eps)
    raise ValueError(f"unknown algorithm {algorithm}")  # pragma: no cover


def approximate_cosine_similarity(
    index: ClusterTweetIndex,
    source: SparseEmbedding,
    *,
    max_results: int,
    algorithm: ScoringAlgorithm = ScoringAlgorithm.COSINE,
    min_score: float = 0.0,
    max_top_tweets_per_cluster: Optional[int] = None,
    exclude_tweet_id: Optional[jnp.ndarray] = None,
    earliest_ts: Optional[jnp.ndarray] = None,
    latest_ts: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-query retrieval. Returns (tweet_ids[X], scores[X]).

    Empty result slots have id PAD_ID and score -inf. ``source`` is the
    query's SimClusters embedding truncated to its top-N scan clusters
    (≡ config.maxScanClusters, prod N=50).
    """
    uniq_ids, sum_contrib, sum_norm = accumulate_candidates(
        index,
        source,
        max_top_tweets_per_cluster=max_top_tweets_per_cluster,
        exclude_tweet_id=exclude_tweet_id,
        earliest_ts=earliest_ts,
        latest_ts=latest_ts,
    )
    is_real = uniq_ids != PAD_ID
    score = normalize_scores(
        sum_contrib,
        sum_norm,
        sparse.l2_norm(source),
        sparse.log_norm(source),
        algorithm,
    )
    neg_inf = jnp.float32(-jnp.inf)
    score = jnp.where(is_real & (score >= min_score), score, neg_inf)

    k = min(max_results, score.shape[0])
    top_scores, top_idx = jax.lax.top_k(score, k)
    top_ids = jnp.where(
        jnp.isfinite(top_scores), uniq_ids[top_idx], PAD_ID
    )
    if k < max_results:  # keep the static output width the caller asked for
        pad = max_results - k
        top_ids = jnp.concatenate([top_ids, jnp.full((pad,), PAD_ID, jnp.int32)])
        top_scores = jnp.concatenate([top_scores, jnp.full((pad,), neg_inf)])
    return top_ids, top_scores


def approximate_cosine_similarity_batch(
    index: ClusterTweetIndex,
    sources: SparseEmbedding,  # batched [Q, N]
    **kwargs,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched retrieval: [Q] queries → (ids [Q, X], scores [Q, X])."""
    fn = functools.partial(approximate_cosine_similarity, index, **kwargs)
    return jax.vmap(fn)(sources)


# -- numpy reference (golden-parity oracle for tests) ------------------------


def approximate_cosine_similarity_reference(
    index_ids: np.ndarray,
    index_scores: np.ndarray,
    index_ts: np.ndarray,
    src_ids: np.ndarray,
    src_scores: np.ndarray,
    *,
    max_results: int,
    algorithm: ScoringAlgorithm = ScoringAlgorithm.COSINE,
    min_score: float = 0.0,
    earliest_ts: Optional[int] = None,
    latest_ts: Optional[int] = None,
):
    """Literal hashmap transcription of the JVM loop (test oracle only)."""
    scores_map: dict = {}
    norm_map: dict = {}
    for cid, cscore in zip(src_ids, src_scores):
        if cid == int(PAD_ID) or cid < 0 or cid >= index_ids.shape[0]:
            continue
        for tid, tscore, ts in zip(index_ids[cid], index_scores[cid], index_ts[cid]):
            if tid == int(PAD_ID):
                continue
            if earliest_ts is not None and ts < earliest_ts:
                continue
            if latest_ts is not None and ts > latest_ts:
                continue
            scores_map[tid] = scores_map.get(tid, 0.0) + float(tscore) * float(cscore)
            norm_map[tid] = norm_map.get(tid, 0.0) + float(tscore) ** 2
    src_l2 = float(np.sqrt(np.sum(np.asarray(src_scores, np.float64) ** 2)))
    src_log = float(np.log1p(np.sum(np.asarray(src_scores, np.float64) ** 2)))
    out = []
    for tid, s in scores_map.items():
        if algorithm == ScoringAlgorithm.DOT_PRODUCT:
            v = s
        elif algorithm == ScoringAlgorithm.COSINE:
            v = s / src_l2 / np.sqrt(norm_map[tid])
        elif algorithm == ScoringAlgorithm.LOG_COSINE:
            v = s / src_log / np.log1p(norm_map[tid])
        else:
            v = s / np.sqrt(norm_map[tid])
        if v >= min_score:
            out.append((tid, v))
    out.sort(key=lambda kv: -kv[1])
    return out[:max_results]


# -- exact full-corpus scan (the product-grade exact mode) ---------------------
#
# A TPU holding the whole tweet-embedding corpus in HBM can afford EXACT
# cosine retrieval — recall 1.0 by construction, where the reference's
# cluster-index scan tops out at its algorithmic recall. Densify each query
# over the cluster axis once, then score the corpus in fixed blocks with a
# gather + einsum (bench.py measures this mode's q/s on the 2M-tweet prod
# corpus).


def exact_cosine_scan(
    corpus_ids: jnp.ndarray,  # [T, K] cluster ids per tweet (PAD padded)
    corpus_scores: jnp.ndarray,  # [T, K]
    sources: SparseEmbedding,  # [Q, N] sparse query embeddings
    *,
    num_clusters: int,
    max_results: int,
    block: int = 65536,
    compute_dtype=jnp.float32,
    approx_block_topk: bool = False,
    recall_target: float = 0.99,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full-corpus cosine top-K → (rows [Q, X], scores).

    Returns CORPUS ROW indices (the caller maps rows → tweet ids). T must
    be a multiple of ``block`` (pad the corpus with PAD rows otherwise).

    TPU shape (r5 rework of the r3 kernel):
      - the query table gathers TRANSPOSED ([C, Q]): each corpus cluster id
        reads one contiguous [Q] row instead of a strided [Q, C] column —
        the gather is the kernel's bandwidth term;
      - per-block top-X folds inside the scan (running-carry merge), so the
        [Q, T] score matrix never materializes (400 MB of HBM churn at
        prod shapes) and the final sort is over X·2, not T;
      - ``compute_dtype=bfloat16`` halves the gather/multiply bytes (scores
        accumulate f32 via preferred_element_type);
      - ``approx_block_topk`` swaps the per-block exact sort for
        ``lax.approx_max_k`` (the TPU-shaped collector) — default OFF so
        the default path stays EXACT end to end; the quality-tier product
        turns it on and reports measured recall.
    """
    Q, _ = sources.ids.shape
    T, K = corpus_ids.shape
    if T % block != 0:
        raise ValueError(f"corpus length {T} not a multiple of {block}")
    X = min(max_results, block)
    valid_q = sources.ids != PAD_ID
    q_dense = jnp.zeros((Q, num_clusters), jnp.float32)
    q_dense = q_dense.at[
        jnp.arange(Q)[:, None], jnp.where(valid_q, sources.ids, 0)
    ].add(jnp.where(valid_q, sources.scores, 0.0))
    q_norm = jnp.sqrt(jnp.sum(q_dense * q_dense, axis=1, keepdims=True))
    q_dense = (q_dense / jnp.maximum(q_norm, 1e-9))
    q_dense_t = q_dense.T.astype(compute_dtype)  # [C, Q] contiguous rows

    valid_t = corpus_ids != PAD_ID
    safe_ids = jnp.where(valid_t, corpus_ids, 0)
    t_scores = jnp.where(valid_t, corpus_scores, 0.0)
    t_norm = jnp.maximum(
        jnp.sqrt(jnp.sum(t_scores * t_scores, axis=1)), 1e-9)
    inv_norm = (1.0 / t_norm).astype(jnp.float32)
    t_scores = t_scores.astype(compute_dtype)
    live_row = jnp.any(valid_t, axis=1)

    def block_top(s, rows):
        # (scores [Q, B], rows [Q, B]) → per-block top-X
        if approx_block_topk:
            bs, bi = jax.lax.approx_max_k(
                s, X, recall_target=recall_target)
        else:
            bs, bi = jax.lax.top_k(s, X)
        return bs, jnp.take_along_axis(rows, bi, axis=1)

    def score_block(carry, start):
        c_scores, c_rows = carry  # running [Q, X]
        ti = jax.lax.dynamic_slice_in_dim(safe_ids, start, block, axis=0)
        ts = jax.lax.dynamic_slice_in_dim(t_scores, start, block, axis=0)
        ivn = jax.lax.dynamic_slice_in_dim(inv_norm, start, block, axis=0)
        lv = jax.lax.dynamic_slice_in_dim(live_row, start, block, axis=0)
        qw = q_dense_t[ti.reshape(-1)].reshape(block, K, Q)
        s = jnp.einsum("bkq,bk->qb", qw, ts,
                       preferred_element_type=jnp.float32)
        s = s * ivn[None, :]
        s = jnp.where(lv[None, :], s, -jnp.inf)
        rows = jnp.broadcast_to(
            (start + jnp.arange(block, dtype=jnp.int32))[None, :],
            (Q, block))
        bs, br = block_top(s, rows)
        # merge with the running top (concat + exact top-X over 2X)
        ms = jnp.concatenate([c_scores, bs], axis=1)
        mr = jnp.concatenate([c_rows, br], axis=1)
        ks, ki = jax.lax.top_k(ms, X)
        return (ks, jnp.take_along_axis(mr, ki, axis=1)), ()

    init = (jnp.full((Q, X), -jnp.inf, jnp.float32),
            jnp.full((Q, X), -1, jnp.int32))
    (top_scores, top_rows), _ = jax.lax.scan(
        score_block, init, jnp.arange(0, T, block, dtype=jnp.int32))
    if X < max_results:
        pad = max_results - X
        top_scores = jnp.pad(top_scores, ((0, 0), (0, pad)),
                             constant_values=-jnp.inf)
        top_rows = jnp.pad(top_rows, ((0, 0), (0, pad)),
                           constant_values=-1)
    top_rows = jnp.where(jnp.isfinite(top_scores), top_rows, -1)
    return top_rows, top_scores
