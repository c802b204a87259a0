"""SimClusters-ANN "service": config + query path + sharded execution.

≡ the simclusters-ann Thrift service
(``simclusters-ann/server/.../SimClustersANNCandidateSource.scala:35-95``,
thrift API ``simclusters-ann/thrift/.../simClustersAnn.thrift:8-60``,
per-variant prod config ``modules/ClusterConfigModule.scala``): fetch the
source embedding, truncate to maxScanClusters, multiget cluster rows, score,
filter, top-X.

TPU re-design: the service is a jitted function over a device-resident
:class:`ClusterTweetIndex`; the "multiget" is a gather (single shard) or a
shard_map over a cluster-row-sharded index with an all-gather candidate merge
(the Earlybird-root fan-out pattern, SURVEY.md §2.3). Prod parameters
(``simclusters-ann/README.md:7,23-33``): N=50 scan clusters, M=400
tweets/cluster, X=200 results, cosine threshold ≈0.7.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from the_algorithm_tpu.core.mesh import MODEL_AXIS
from the_algorithm_tpu.ops import retrieval, sparse
from the_algorithm_tpu.ops.retrieval import ClusterTweetIndex, ScoringAlgorithm
from the_algorithm_tpu.ops.sparse import PAD_ID, SparseEmbedding


@dataclasses.dataclass(frozen=True)
class SimClustersANNConfig:
    """≡ thrift ``SimClustersANNConfig`` (simClustersAnn.thrift:18-28)."""

    max_scan_clusters: int = 50  # N
    max_top_tweets_per_cluster: int = 400  # M
    max_num_results: int = 200  # X
    min_score: float = 0.0
    scoring_algorithm: ScoringAlgorithm = ScoringAlgorithm.COSINE
    max_tweet_candidate_age_hours: int = 48
    min_tweet_candidate_age_hours: int = 0


def get_tweet_candidates(
    index: ClusterTweetIndex,
    source_embedding: SparseEmbedding,
    config: SimClustersANNConfig,
    *,
    now: Optional[jnp.ndarray] = None,
    exclude_tweet_id: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-shard query path (``SimClustersANNCandidateSource.get:35-64``)."""
    src = sparse.truncate(source_embedding, config.max_scan_clusters)
    earliest = latest = None
    if now is not None:
        earliest = now - config.max_tweet_candidate_age_hours * 3600
        latest = now - config.min_tweet_candidate_age_hours * 3600
    return retrieval.approximate_cosine_similarity(
        index,
        src,
        max_results=config.max_num_results,
        algorithm=config.scoring_algorithm,
        min_score=config.min_score,
        max_top_tweets_per_cluster=config.max_top_tweets_per_cluster,
        exclude_tweet_id=exclude_tweet_id,
        earliest_ts=earliest,
        latest_ts=latest,
    )


def get_tweet_candidates_batch(
    index: ClusterTweetIndex,
    sources: SparseEmbedding,  # [Q, N]
    config: SimClustersANNConfig,
    *,
    now: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    fn = functools.partial(get_tweet_candidates, index, config=config, now=now)
    return jax.vmap(lambda s: fn(s))(sources)


# -- sharded execution -------------------------------------------------------


def shard_index(mesh: Mesh, index: ClusterTweetIndex) -> ClusterTweetIndex:
    """Place the index cluster-row-sharded over the 'model' axis."""
    sh = NamedSharding(mesh, P(MODEL_AXIS, None))
    return ClusterTweetIndex(
        jax.device_put(index.tweet_ids, sh),
        jax.device_put(index.scores, sh),
        jax.device_put(index.timestamps, sh),
    )


def fetch_cluster_rows(
    mesh: Mesh,
    index: ClusterTweetIndex,  # cluster-row-sharded P('model', None)
    cluster_ids: jnp.ndarray,  # [B] cluster ids; B % model_shards == 0
) -> ClusterTweetIndex:
    """The literal multiget: fetch cluster→top-tweet rows by id, sharded.

    ≡ ``clusterTweetCandidatesStore.multiGet``
    (``SimClustersANNCandidateSource.scala:79``), re-designed as one
    all-to-all row exchange over the 'model' axis — ids route to owner
    shards, owners gather their rows from local HBM, rows route back. The
    three index arrays (ids/scores/timestamps) share a single routing pass.

    Prefer :func:`get_tweet_candidates_sharded` (compute-at-owner) for the
    query path; this is for callers that need the raw rows (index surgery,
    cross-service hydration, host export).
    """
    from the_algorithm_tpu.parallel import sharded_table

    out = sharded_table.multiget_all_to_all(
        mesh,
        {
            "tweet_ids": index.tweet_ids,
            "scores": index.scores,
            "timestamps": index.timestamps,
        },
        cluster_ids,
    )
    return ClusterTweetIndex(out["tweet_ids"], out["scores"], out["timestamps"])


def get_tweet_candidates_sharded(
    mesh: Mesh,
    index: ClusterTweetIndex,  # cluster-row-sharded P('model', None)
    sources: SparseEmbedding,  # [Q, N] replicated queries
    config: SimClustersANNConfig,
    *,
    now: Optional[jnp.ndarray] = None,
    partials_per_shard: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sharded query — the Earlybird-root fan-out as one XLA program.

    Each shard accumulates raw (tweetId, Σ dot, Σ norm²) partials over the
    cluster rows it owns; partials all-gather over 'model'; the merge
    **re-accumulates by tweet id** (sort + segment-sum), so a tweet whose
    contributing clusters span shards scores identically to the single-shard
    path; then normalize / filter / top-X. Exact at the default
    ``partials_per_shard`` (= N·M, an upper bound on any shard's scanned
    entries); smaller explicit values trade the all-gather payload for a
    measured recall loss in the low-dot tail.
    """
    n_shards = mesh.shape[MODEL_AXIS]
    C = index.num_clusters
    if C % n_shards != 0:
        raise ValueError(f"{C} clusters not divisible by {n_shards} shards")
    rows_per_shard = C // n_shards
    X = config.max_num_results
    M = min(config.max_top_tweets_per_cluster, index.tweets_per_cluster)
    # Default partials_per_shard = N·M — EXACT by construction: a shard scans
    # at most all N of the query's clusters (worst case: it owns every one),
    # contributing ≤ N·M partial entries, so a top-N·M truncation by dot can
    # never drop a candidate. Callers may pass a smaller value to cap the
    # all-gather payload; the approximate regime's recall is measured in
    # tests/test_tweet_embeddings_ann.py and reported by bench.py
    # (a candidate is then dropped only if it falls outside some owning
    # shard's top-R partial dots, which favors exactly the low-dot tail).
    R = partials_per_shard or config.max_scan_clusters * M

    earliest = latest = None
    if now is not None:
        earliest = now - config.max_tweet_candidate_age_hours * 3600
        latest = now - config.min_tweet_candidate_age_hours * 3600

    def local(t_ids, t_scores, t_ts, src_ids, src_scores, src_l2, src_log):
        shard = jax.lax.axis_index(MODEL_AXIS)
        offset = shard * rows_per_shard
        local_index = ClusterTweetIndex(t_ids, t_scores, t_ts)

        def one_query(ids, scores, l2, log):
            local_cid = ids - offset
            own = (ids != PAD_ID) & (local_cid >= 0) & (local_cid < rows_per_shard)
            src = SparseEmbedding(
                jnp.where(own, local_cid, PAD_ID),
                jnp.where(own, scores, 0.0),
            )
            uniq, dot, norm = retrieval.accumulate_candidates(
                local_index, src,
                max_top_tweets_per_cluster=config.max_top_tweets_per_cluster,
                earliest_ts=earliest, latest_ts=latest,
            )
            # keep top-R partials by dot (bandwidth cap for the gather);
            # at the exact default R ≥ #partials the selection is the
            # identity — skip the top_k sort entirely
            if R >= uniq.shape[0]:
                return uniq, dot, norm
            key = jnp.where(uniq != PAD_ID, dot, -jnp.inf)
            _, idx = jax.lax.top_k(key, R)
            return uniq[idx], dot[idx], norm[idx]

        uniq, dot, norm = jax.vmap(one_query)(
            src_ids, src_scores, src_l2, src_log
        )  # [Q, R]
        # fan-in: gather partials from every shard, re-merge by tweet id
        g_ids = jax.lax.all_gather(uniq, MODEL_AXIS, axis=1, tiled=True)
        g_dot = jax.lax.all_gather(dot, MODEL_AXIS, axis=1, tiled=True)
        g_norm = jax.lax.all_gather(norm, MODEL_AXIS, axis=1, tiled=True)

        def merge_query(ids, dots, norms, l2, log):
            uniq2, dot2, norm2 = retrieval._dedup_sum(ids, dots, norms)
            score = retrieval.normalize_scores(
                dot2, norm2, l2, log, config.scoring_algorithm
            )
            is_real = uniq2 != PAD_ID
            score = jnp.where(
                is_real & (score >= config.min_score), score, -jnp.inf
            )
            ts, ti = jax.lax.top_k(score, X)
            return jnp.where(jnp.isfinite(ts), uniq2[ti], PAD_ID), ts

        return jax.vmap(merge_query)(g_ids, g_dot, g_norm, src_l2, src_log)

    src = SparseEmbedding(
        sources.ids[:, : config.max_scan_clusters],
        sources.scores[:, : config.max_scan_clusters],
    )
    src_l2 = jax.vmap(sparse.l2_norm)(src)
    src_log = jax.vmap(sparse.log_norm)(src)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(MODEL_AXIS, None), P(MODEL_AXIS, None), P(MODEL_AXIS, None),
            P(), P(), P(), P(),
        ),
        out_specs=(P(), P()),
        check_vma=False,  # all_gather output is replicated over 'model'
    )
    return fn(
        index.tweet_ids, index.scores, index.timestamps,
        src.ids, src.scores, src_l2, src_log,
    )


def get_tweet_candidates_query_sharded(
    mesh: Mesh,
    index: ClusterTweetIndex,  # cluster-row-sharded P('model', None)
    sources: SparseEmbedding,  # [Q, N]; Q % model_shards == 0
    config: SimClustersANNConfig,
    *,
    now: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Query-sharded fan-out — the scaling-book shape of the service.

    :func:`get_tweet_candidates_sharded` replicates every query's scan on
    every shard and re-merges (the Earlybird-root broadcast pattern: right
    when the bottleneck is index size). This variant instead shards the
    QUERY batch over 'model': each chip handles Q/n queries end-to-end,
    fetching the cluster rows it needs from their owner shards with the
    all-to-all row-exchange multiget (``SimClustersANNCandidateSource``'s
    ``clusterTweetCandidatesStore.multiGet:79`` as one collective), then
    accumulates/normalizes/top-Ks locally. Per-chip compute drops n×
    (true weak scaling over request rate); comms per chip ≈ (Q/n)·N·M rows.
    Exact: identical results to the single-device batch path.
    """
    from the_algorithm_tpu.parallel import sharded_table

    n_shards = mesh.shape[MODEL_AXIS]
    Q = sources.ids.shape[0]
    if Q % n_shards != 0:
        raise ValueError(f"{Q} queries not divisible by {n_shards} shards")
    C = index.num_clusters
    if C % n_shards != 0:
        raise ValueError(f"{C} clusters not divisible by {n_shards} shards")
    rps = C // n_shards
    N = config.max_scan_clusters
    M = min(config.max_top_tweets_per_cluster, index.tweets_per_cluster)
    X = config.max_num_results

    earliest = latest = None
    if now is not None:
        earliest = now - config.max_tweet_candidate_age_hours * 3600
        latest = now - config.min_tweet_candidate_age_hours * 3600

    def local(t_ids, t_scores, t_ts, src_ids, src_scores, src_l2, src_log):
        Ql = src_ids.shape[0]
        valid = src_ids != PAD_ID
        flat = jnp.where(valid, src_ids, 0).reshape(-1)  # [Ql*N]
        rows, _ = sharded_table.route_and_gather(
            {"ids": t_ids[:, :M], "scores": t_scores[:, :M],
             "ts": t_ts[:, :M]},
            flat, rows_per_shard=rps,
        )
        r_ids = rows["ids"].reshape(Ql, N, M)
        r_scores = rows["scores"].reshape(Ql, N, M)
        r_ts = rows["ts"].reshape(Ql, N, M)

        def one_query(ri, rs, rt, si, ss, l2, log):
            uniq, dot, norm = retrieval.accumulate_from_rows(
                ri, rs, rt, SparseEmbedding(si, ss),
                earliest_ts=earliest, latest_ts=latest,
            )
            score = retrieval.normalize_scores(
                dot, norm, l2, log, config.scoring_algorithm)
            is_real = uniq != PAD_ID
            score = jnp.where(
                is_real & (score >= config.min_score), score, -jnp.inf)
            ts_, ti = jax.lax.top_k(score, X)
            return jnp.where(jnp.isfinite(ts_), uniq[ti], PAD_ID), ts_

        return jax.vmap(one_query)(
            r_ids, r_scores, r_ts, src_ids, src_scores, src_l2, src_log)

    # the same truncation the single-device path applies (cluster ORDER
    # included, so floating-point accumulation order — and therefore
    # boundary top-K membership — matches bit-for-bit)
    src = jax.vmap(lambda i, s: sparse.truncate(SparseEmbedding(i, s), N))(
        sources.ids, sources.scores)
    src_l2 = jax.vmap(sparse.l2_norm)(src)
    src_log = jax.vmap(sparse.log_norm)(src)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(MODEL_AXIS, None), P(MODEL_AXIS, None), P(MODEL_AXIS, None),
            P(MODEL_AXIS, None), P(MODEL_AXIS, None),
            P(MODEL_AXIS), P(MODEL_AXIS),
        ),
        out_specs=(P(MODEL_AXIS, None), P(MODEL_AXIS, None)),
        check_vma=False,
    )
    return fn(
        index.tweet_ids, index.scores, index.timestamps,
        src.ids, src.scores, src_l2, src_log,
    )


def get_tweet_candidates_hybrid(
    mesh: Mesh,
    index: ClusterTweetIndex,  # cluster-row-sharded P('model', None)
    sources: SparseEmbedding,  # [Q, N]; Q % data_shards == 0
    config: SimClustersANNConfig,
    *,
    now: Optional[jnp.ndarray] = None,
    partials_per_shard: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Query × index hybrid sharding — the shape that survives BOTH axes
    growing (index larger than one chip's HBM AND request rate beyond one
    chip's scan throughput).

    Mesh: queries shard over 'data' (D_q ways), cluster rows over 'model'
    (D_i ways). Each device scans ITS query slice against ITS index shard
    (compute-at-owner — no row exchange at all, the accumulate reads local
    HBM only); per-query partials all-gather over 'model' ONLY (a D_i-wide
    collective instead of the index-sharded path's full-mesh one), and the
    exact by-tweet-id re-merge + top-X runs on the query's owner. Per-device
    scan work drops D_q× versus :func:`get_tweet_candidates_sharded` (whose
    collapse under scaling was exactly the D-times-replicated query scan),
    and the partial-merge payload drops D_q× with it. Exact at the default
    partials cap, like the index-sharded path.
    """
    from the_algorithm_tpu.core.mesh import DATA_AXIS

    d_q = mesh.shape[DATA_AXIS]
    d_i = mesh.shape[MODEL_AXIS]
    Q = sources.ids.shape[0]
    if Q % d_q != 0:
        raise ValueError(f"{Q} queries not divisible by {d_q} data shards")
    C = index.num_clusters
    if C % d_i != 0:
        raise ValueError(f"{C} clusters not divisible by {d_i} index shards")
    rows_per_shard = C // d_i
    X = config.max_num_results
    M = min(config.max_top_tweets_per_cluster, index.tweets_per_cluster)
    R = partials_per_shard or config.max_scan_clusters * M

    earliest = latest = None
    if now is not None:
        earliest = now - config.max_tweet_candidate_age_hours * 3600
        latest = now - config.min_tweet_candidate_age_hours * 3600

    def local(t_ids, t_scores, t_ts, src_ids, src_scores, src_l2, src_log):
        shard = jax.lax.axis_index(MODEL_AXIS)
        offset = shard * rows_per_shard
        local_index = ClusterTweetIndex(t_ids, t_scores, t_ts)

        def one_query(ids, scores, l2, log):
            local_cid = ids - offset
            own = ((ids != PAD_ID) & (local_cid >= 0)
                   & (local_cid < rows_per_shard))
            src = SparseEmbedding(
                jnp.where(own, local_cid, PAD_ID),
                jnp.where(own, scores, 0.0),
            )
            uniq, dot, norm = retrieval.accumulate_candidates(
                local_index, src,
                max_top_tweets_per_cluster=config.max_top_tweets_per_cluster,
                earliest_ts=earliest, latest_ts=latest,
            )
            if R >= uniq.shape[0]:
                return uniq, dot, norm
            key = jnp.where(uniq != PAD_ID, dot, -jnp.inf)
            _, idx = jax.lax.top_k(key, R)
            return uniq[idx], dot[idx], norm[idx]

        uniq, dot, norm = jax.vmap(one_query)(
            src_ids, src_scores, src_l2, src_log)  # [Q/dq, R]
        # fan-in across INDEX shards only (the 'model' axis) — ONE fused
        # collective: dot/norm bitcast into int32 lanes and stacked with
        # the ids so the fan-in pays one launch instead of three (the
        # 2x2 mesh point sits within noise of the 0.8 bar;
        # collective-launch overhead is the controllable term). Integer
        # lanes, not float: a float path may flush denormal bit patterns.
        bc_i = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)  # noqa: E731
        bc_f = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)  # noqa: E731
        packed = jnp.stack([uniq, bc_i(dot), bc_i(norm)], axis=-1)
        g = jax.lax.all_gather(
            packed, MODEL_AXIS, axis=1, tiled=True)  # [Q/dq, d_i*R, 3]
        g_ids = g[..., 0]
        g_dot = bc_f(g[..., 1])
        g_norm = bc_f(g[..., 2])

        def merge_query(ids, dots, norms, l2, log):
            uniq2, dot2, norm2 = retrieval._dedup_sum(ids, dots, norms)
            score = retrieval.normalize_scores(
                dot2, norm2, l2, log, config.scoring_algorithm)
            is_real = uniq2 != PAD_ID
            score = jnp.where(
                is_real & (score >= config.min_score), score, -jnp.inf)
            ts, ti = jax.lax.top_k(score, X)
            return jnp.where(jnp.isfinite(ts), uniq2[ti], PAD_ID), ts

        return jax.vmap(merge_query)(g_ids, g_dot, g_norm, src_l2, src_log)

    src = SparseEmbedding(
        sources.ids[:, : config.max_scan_clusters],
        sources.scores[:, : config.max_scan_clusters],
    )
    src_l2 = jax.vmap(sparse.l2_norm)(src)
    src_log = jax.vmap(sparse.log_norm)(src)
    from the_algorithm_tpu.core.mesh import DATA_AXIS as DA

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(MODEL_AXIS, None), P(MODEL_AXIS, None), P(MODEL_AXIS, None),
            P(DA, None), P(DA, None), P(DA), P(DA),
        ),
        out_specs=(P(DA, None), P(DA, None)),
        check_vma=False,  # model-axis all_gather replicates over 'model'
    )
    return fn(
        index.tweet_ids, index.scores, index.timestamps,
        src.ids, src.scores, src_l2, src_log,
    )
