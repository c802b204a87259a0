"""Official benchmark: SANN retrieval recall@100 + queries/s/chip.

Builds a prod-shaped synthetic SimClusters index (cluster→top-M tweets
derived from a sparse tweet-embedding table), runs the fused retrieval scan
batched, and reports:

  - recall@100 of the approximate scan vs. exact brute-force cosine over the
    full tweet table (the ANN-loadtest truth definition,
    ``ann/.../loadtest/LoadTestRecorder.scala:16-60``)
  - queries/s/chip at batch-Q steady state

Prints ONE JSON line. vs_baseline compares q/s on this single chip against
the reference's >6000 RPS *whole prod JVM fleet* through the same path
(``simclusters-ann/README.md:15``).
"""

from __future__ import annotations

import json
import os
import time

import jax

# Persistent compilation cache, repo-local so it survives across runs on the
# same machine (the retrieval program alone takes minutes to compile on a
# tunneled TPU backend; the env-var-only path does not reliably enable the
# cache there, so set the config explicitly before first compile).
_CACHE_DIR = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
try:  # best-effort: these config names don't exist on older JAX versions
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except AttributeError:
    pass
import jax.numpy as jnp
import numpy as np

from the_algorithm_tpu.ops import retrieval, sparse
from the_algorithm_tpu.ops.retrieval import ClusterTweetIndex, ScoringAlgorithm
from the_algorithm_tpu.ops.sparse import PAD_ID, SparseEmbedding
from the_algorithm_tpu.simclusters import ann
from the_algorithm_tpu.training import metrics

# prod-shaped operating point (simclusters-ann/README.md:7,23-33)
C = 8192  # clusters (prod: 145k; scaled so the bench fits one chip's HBM comfortably)
M = 400  # tweets per cluster (prod M=400)
N = 50  # scan clusters (prod N=50)
X = 200  # results (prod X=200)
T = 200_000  # tweet corpus
KT = 16  # clusters per tweet embedding
Q = 256  # query batch
K_RECALL = 100


def build_corpus(seed=0):
    """Sparse tweet embeddings clustered into communities + derived index.

    Cluster load is kept under the index row capacity M (expected
    T·KT/n_comm/clusters_per_comm ≈ 195 < 400), matching the prod regime
    where the streaming job's top-1600 rows rarely saturate.
    """
    rng = np.random.default_rng(seed)
    n_comm = 64
    clusters_per_comm = 16 * KT  # 256 clusters per community
    comm_clusters = np.stack(
        [
            rng.choice(C, clusters_per_comm, replace=False)
            for _ in range(n_comm)
        ]
    )
    tweet_comm = rng.integers(0, n_comm, T)
    ids = np.empty((T, KT), np.int64)
    for t in range(T):
        ids[t] = rng.choice(comm_clusters[tweet_comm[t]], KT, replace=False)
    scores = rng.uniform(0.1, 1.0, size=(T, KT)).astype(np.float32)
    return ids.astype(np.int32), scores, tweet_comm, comm_clusters


def build_index(tweet_ids, tweet_scores):
    """cluster→top-M rows from the tweet table (host-side, numpy)."""
    flat_c = tweet_ids.reshape(-1)
    flat_s = tweet_scores.reshape(-1)
    flat_t = np.repeat(np.arange(T, dtype=np.int32), KT)
    order = np.lexsort((-flat_s, flat_c))
    fc, fs, ft = flat_c[order], flat_s[order], flat_t[order]
    idx_ids = np.full((C, M), int(PAD_ID), np.int32)
    idx_scores = np.zeros((C, M), np.float32)
    start = np.searchsorted(fc, np.arange(C))
    end = np.searchsorted(fc, np.arange(C) + 1)
    for c in range(C):
        n = min(end[c] - start[c], M)
        idx_ids[c, :n] = ft[start[c] : start[c] + n]
        idx_scores[c, :n] = fs[start[c] : start[c] + n]
    ts = np.zeros((C, M), np.int32)
    return idx_ids, idx_scores, ts


def exact_topk(queries_ids, queries_scores, tweet_ids, tweet_scores, k):
    """Brute-force cosine truth via sparse→dense scatter matmul on device."""
    q_dense = np.zeros((Q, C), np.float32)
    for q in range(Q):
        q_dense[q, queries_ids[q]] = queries_scores[q]
    q_dense /= np.maximum(np.linalg.norm(q_dense, axis=1, keepdims=True), 1e-9)

    t_norm = np.sqrt((tweet_scores**2).sum(axis=1))

    qd = jnp.asarray(q_dense)
    ti = jnp.asarray(tweet_ids)
    tsc = jnp.asarray(tweet_scores)
    tn = jnp.asarray(np.maximum(t_norm, 1e-9))

    @jax.jit
    def score_all():
        # gather query weights at each tweet's clusters: [Q, T, KT] is too
        # big; do it as scatter to dense tweet matrix in blocks
        def block(carry, start):
            ti_b = jax.lax.dynamic_slice_in_dim(ti, start, 4096, axis=0)
            ts_b = jax.lax.dynamic_slice_in_dim(tsc, start, 4096, axis=0)
            tn_b = jax.lax.dynamic_slice_in_dim(tn, start, 4096, axis=0)
            qw = qd[:, ti_b.reshape(-1)].reshape(Q, 4096, KT)
            s = jnp.einsum("qtk,tk->qt", qw, ts_b) / tn_b[None, :]
            return carry, s

        _, blocks = jax.lax.scan(
            block, None, jnp.arange(0, T, 4096)
        )
        scores = jnp.moveaxis(blocks, 0, 1).reshape(Q, -1)[:, :T]
        return jax.lax.top_k(scores, k)

    _, top_ids = jax.block_until_ready(score_all())
    return np.asarray(top_ids)


def bench_ranking():
    """MaskNet heavy-ranker scoring throughput (candidates/s/chip)."""
    from the_algorithm_tpu.models import masknet

    cfg = masknet.MaskNetConfig(
        num_features=6000, num_heads=15, mask_blocks=4, block_dim=512,
        aggregation_dim=128, head_hidden=(256, 128),
    )
    model = masknet.MaskNet(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, cfg.num_features), jnp.float32)
    )
    weights = masknet.DEFAULT_HEAD_WEIGHTS

    @jax.jit
    def score(x):
        probs = jax.nn.sigmoid(model.apply(params, x))
        return masknet.weighted_model_score(probs, weights)

    B = 4096
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, cfg.num_features)).astype(np.float32)
    )
    jax.block_until_ready(score(x))  # compile
    # steady state: pipeline dispatches (JAX async dispatch keeps the chip
    # fed back-to-back); blocking once at the end excludes per-call host
    # round-trip latency, which a production front amortizes the same way
    reps = 30
    t0 = time.time()
    out = None
    for _ in range(reps):
        out = score(x)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    return B / dt


def bench_training():
    """MaskNet multi-task train-step throughput (examples/s/chip):
    fwd + bwd + adam update at prod feature width, steady state (the
    params carry makes each scanned step depend on the last)."""
    import optax

    from the_algorithm_tpu.models import masknet

    cfg = masknet.MaskNetConfig(
        num_features=6000, num_heads=15, mask_blocks=4, block_dim=512,
        aggregation_dim=128, head_hidden=(256, 128),
    )
    model = masknet.MaskNet(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, cfg.num_features), jnp.float32)
    )
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    B = 4096
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, cfg.num_features)).astype(np.float32))
    y = jnp.asarray(
        (rng.random((B, cfg.num_heads)) < 0.05).astype(np.float32)
    )

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(
            lambda p: masknet.multi_task_loss(model.apply(p, x), y)
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state, _ = jax.block_until_ready(step(params, opt_state))
    # steady state: successive steps chain through params (async dispatch)
    reps = 20
    t0 = time.time()
    loss = None
    for _ in range(reps):
        params, opt_state, loss = step(params, opt_state)
    jax.block_until_ready(loss)
    dt = (time.time() - t0) / reps
    return B / dt


def main():
    tweet_ids, tweet_scores, tweet_comm, comm_clusters = build_corpus()
    idx_ids, idx_scores, idx_ts = build_index(tweet_ids, tweet_scores)
    index = ClusterTweetIndex(
        jnp.asarray(idx_ids), jnp.asarray(idx_scores), jnp.asarray(idx_ts)
    )

    rng = np.random.default_rng(1)
    # queries: community-flavored user embeddings (top-N clusters)
    q_comm = rng.integers(0, comm_clusters.shape[0], Q)
    q_ids = np.empty((Q, N), np.int64)
    for q in range(Q):
        q_ids[q] = rng.choice(comm_clusters[q_comm[q]], N, replace=False)
    q_scores = rng.uniform(0.2, 1.0, (Q, N)).astype(np.float32)
    sources = SparseEmbedding(
        jnp.asarray(q_ids.astype(np.int32)), jnp.asarray(q_scores)
    )

    cfg = ann.SimClustersANNConfig(
        max_scan_clusters=N, max_top_tweets_per_cluster=M, max_num_results=X,
        scoring_algorithm=ScoringAlgorithm.COSINE,
    )
    query_fn = jax.jit(
        lambda s: ann.get_tweet_candidates_batch(index, s, cfg)
    )
    ids_out, _ = jax.block_until_ready(query_fn(sources))  # compile + correctness output

    # steady state: pipeline dispatches (async) and block once at the end —
    # per-dispatch host latency overlaps device execution exactly as a
    # production front's request pipeline would
    reps = 20
    t0 = time.time()
    out = None
    for _ in range(reps):
        out = query_fn(sources)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    qps = Q / dt

    truth = exact_topk(q_ids, q_scores, tweet_ids, tweet_scores, K_RECALL)
    recall = float(
        metrics.recall_at_k(
            jnp.asarray(np.asarray(ids_out)[:, :K_RECALL]),
            jnp.asarray(truth),
            pad_id=int(PAD_ID),
        )
    )

    # algorithm-parity recall: our kernel vs. the literal JVM hashmap oracle
    # on a query subsample — the "≥95% of reference recall" criterion reduces
    # to this ratio because both run the same published algorithm.
    n_oracle = 16
    oracle_hits, oracle_total = 0, 0
    got_np = np.asarray(ids_out)
    for q in range(n_oracle):
        want = retrieval.approximate_cosine_similarity_reference(
            idx_ids, idx_scores, idx_ts, q_ids[q], q_scores[q],
            max_results=K_RECALL, algorithm=ScoringAlgorithm.COSINE,
        )
        want_ids = {t for t, _ in want}
        got_ids_set = set(got_np[q, :K_RECALL].tolist())
        oracle_hits += len(want_ids & got_ids_set)
        oracle_total += len(want_ids)
    oracle_parity = oracle_hits / max(oracle_total, 1)

    ranking_cps = bench_ranking()
    training_eps = bench_training()

    print(
        json.dumps(
            {
                "metric": "sann_retrieval",
                "value": round(qps, 1),
                "unit": "queries/s/chip",
                "vs_baseline": round(qps / 6000.0, 3),
                "recall_at_100": round(recall, 4),
                "oracle_parity_recall": round(oracle_parity, 4),
                "ranking_candidates_per_s_per_chip": round(ranking_cps, 1),
                "training_examples_per_s_per_chip": round(training_eps, 1),
                "batch": Q,
                "index_shape": [C, M],
                "scan": [N, X],
            }
        )
    )


if __name__ == "__main__":
    main()
