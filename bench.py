"""Official benchmark: SANN retrieval recall@100 + queries/s/chip at prod shape.

Builds a prod-shaped synthetic SimClusters index — C=145,408 clusters (prod
145k, ``simclusters_v2/README.md:33``), M=400 tweets/cluster, 2M-tweet corpus
with up to KT=32 clusters/tweet — runs the fused retrieval scan batched
(single-chip AND the shard_map fan-out path), and reports:

  - recall@100 of the approximate scan vs. exact brute-force cosine over the
    full tweet table (the ANN-loadtest truth definition,
    ``ann/.../loadtest/LoadTestRecorder.scala:16-60``)
  - queries/s/chip at batch-Q steady state (single-chip + sharded paths)
  - MaskNet ranking candidates/s/chip and training examples/s/chip with
    XLA-counted FLOPs and MFU vs. the chip's bf16 peak
  - the all-to-all sharded-table lookup microbench: rows/s and GB/s vs. the
    HBM roofline on a 16M-row table (ICI legs of the exchange are exercised
    on the 8-device CPU mesh in tests; one real chip here → HBM-only)

Prints ONE JSON line. vs_baseline compares retrieval q/s on this single chip
against the reference's >6000 RPS *whole prod JVM fleet* through the same
path (``simclusters-ann/README.md:15``).
"""

from __future__ import annotations

import functools
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

# prod operating point (simclusters-ann/README.md:7,23-33; summingbird
# Configs.scala:38-61; simclusters_v2/README.md:33)
N_COMM = 512
CPC = 284  # clusters per community (disjoint cover)
C = N_COMM * CPC  # 145,408 clusters ≈ prod 145k
M = 400  # tweets per cluster (prod M=400)
N = 50  # scan clusters (prod N=50)
X = 200  # results (prod X=200)
T = 2_000_000  # tweet corpus
KT = 32  # clusters per tweet embedding (prod tweets carry up to 400)
Q = 256  # query batch
K_RECALL = 100

# chip peak tables (bf16 matmul FLOP/s, HBM bytes/s) by device_kind substring
_CHIP_PEAKS = {
    "v5 lite": (197e12, 819e9),
    "v5e": (197e12, 819e9),
    "v5p": (459e12, 2765e9),
    "v6 lite": (918e12, 1640e9),
    "v6e": (918e12, 1640e9),
    "v4": (275e12, 1228e9),
}


def chip_peaks():
    kind = jax.devices()[0].device_kind
    for sub, peaks in _CHIP_PEAKS.items():
        if sub in kind.lower():
            return kind, peaks
    return kind, (None, None)


def _compiled_flops(jitted, *args):
    """XLA's own FLOP count for the compiled program (audit-friendly MFU)."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


def build_corpus(seed=0):
    """Sparse tweet embeddings clustered into communities (vectorized).

    Communities partition the cluster space (disjoint cover of all C
    clusters); each tweet draws KT distinct clusters from one community via a
    pre-sampled subset pool. Average cluster load T·KT/C ≈ 440 > M, so index
    rows saturate at top-400 — the prod streaming-job regime.
    """
    rng = np.random.default_rng(seed)
    comm_clusters = rng.permutation(C).reshape(N_COMM, CPC).astype(np.int32)
    n_pool = 256  # distinct KT-subsets per community
    keys = np.argsort(
        rng.random((N_COMM, n_pool, CPC)), axis=-1
    )[..., :KT]
    pools = np.take_along_axis(
        np.broadcast_to(comm_clusters[:, None, :], (N_COMM, n_pool, CPC)),
        keys, axis=-1,
    )  # [N_COMM, n_pool, KT]
    tweet_comm = rng.integers(0, N_COMM, T)
    pick = rng.integers(0, n_pool, T)
    ids = pools[tweet_comm, pick]  # [T, KT] distinct per tweet
    scores = rng.uniform(0.1, 1.0, size=(T, KT)).astype(np.float32)
    return ids.astype(np.int32), scores, tweet_comm, comm_clusters


def build_index(tweet_ids, tweet_scores):
    """cluster→top-M rows from the tweet table (host-side, vectorized)."""
    flat_c = tweet_ids.reshape(-1)
    flat_s = tweet_scores.reshape(-1)
    flat_t = np.repeat(np.arange(T, dtype=np.int32), KT)
    order = np.lexsort((-flat_s, flat_c))
    fc, fs, ft = flat_c[order], flat_s[order], flat_t[order]
    idx_ids = np.full((C, M), int(PAD_ID), np.int32)
    idx_scores = np.zeros((C, M), np.float32)
    start = np.searchsorted(fc, np.arange(C))
    rank = np.arange(fc.shape[0], dtype=np.int64) - start[fc]
    keep = rank < M
    idx_ids[fc[keep], rank[keep]] = ft[keep]
    idx_scores[fc[keep], rank[keep]] = fs[keep]
    ts = np.zeros((C, M), np.int32)
    return idx_ids, idx_scores, ts


EXACT_BLK = 65536  # r5 kernel blocks (per-block top-X folds in the scan)


def exact_topk(queries_ids, queries_scores, tweet_ids, tweet_scores, k):
    """Brute-force cosine truth via the framework's exact scan
    (``retrieval.exact_cosine_scan`` — the product-grade exact mode).

    Also measures the TURBO full-corpus scan (bf16 gather +
    ``approx_max_k`` per-block collectors) and its measured recall vs the
    exact truth — the quality-tier product's operating point.
    """
    BLK = EXACT_BLK
    T_pad = ((T + BLK - 1) // BLK) * BLK
    ti = np.full((T_pad, KT), int(PAD_ID), np.int32)
    tsc = np.zeros((T_pad, KT), np.float32)
    ti[:T] = tweet_ids
    tsc[:T] = tweet_scores
    q_ids = np.asarray(queries_ids, np.int32)
    q_sc = np.asarray(queries_scores, np.float32)

    # arrays are arguments, never closures: closed-over device arrays embed
    # as HLO constants and blow past the remote-compile payload limit
    scan = jax.jit(functools.partial(
        retrieval.exact_cosine_scan,
        num_clusters=C, max_results=k, block=BLK,
    ))
    src = SparseEmbedding(jnp.asarray(q_ids), jnp.asarray(q_sc))
    ti_d, tsc_d = jnp.asarray(ti), jnp.asarray(tsc)
    rows, _ = scan(ti_d, tsc_d, src)
    ids_np = np.asarray(rows)  # corpus rows ARE tweet ids here

    # product-grade EXACT mode throughput: recall 1.0 by construction —
    # the "beat the reference recall" lever a corpus-in-HBM design buys
    def run(_):
        return scan(ti_d, tsc_d, src)

    dt = _steady_state(run, None, reps=8)

    # turbo mode: bf16 + approx per-block collectors; recall measured, not
    # assumed — this is what the exact-tier product serves at scale
    turbo = jax.jit(functools.partial(
        retrieval.exact_cosine_scan,
        num_clusters=C, max_results=k, block=BLK,
        compute_dtype=jnp.bfloat16, approx_block_topk=True,
        recall_target=0.99,
    ))
    t_rows, _ = turbo(ti_d, tsc_d, src)
    t_ids = np.asarray(t_rows)
    hits = sum(
        len(set(t_ids[q].tolist()) & set(ids_np[q].tolist()))
        for q in range(Q))
    turbo_recall = hits / float(Q * k)

    def run_turbo(_):
        return turbo(ti_d, tsc_d, src)

    t_dt = _steady_state(run_turbo, None, reps=8)
    return ids_np, Q / dt, Q / t_dt, turbo_recall


def _materialize(out):
    """Force execution by FETCHING a (small) value.

    On the tunneled remote backend ``block_until_ready`` returns before the
    device has executed anything (measured: a 6-TFLOP program "blocks" in
    0.3 ms); only a host fetch round-trips through the execution stream. The
    device stream is in-order, so fetching the last output's smallest leaf
    forces every queued dispatch to finish.
    """
    leaves = jax.tree_util.tree_leaves(out)
    smallest = min(leaves, key=lambda l: getattr(l, "size", 0))
    np.asarray(smallest)


def _steady_state(fn, arg, reps):
    """Pipeline async dispatches, fetch once — production-front amortization.

    The single ~24 ms tunnel round-trip of the final fetch is amortized over
    ``reps`` dispatches; keep reps high enough that it stays <10% of total.
    """
    _materialize(fn(arg))  # warm + sync
    out = None
    t0 = time.time()
    for _ in range(reps):
        out = fn(arg)
    _materialize(out)
    return (time.time() - t0) / reps


def bench_ranking():
    """MaskNet heavy-ranker scoring throughput (candidates/s/chip) + MFU."""
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

    # params CLOSED OVER deliberately: as compile-time constants XLA packs
    # the weight layouts once (params-as-argument measured 0.54 MFU vs 0.68
    # closed — runtime-arg weights pay per-call layout work). The ~60 MB
    # constant payload is safely under the remote-compile limit; only the
    # big activations (x) must be arguments.
    @jax.jit
    def score(x):
        probs = jax.nn.sigmoid(model.apply(params, x))
        return masknet.weighted_model_score(probs, weights)

    B = 16384  # MFU peaks here on v5e (0.36 @ 4k → 0.74 @ 16k; flat @ 24k+)
    # serving feeds bf16 features: the model computes in bf16 anyway, and
    # the f32→bf16 input cast inside the program costs ~0.08 MFU (measured
    # 0.667 f32-in vs 0.745 bf16-in — the cast + doubled input HBM read)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, cfg.num_features))
    ).astype(jnp.bfloat16)
    flops = _compiled_flops(score, x)
    dt = _steady_state(score, x, reps=100)
    return B / dt, (flops / dt if flops else None), (flops / B if flops else None)


def bench_training():
    """MaskNet multi-task train-step throughput (examples/s/chip) + MFU."""
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
    # r5: Adam moments stored bf16 (training/optimizers.py) — cuts the
    # optimizer-state HBM traffic of the update phase; measured 0.664 MFU
    # vs 0.651 with f32 moments on this step. The other named lever —
    # pinning argument-weight layouts — was measured and CANNOT express
    # the closed-over-weights advantage: Format(Layout.AUTO) on all args
    # = 0.530 (XLA's auto search picks WORSE layouts for this step),
    # AUTO on the state only = 0.664 (it picks the defaults). The
    # closed-over fwd win (0.745) comes from compile-time weight
    # specialization (constants get pre-transposed/fused), which no
    # runtime arg layout reproduces — see MFU_NOTES.md r5 addendum.
    from the_algorithm_tpu.training.optimizers import adam_bf16

    tx = adam_bf16(1e-3)
    opt_state = tx.init(params)

    # r4 operating point from the MFU_NOTES.md sweep: bf16 inputs +
    # donated state at B=16384 (0.623 vs the r3 0.609 at f32/8k). The step
    # is COMPUTE-bound by XLA's own cost analysis (AI 281 > ridge 240);
    # remat hurt (-25% examples/s).
    B = 16384
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(B, cfg.num_features)).astype(np.float32)
    ).astype(jnp.bfloat16)
    y = jnp.asarray(
        (rng.random((B, cfg.num_heads)) < 0.05).astype(np.float32)
    )

    # batch passed as ARGUMENTS — closed-over device arrays embed as HLO
    # constants and blow the remote-compile payload limit (see exact_topk)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, x, y):
        params, opt_state = state
        loss, grads = jax.value_and_grad(
            lambda p: masknet.multi_task_loss(model.apply(p, x), y)
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    flops = _compiled_flops(step, (params, opt_state), x, y)
    state = step((params, opt_state), x, y)
    _materialize(state)  # compile + sync
    reps = 50
    t0 = time.time()
    for _ in range(reps):
        state = step(state, x, y)  # loop-carried: truly serialized
    _materialize(state)
    dt = (time.time() - t0) / reps
    return B / dt, (flops / dt if flops else None)


def bench_lookup():
    """All-to-all sharded-table lookup vs. the HBM roofline (BASELINE kernel).

    One real chip here → the exchange's ICI legs are identity and the cost is
    the HBM row gather + output write; multi-shard routing is validated on
    the 8-device CPU mesh (tests/test_parallel.py) and in dryrun_multichip.
    """
    from the_algorithm_tpu.core.mesh import MeshSpec, make_mesh
    from the_algorithm_tpu.parallel import sharded_table

    rows, dim = 16_000_000, 128  # 8.2 GB table
    mesh = make_mesh(MeshSpec(data=1, model=jax.device_count()))
    key = jax.random.PRNGKey(0)
    table = jax.device_put(
        jax.random.normal(key, (rows, dim), jnp.float32),
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("model", None)
        ),
    )
    B, iters = 65536, 16
    ids_all = jnp.asarray(
        np.random.default_rng(1).integers(0, rows, (iters, B), dtype=np.int64),
        jnp.int32,
    )

    @jax.jit
    def run(table, ids_all):
        def step(acc, ids):
            got = sharded_table.multiget_all_to_all(mesh, table, ids)
            return acc + jnp.sum(got, dtype=jnp.float32), None

        acc, _ = jax.lax.scan(step, jnp.float32(0), ids_all)
        return acc

    @jax.jit
    def run_bare(table, ids_all):
        # the machine ceiling for this access pattern: a bare XLA row
        # gather with no routing wrapper. Random 512 B reads from an 8 GB
        # table are transaction-latency-limited (measured ~11 ns/row on
        # v5e regardless of method: bare take, shard_map multiget, and
        # Pallas per-row/unrolled DMA variants are all ≥ this; streaming
        # HBM peak is NOT reachable at this row size).
        def step(acc, ids):
            return acc + jnp.sum(table[ids], dtype=jnp.float32), None
        acc, _ = jax.lax.scan(step, jnp.float32(0), ids_all)
        return acc

    def timed(fn):
        _materialize(fn(table, ids_all))  # compile + sync
        reps = 20
        t0 = time.time()
        out = None
        for _ in range(reps):
            out = fn(table, ids_all)
        _materialize(out)
        return (time.time() - t0) / reps

    dt = timed(run)
    dt_bare = timed(run_bare)
    rows_per_s = iters * B / dt
    bytes_moved = iters * B * dim * 4 * 2  # row read + output write
    return rows_per_s, bytes_moved / dt, dt_bare / dt


def bench_foryou_batched(sann_ids, sann_scores, sann_dt_per_request,
                         exact_corpus=None, q_embs=None,
                         recall_approx=None, recall_turbo=None):
    """End-to-end For You product via the batched engine (the r4 path).

    R concurrent requests share EVERY device program: one earlybird
    in-network scan (262k-doc index), one UTEG traversal, the SANN batch
    rows, and one fused wide-hydration + MaskNet scoring program
    (``mixers/batched_foryou.py`` + ``mixers/device_hydration.py``).
    The world runs at reference candidate pressure: ≥1,300 candidates
    scored per request (``ScoredTweetsRecommendationPipelineConfig.scala:
    446-461`` feeds ~1.5k), 16k-user feature world, 262k-doc realtime
    index. Also exercises the RequestBatcher serving front (navi's
    size+deadline rule at the product edge, ``batch.rs:116-200``).

    Returns (serial_rps, p50_ms, p99_ms, scored_per_req, curve,
    best_batched_rps, front_rps).
    """
    from the_algorithm_tpu.graph import uteg as uteg_mod
    from the_algorithm_tpu.mixers import batched_foryou as bf
    from the_algorithm_tpu.mixers import device_hydration as dh
    from the_algorithm_tpu.mixers import feature_schema as fsch
    from the_algorithm_tpu.mixers import home_mixer
    from the_algorithm_tpu.mixers import wide_hydrators as wh
    from the_algorithm_tpu.models import masknet
    from the_algorithm_tpu.search import earlybird as eb

    NOW = 10_000_000
    NU, A, NT = 16384, 4096, 1 << 17
    EB_DOCS = 1 << 18  # 262,144 docs ≈ the realtime-tier partition scale
    PB = 1536
    rng = np.random.default_rng(7)
    accel = jax.devices()[0]
    try:
        cpu = jax.devices("cpu")[0]
    except Exception:
        cpu = None
    import contextlib

    host = (jax.default_device(cpu) if cpu is not None
            else contextlib.nullcontext())

    with host:
        world = wh.synthetic_world(
            seed=5, num_users=NU, num_authors=A, num_tweets=NT,
            engagement_width=16, now=NOW, include_device_spec=True)
        spec = world.pop("device_spec")
        tables, fns, resolvers = dh.build_from_world(world, spec)
    tables = jax.device_put(tables, accel)

    toks = rng.integers(1, 50_000, (EB_DOCS, 8)).astype(np.int32)
    eindex = eb.EarlybirdIndex(
        jnp.asarray(toks),
        jnp.asarray((np.arange(EB_DOCS) % A).astype(np.int32)),
        jnp.asarray((NOW - rng.integers(0, 40 * 3600, EB_DOCS))
                    .astype(np.int32)),
        jnp.asarray(rng.random((EB_DOCS, len(eb.DOC_FEATURES)))
                    .astype(np.float32)),
        jnp.asarray(np.arange(3_000_000, 3_000_000 + EB_DOCS,
                              dtype=np.int32)),
        jnp.int32(EB_DOCS))
    eindex = jax.device_put(eindex, accel)

    graph = uteg_mod.init_graph(NU, width=32)
    n_ev = NU * 16
    with host:
        graph = uteg_mod.record_engagements(
            graph,
            jnp.asarray(rng.integers(0, NU, n_ev), jnp.int32),
            jnp.asarray(rng.integers(0, 1 << 15, n_ev), jnp.int32),
            jnp.asarray(np.full(n_ev, int(uteg_mod.EngagementType.FAVORITE)),
                        jnp.int32),
            jnp.asarray(np.sort(rng.integers(NOW - 86400, NOW, n_ev)),
                        jnp.int32))
    graph = jax.device_put(graph, accel)

    F = fsch.total_width(fsch.WIDE_SCHEMA)
    mcfg = masknet.MaskNetConfig(
        num_features=F, num_heads=15, mask_blocks=4, block_dim=512,
        aggregation_dim=128, head_hidden=(256, 128),
        dtype=("bfloat16" if jax.default_backend() == "tpu" else "float32"))
    model = masknet.MaskNet(mcfg)
    with host:
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, F), jnp.float32))
    params = jax.device_put(params, accel)
    scorer = dh.DeviceHydrationScorer(
        tables, fns, resolvers, model, params,
        masknet.DEFAULT_HEAD_WEIGHTS, pad_b=PB,
        compute_dtype=(jnp.bfloat16 if jax.default_backend() == "tpu"
                       else jnp.float32),
        # diversity rescore + top-K run ON DEVICE: the result fetch
        # shrinks from [R, PB, 16] to [R, 50, 17] (+15% at R=32)
        select_top_k=50)
    scorer.tables, scorer.params = tables, params

    # OON legs: REAL SANN retrieval rows from the measured batch program
    # (two product slices of the prod-shape index scan)
    half = sann_ids.shape[0] // 2
    seeds = rng.integers(0, NU, (NU, 8)).astype(np.int32)
    engine = bf.BatchedForYouEngine(
        batch_sources=[
            bf.PrecomputedBatchSource(sann_ids[:half], sann_scores[:half]),
            bf.EarlybirdBatchSource(eindex, NOW, max_results=700),
            bf.UtegBatchSource(graph, lambda u: seeds[u % NU],
                               max_results=400),
            bf.PrecomputedBatchSource(
                sann_ids[half:], sann_scores[half:], name="TweetMixer"),
        ],
        scorer=scorer, head_names=masknet.DEFAULT_HEAD_NAMES,
        lift=bf.ColumnsLift(A, NOW),
    )

    def make_query(u):
        return home_mixer.ForYouQuery(
            user_id=int(u),
            followed_authors=[int(a)
                              for a in np.sort(rng.choice(A, 48, False))],
            max_results=50, now=NOW)

    # compile each (power-of-two) batch shape once
    for R in (1, 2, 4, 8, 16, 32):
        with host:
            out = engine.serve_batch([make_query(u) for u in range(R)])
        assert all(len(o) > 0 for o in out)

    # scored-candidate pressure (outside timing)
    with host:
        n_scored = float(np.mean(
            [len(c) for c in engine._retrieve(
                [make_query(u) for u in range(8)], None)]))

    # serial phase: R=1, per-request latency distribution
    U = 32
    lat = []
    with host:
        for u in range(U):
            t0 = time.time()
            engine.serve_batch([make_query(100 + u)])
            lat.append(time.time() - t0 + sann_dt_per_request)
    lat_ms = np.sort(np.asarray(lat)) * 1e3
    serial_rps = 1.0 / float(np.mean(lat))

    # batch-size curve
    curve = []
    for R in (4, 8, 16, 32):
        batch = [make_query(200 + u) for u in range(R)]
        reps = 4
        t0 = time.time()
        with host:
            for _ in range(reps):
                engine.serve_batch(batch)
        dt = (time.time() - t0) / reps + R * sann_dt_per_request
        curve.append({"batch": R, "requests_per_s": round(R / dt, 1),
                      "batch_ms": round(dt * 1e3, 1)})
    best_rps = max(c["requests_per_s"] for c in curve)

    # serving front: concurrent clients through the RequestBatcher with
    # TWO pipelined workers (batch k+1's host phases hide under batch k's
    # device programs — the navi double-buffering shape)
    from concurrent.futures import ThreadPoolExecutor

    from the_algorithm_tpu.serving.batcher import BatcherConfig, RequestBatcher

    def serve(queries):
        with host:
            return engine.serve_batch(queries)

    front = RequestBatcher(
        serve, BatcherConfig(max_batch_size=32, max_delay_ms=10.0),
        n_workers=2)
    try:
        # in-flight clients = 2× the batch size: with exactly one batch's
        # worth of clients, the client wave IS the batch and the second
        # pipelined worker never has a queued batch to prepare — the
        # pipeline can only overlap host and device phases when the
        # backlog exceeds one batch (real fronts run deep backlogs)
        N_REQ = 192
        with ThreadPoolExecutor(max_workers=64) as ex:
            t0 = time.time()
            futs = [ex.submit(front.serve, make_query(300 + i))
                    for i in range(N_REQ)]
            outs = [f.result(timeout=120) for f in futs]
            front_dt = time.time() - t0 + N_REQ * sann_dt_per_request
        assert all(len(o) > 0 for o in outs)
        front_rps = N_REQ / front_dt

        # per-request latency at FIXED OFFERED LOAD (the serving SLO
        # number): open-loop Poisson arrivals at ~80% of the measured
        # front capacity, p50/p95/p99 across completed requests
        offered = 0.8 * front_rps
        lat_rng = np.random.default_rng(17)
        gaps = lat_rng.exponential(1.0 / offered, 96)
        req_lat = []

        def one_req(i):
            t0 = time.perf_counter()
            out = front.serve(make_query(600 + i), timeout=120)
            req_lat.append(time.perf_counter() - t0
                           + sann_dt_per_request)
            assert len(out) > 0

        with ThreadPoolExecutor(max_workers=64) as ex:
            futs = []
            for i, g in enumerate(gaps):
                time.sleep(float(g))
                futs.append(ex.submit(one_req, i))
            for f in futs:
                f.result(timeout=120)
        q_lat = np.sort(np.asarray(req_lat)) * 1e3
        n_l = len(q_lat)
        front_lat = {
            "offered_rps": round(offered, 1),
            "p50_ms": round(float(q_lat[int(0.5 * (n_l - 1))]), 1),
            "p95_ms": round(float(q_lat[int(0.95 * (n_l - 1))]), 1),
            "p99_ms": round(
                float(q_lat[int(np.ceil(0.99 * (n_l - 1)))]), 1),
        }
    finally:
        front.close()

    # exact-retrieval quality tier: a sticky decider routes half the users
    # through the EXACT full-corpus scan (recall 1.0) — product behavior,
    # not a bench mode (TieredSannBatchSource + EXACT_RETRIEVAL_TIER param)
    exact_tier = None
    if exact_corpus is not None and q_embs is not None:
        from the_algorithm_tpu.core.decider import Decider

        ti_d, tsc_d = exact_corpus
        eq_ids, eq_scores = q_embs

        def emb_fn(uid):
            r = uid % eq_ids.shape[0]
            return eq_ids[r].astype(np.int32), eq_scores[r]

        # the tier serves the TURBO full-corpus scan (bf16 + approx
        # collectors) — recall measured vs the exact truth, not assumed
        exact_src = bf.ExactScanBatchSource(
            ti_d, tsc_d, emb_fn, num_clusters=C, max_results=200,
            turbo=True)
        availability = 8000  # 80% of traffic, sticky per user
        decider = Decider({"exact_retrieval_tier": availability})
        tiered = bf.TieredSannBatchSource(
            bf.PrecomputedBatchSource(sann_ids[:half], sann_scores[:half]),
            exact_src, decider)
        tier_engine = bf.BatchedForYouEngine(
            batch_sources=[tiered] + engine.batch_sources[1:],
            scorer=scorer, head_names=masknet.DEFAULT_HEAD_NAMES,
            lift=bf.ColumnsLift(A, NOW),
        )
        # the full-corpus scan's cost is ~Q-independent (gather
        # transactions dominate), so small per-batch Q wastes it; the
        # tier therefore serves through the PIPELINED front at R=64 —
        # batch k+1's scans overlap batch k's scoring, and the deep
        # coalesce amortizes each scan over twice the requests
        R = 64
        batch = [make_query(400 + u) for u in range(R)]
        with host:
            tier_engine.serve_batch(batch)  # compile the R=64 shape
            # warm every pow2 scan shape the front's ragged tier counts
            # can produce (each is one compiled program, disk-cached)
            for qn in (64, 32, 16, 8, 4, 2, 1):
                exact_src.collect(exact_src.dispatch(batch[:qn], None))
        from the_algorithm_tpu.serving.batcher import (BatcherConfig,
                                                       RequestBatcher)

        def tier_serve(queries):
            with host:
                return tier_engine.serve_batch(queries)

        tfront = RequestBatcher(
            tier_serve, BatcherConfig(max_batch_size=64, max_delay_ms=10.0),
            n_workers=2)
        try:
            from concurrent.futures import ThreadPoolExecutor

            # backlog > one batch so the pipelined workers overlap
            # (see the main front's N_REQ note)
            N_T = 256
            with ThreadPoolExecutor(max_workers=128) as ex:
                t0 = time.time()
                futs = [ex.submit(tfront.serve, make_query(400 + i))
                        for i in range(N_T)]
                outs_t = [f.result(timeout=180) for f in futs]
                dt_total = (time.time() - t0
                            + N_T * sann_dt_per_request)
        finally:
            tfront.close()
        assert all(len(o) > 0 for o in outs_t)
        p = availability / 10000.0
        tier_recall = (recall_turbo if recall_turbo is not None else 1.0)
        exact_tier = {
            "availability": p,
            "requests_per_s": round(N_T / dt_total, 1),
            "tier_scan_recall": (round(recall_turbo, 4)
                                 if recall_turbo is not None else 1.0),
            "blended_retrieval_recall": (
                round(p * tier_recall + (1 - p) * recall_approx, 4)
                if recall_approx is not None else None),
        }

    # streaming updates INTO the live serve tables while the engine
    # serves (the Storm TweetJob / Heron realtime-aggregate role): a
    # feeder thread folds UUA event micro-batches into the HBM tables via
    # LiveUpdater (COW pointer swap per batch), concurrent with serving.
    import threading

    from the_algorithm_tpu.mixers import live_updates as lu

    updater = lu.LiveUpdater(scorer)
    E_BATCH = 256
    ev_rng = np.random.default_rng(23)

    probe_q = make_query(900)
    with host:
        probe_before = engine.serve_batch([probe_q])[0]
    target = probe_before[0]  # the probe's current top candidate
    target_author = int(target.features.get("author_id", 0) or 0)

    ev_clock = [NOW]

    def ev_batch():
        users = ev_rng.integers(0, NU, E_BATCH)
        tweets = ev_rng.integers(0, 1 << 15, E_BATCH).astype(np.int64)
        tweets[:8] = int(target.id)  # a slice favs the probe's top pick
        kinds = ev_rng.choice(
            np.asarray(["fav", "retweet", "reply", "click"]),
            E_BATCH, p=[0.7, 0.1, 0.1, 0.1])
        ev_clock[0] += 1
        ts = ev_clock[0]
        return lu.batch_from_actions([
            (int(users[i]), int(tweets[i]),
             int(tweets[i] % A) if tweets[i] != target.id
             else target_author,
             str(kinds[i]), ts)
            for i in range(E_BATCH)
        ])

    with host:
        updater.apply(ev_batch())  # compile the update programs
        # unthrottled updater ceiling (no serving traffic)
        t0 = time.time()
        for _ in range(8):
            updater.apply(ev_batch())
        update_ceiling_eps = 8 * E_BATCH / (time.time() - t0)
    stop = threading.Event()
    applied = [0]

    # the reference's realtime ingest point: ~6K fav-events/s
    # (TweetJob.scala:51). Unthrottled, the updater sustains ~29K
    # events/s but floods the single chip's execution stream and starves
    # serving — so the bench measures serving AT the reference's ingest
    # rate, plus the updater's unthrottled ceiling separately.
    TARGET_EPS = 6000.0

    def feeder():
        while not stop.is_set():
            t_b = time.perf_counter()
            b = ev_batch()
            with host:
                updater.apply(b)
            applied[0] += E_BATCH
            min_dt = E_BATCH / TARGET_EPS
            el = time.perf_counter() - t_b
            if el < min_dt:
                time.sleep(min_dt - el)

    th = threading.Thread(target=feeder, daemon=True)
    R_u = 32
    upd_batch = [make_query(700 + u) for u in range(R_u)]
    with host:
        engine.serve_batch(upd_batch)  # shape already compiled
    th.start()
    reps_u = 4
    t0 = time.time()
    for _ in range(reps_u):
        with host:
            engine.serve_batch(upd_batch)
    dt_u = time.time() - t0
    stop.set()
    th.join(timeout=30)
    window = time.time() - t0
    serve_with_updates_rps = reps_u * R_u / (
        dt_u + reps_u * R_u * sann_dt_per_request)
    update_eps = applied[0] / max(window, 1e-9)

    # freshness: the mid-bench fav burst must move the target tweet's
    # score in the very next request
    with host:
        probe_after = engine.serve_batch([probe_q])[0]
    before_s = float(target.score)
    after_by_id = {c.id: float(c.score) for c in probe_after}
    after_s = after_by_id.get(int(target.id))
    freshness_moved = after_s is None or abs(after_s - before_s) > 1e-9

    updates = {
        "serve_with_updates_req_per_s": round(serve_with_updates_rps, 1),
        "update_events_per_s": round(update_eps, 1),
        "update_events_per_s_unthrottled_ceiling": round(
            update_ceiling_eps, 1),
        "update_target_events_per_s": TARGET_EPS,
        "update_batch_events": E_BATCH,
        "freshness_moved_next_request": bool(freshness_moved),
    }

    return (
        serial_rps,
        float(lat_ms[int(0.5 * (U - 1))]),
        float(lat_ms[int(np.ceil(0.99 * (U - 1)))]),
        n_scored,
        curve,
        best_rps,
        front_rps,
        exact_tier,
        front_lat,
        updates,
    )


def main():
    chip, (peak_flops, peak_hbm) = chip_peaks()
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
    # index passed as an argument (not a closure) — see exact_topk note
    raw_query_fn = jax.jit(
        lambda idx, s: ann.get_tweet_candidates_batch(idx, s, cfg)
    )
    query_fn = lambda s: raw_query_fn(index, s)  # noqa: E731
    out_ids, out_scores = query_fn(sources)  # compile + correctness output
    ids_out = np.asarray(out_ids)
    scores_out = np.asarray(out_scores)
    dt = _steady_state(query_fn, sources, reps=100)
    qps = Q / dt

    # sharded fan-out path on the same chip(s): shard_map + exact re-merge at
    # the N·M-exact default partials cap
    mesh = None
    try:
        from the_algorithm_tpu.core.mesh import MeshSpec, make_mesh

        mesh = make_mesh(MeshSpec(data=1, model=jax.device_count()))
        sh_index = ann.shard_index(mesh, index)
        raw_sharded = jax.jit(
            lambda idx, s: ann.get_tweet_candidates_sharded(mesh, idx, s, cfg)
        )
        sharded_fn = lambda s: raw_sharded(sh_index, s)  # noqa: E731
        sh_dt = _steady_state(sharded_fn, sources, reps=50)
        sharded_qps = Q / sh_dt
        del sh_index
    except Exception:
        sharded_qps = None

    truth, exact_qps, turbo_qps, turbo_recall = exact_topk(
        q_ids, q_scores, tweet_ids, tweet_scores, K_RECALL)
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
    n_oracle = 8
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

    # free the retrieval state before the big-table/ranking phases
    # (keep the padded corpus host copies for the exact-tier product phase)
    BLK = EXACT_BLK
    T_pad = ((T + BLK - 1) // BLK) * BLK
    exact_ti = np.full((T_pad, KT), int(PAD_ID), np.int32)
    exact_tsc = np.zeros((T_pad, KT), np.float32)
    exact_ti[:T] = tweet_ids
    exact_tsc[:T] = tweet_scores
    del index, query_fn, truth
    del tweet_ids, tweet_scores, idx_ids, idx_scores, idx_ts

    import gc

    gc.collect()
    ranking_cps, ranking_flops_s, flops_per_cand = bench_ranking()
    training_eps, training_flops_s = bench_training()
    gc.collect()
    lookup_rows_s, lookup_bytes_s, lookup_vs_bare = bench_lookup()
    gc.collect()

    # end-to-end For You product path LAST (after the 8 GB lookup table is
    # freed — its per-request state is small but HBM headroom is not)
    (foryou_rps, foryou_p50, foryou_p99, foryou_scored, foryou_curve,
     foryou_batched, foryou_front, foryou_exact_tier, foryou_front_lat,
     foryou_updates) = bench_foryou_batched(
        ids_out, scores_out, dt / Q,
        exact_corpus=(jnp.asarray(exact_ti), jnp.asarray(exact_tsc)),
        q_embs=(q_ids, q_scores), recall_approx=recall,
        recall_turbo=turbo_recall,
    )

    def mfu(flops_s):
        if flops_s and peak_flops:
            return round(flops_s / peak_flops, 4)
        return None

    print(
        json.dumps(
            {
                "metric": "sann_retrieval",
                "value": round(qps, 1),
                "unit": "queries/s/chip",
                "vs_baseline": round(qps / 6000.0, 3),
                "recall_at_100": round(recall, 4),
                "oracle_parity_recall": round(oracle_parity, 4),
                # exact brute-force cosine over the full 2M corpus as a
                # product mode: recall 1.0 by construction at this rate
                "exact_scan_queries_per_s": round(exact_qps, 1),
                "sharded_queries_per_s": (
                    round(sharded_qps, 1) if sharded_qps else None
                ),
                # end-to-end For You product path (batched engine: one
                # earlybird scan + one UTEG traversal + one fused wide-
                # hydration/MaskNet program shared by R requests). The
                # serial number is R=1 (latency path); foryou_batched is
                # the best point of the batch-size curve; foryou_front
                # drives 128 concurrent clients through the RequestBatcher
                "foryou_requests_per_s_per_chip": round(foryou_rps, 2),
                "foryou_p50_ms": round(foryou_p50, 1),
                "foryou_p99_ms": round(foryou_p99, 1),
                "foryou_candidates_scored_per_request": round(foryou_scored, 1),
                "foryou_batched_requests_per_s": round(foryou_batched, 1),
                "foryou_front_requests_per_s": round(foryou_front, 1),
                # per-request latency under the batched front at fixed
                # (Poisson, ~80%-capacity) offered load — the serving SLO
                "foryou_front_latency": foryou_front_lat,
                "foryou_batch_curve": foryou_curve,
                # the exact-retrieval quality tier as PRODUCT behavior
                "foryou_exact_tier": foryou_exact_tier,
                # TURBO full-corpus scan (bf16 + approx collectors): the
                # tier's at-scale operating point, recall measured vs the
                # exact scan's truth
                "fullscan_turbo_queries_per_s": round(turbo_qps, 1),
                "fullscan_turbo_recall": round(turbo_recall, 4),
                # live streaming updates folded into the serve tables
                # while the batched engine serves (freshness contract:
                # a mid-bench fav burst moves the next request's scores)
                "serving_updates": foryou_updates,
                "ranking_candidates_per_s_per_chip": round(ranking_cps, 1),
                "ranking_mfu": mfu(ranking_flops_s),
                "ranking_flops_per_candidate": (
                    round(flops_per_cand) if flops_per_cand else None
                ),
                "training_examples_per_s_per_chip": round(training_eps, 1),
                "training_mfu": mfu(training_flops_s),
                "lookup_rows_per_s": round(lookup_rows_s, 1),
                "lookup_gb_per_s": round(lookup_bytes_s / 1e9, 2),
                "lookup_hbm_roofline_frac": (
                    round(lookup_bytes_s / peak_hbm, 4) if peak_hbm else None
                ),
                # fraction of the bare-gather machine ceiling (1.0 = the
                # routing wrapper adds nothing over XLA's raw row gather;
                # random 512B rows are transaction-limited well below
                # streaming HBM peak)
                "lookup_vs_bare_gather": round(lookup_vs_bare, 4),
                "chip": chip,
                "batch": Q,
                "index_shape": [C, M],
                "corpus": [T, KT],
                "scan": [N, X],
            }
        )
    )


if __name__ == "__main__":
    main()
