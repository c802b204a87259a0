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
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


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
        dt = _time(lambda: step(params, opt_state, x, y), reps=reps)
        mesh_eps[n] = B / dt

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
        dt_W = _time(lambda: step1(params1, opt1, x1, y1), reps=reps)
        xb = jax.device_put(x_np[:b_per_device], dev)
        yb = jax.device_put(y_np[:b_per_device], dev)
        dt_b = _time(lambda: step1(params1, opt1, xb, yb), reps=reps)
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
        dt = _time(lambda: fn(sh_index, sources), reps=reps)
        mesh_qps[n] = q / dt

        fn1 = jax.jit(lambda idx, s: ann.get_tweet_candidates_batch(idx, s, cfg))
        dt1 = _time(lambda: fn1(index, sources), reps=reps)
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
        dt = _time(lambda: fn(sh_index, sources), reps=reps)
        mesh_qps[n] = Q / dt

        fn1 = jax.jit(
            lambda idx, s: ann.get_tweet_candidates_batch(idx, s, cfg))
        dt1 = _time(lambda: fn1(index, sources), reps=reps)
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
        dt = _time(lambda: fn(sh_index, sources), reps=reps)

        fn1 = jax.jit(
            lambda idx, s: ann.get_tweet_candidates_batch(idx, s, cfg))
        dt1 = _time(lambda: fn1(index, sources), reps=reps)
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


def dcn_two_process_throughput() -> Optional[float]:
    """Global examples/s for the DP step across TWO OS PROCESSES over the
    loopback DCN analog (jax.distributed; 4 virtual devices each) — the
    N≥2-hosts point of the BASELINE scaling row. Returns None if the
    processes fail to coordinate (environment-dependent)."""
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
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(i), "2", "bench"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        )
        for i in range(2)
    ]
    eps = None
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            return None
        m = re.search(rb"THROUGHPUT eps=([0-9.]+)", out)
        if m:
            eps = float(m.group(1))
    return eps


def main():
    sizes = (1, 2, 4, 8)
    train_mesh, train_single = masknet_train_scaling(sizes=sizes)
    sann_mesh, sann_single = sann_retrieval_scaling(sizes=sizes)
    qs_mesh, qs_single = sann_query_sharded_scaling(sizes=sizes)
    hybrid = sann_hybrid_scaling()

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
        "sann_hybrid": hybrid,
        "devices": jax.device_count(),
        "platform": jax.default_backend(),
    }
    dcn_eps = dcn_two_process_throughput()
    out["dcn_two_process"] = {
        "train_examples_per_s_global": (
            round(dcn_eps, 1) if dcn_eps else None),
        # the single-process baseline BESIDE the DCN point: the same 8
        # virtual devices and batch shape in ONE process (train_mesh[8])
        # — efficiency is computable from the artifact alone
        "train_examples_per_s_single_process_same_devices": round(
            train_mesh[8], 1),
        "efficiency_vs_single_process": (
            round(min(1.0, dcn_eps / train_mesh[8]), 4)
            if dcn_eps else None),
        "raw_ratio_vs_single_process": (
            round(dcn_eps / train_mesh[8], 4) if dcn_eps else None),
        "processes": 2,
        "devices_per_process": 4,
        "note": ("DP step across two OS processes via jax.distributed over"
                 " loopback — the N>=2-hosts measurement point"),
    }
    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "SCALING_r04.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
