"""Worker process for the 2-process jax.distributed DCN-analog test.

Run by tests/test_multihost.py as:
    python tests/multihost_worker.py <coordinator_port> <process_id> <num_processes>

Each process exposes 4 virtual CPU devices → an 8-device global mesh
(data=2, model=4) spanning two OS processes — the multi-host shape of
SURVEY §2.3 / §5.8 (ICI within a "slice" = a process's local devices,
DCN across = the coordination channel), without TPU pods.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_DEVS = int(os.environ.get("DEVS_PER_PROC", "4"))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={_DEVS}"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402


def main() -> None:
    port, pid, nprocs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == _DEVS * nprocs, len(jax.devices())

    from the_algorithm_tpu.core.mesh import MeshSpec, make_mesh
    from the_algorithm_tpu.models import masknet
    from the_algorithm_tpu.parallel import sharded_table
    from the_algorithm_tpu.training.trainer import Trainer, TrainerConfig

    # the data axis may be overridden (argv[5]) so a 1-process run can
    # build the SAME logical mesh as the 2-process run — the in-family
    # baseline the DCN efficiency row divides by
    data_axis = (int(sys.argv[5]) if len(sys.argv) > 5
                 else nprocs)
    mesh = make_mesh(MeshSpec(data=data_axis,
                              model=_DEVS * nprocs // data_axis))

    # 1) all-to-all multiget across the process boundary ---------------------
    rng = np.random.default_rng(0)  # same seed → same replicated inputs
    data = rng.normal(size=(32, 8)).astype(np.float32)
    table = sharded_table.create(mesh, 32, 8, init=data)
    ids = np.asarray([0, 31, 7, 7, 16, 2, 30, 12], np.int32)
    got = sharded_table.lookup_all_to_all(mesh, table, jnp.asarray(ids))
    lookup_sum = float(jnp.sum(got))
    want_sum = float(data[ids].sum())
    assert abs(lookup_sum - want_sum) < 1e-3, (lookup_sum, want_sum)

    # 2) DP training step with per-process local batches ---------------------
    cfg = masknet.MaskNetConfig(
        num_features=32, num_heads=4, mask_blocks=2, block_dim=16,
        aggregation_dim=8, head_hidden=(16,), dtype="float32",
    )
    model = masknet.MaskNet(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, cfg.num_features), jnp.float32)
    )

    def loss_fn(p, batch):
        logits = model.apply(p, batch["features"])
        return masknet.multi_task_loss(logits, batch["labels"]), {}

    trainer = Trainer(
        loss_fn, params, mesh, masknet.PARTITION_RULES,
        TrainerConfig(learning_rate=1e-3),
    )
    # each process contributes a DIFFERENT local half of the global batch
    local_rng = np.random.default_rng(100 + pid)
    local = {
        "features": local_rng.normal(size=(4, cfg.num_features)).astype(
            np.float32
        ),
        "labels": local_rng.integers(0, 2, (4, cfg.num_heads)).astype(
            np.float32
        ),
    }
    out = trainer.train_step(local)
    loss = float(out["loss"])
    assert np.isfinite(loss)

    # 3) sharded SANN fan-out across processes -------------------------------
    from the_algorithm_tpu.ops.retrieval import ClusterTweetIndex
    from the_algorithm_tpu.ops.sparse import SparseEmbedding
    from the_algorithm_tpu.simclusters import ann

    irng = np.random.default_rng(7)
    C, M = 16, 8
    idx = ClusterTweetIndex(
        jnp.asarray(irng.integers(0, 64, (C, M)).astype(np.int32)),
        jnp.asarray(irng.uniform(0.1, 1.0, (C, M)).astype(np.float32)),
        jnp.zeros((C, M), jnp.int32),
    )
    sh_idx = ann.shard_index(mesh, idx)
    src = SparseEmbedding(
        jnp.asarray([[0, 3, 9, 12]], jnp.int32),
        jnp.asarray([[1.0, 0.5, 0.7, 0.2]], jnp.float32),
    )
    cfg_ann = ann.SimClustersANNConfig(
        max_scan_clusters=4, max_top_tweets_per_cluster=M, max_num_results=8
    )
    ids_out, scores_out = ann.get_tweet_candidates_sharded(
        mesh, sh_idx, src, cfg_ann
    )
    sann_sum = float(jnp.sum(jnp.where(jnp.isfinite(scores_out), scores_out, 0)))

    # every process prints the same line iff the collectives agree
    print(f"RESULT lookup={lookup_sum:.4f} loss={loss:.6f} sann={sann_sum:.4f}")

    # 4) optional DCN throughput mode (scaling_bench): timed DP steps with
    # per-process local batches — the examples/s number BASELINE asks for
    # at N≥2 hosts (here: 2 OS processes over the loopback "DCN")
    if len(sys.argv) > 4 and sys.argv[4] == "bench":
        import time

        B_local = 1024 // nprocs  # fixed GLOBAL batch across run shapes
        bench_batch = {
            "features": local_rng.normal(
                size=(B_local, cfg.num_features)).astype(np.float32),
            "labels": local_rng.integers(
                0, 2, (B_local, cfg.num_heads)).astype(np.float32),
        }
        trainer.train_step(bench_batch)  # compile + warm
        # min-of-reps: matches scaling_bench._time so the efficiency ratio
        # against the single-process row compares like with like
        best = float("inf")
        for _ in range(30):
            t0 = time.time()
            out = trainer.train_step(bench_batch)
            jax.block_until_ready(trainer.params)
            best = min(best, time.time() - t0)
        global_eps = B_local * nprocs / best
        print(f"THROUGHPUT eps={global_eps:.1f}")

    # 5) DCN retrieval mode (scaling_bench dcn_sann row): the hybrid
    # query×index SANN across the process boundary — queries shard over
    # 'data' (spanning the two processes), cluster rows over 'model'.
    # ≡ the reference's cross-host Earlybird root fan-out
    # (src/java/com/twitter/search/README.md:15-17).
    if len(sys.argv) > 4 and sys.argv[4] == "bench_sann":
        import time

        from the_algorithm_tpu.ops.retrieval import ScoringAlgorithm

        d_i = 4
        C, M, Q, NSCAN, XRES = 8192 * d_i, 64, 256, 16, 64
        srng = np.random.default_rng(11)  # same seed → same global inputs
        big = ClusterTweetIndex(
            jnp.asarray(srng.integers(0, 1 << 20, (C, M)).astype(np.int32)),
            jnp.asarray(srng.uniform(0.1, 1.0, (C, M)).astype(np.float32)),
            jnp.zeros((C, M), jnp.int32),
        )
        sh_big = ann.shard_index(mesh, big)
        q_ids = np.stack([
            srng.choice(C, NSCAN, replace=False) for _ in range(Q)
        ]).astype(np.int32)
        q_sc = srng.uniform(0.2, 1.0, (Q, NSCAN)).astype(np.float32)
        srcq = SparseEmbedding(jnp.asarray(q_ids), jnp.asarray(q_sc))
        cfg_h = ann.SimClustersANNConfig(
            max_scan_clusters=NSCAN, max_top_tweets_per_cluster=M,
            max_num_results=XRES,
            scoring_algorithm=ScoringAlgorithm.COSINE,
            max_tweet_candidate_age_hours=10**6,
        )
        fn = jax.jit(
            lambda i, s: ann.get_tweet_candidates_hybrid(mesh, i, s, cfg_h))
        out = fn(sh_big, srcq)
        jax.block_until_ready(out)
        # single-device baseline compiles in process 0 up front; reps then
        # INTERLEAVE mesh and single so host-load disturbances hit both
        # sides of the efficiency ratio (process 1 simply joins each mesh
        # rep's collectives and idles through proc 0's single reps)
        fn1 = big1 = src1 = None
        if pid == 0:
            dev0 = jax.local_devices()[0]
            big1 = jax.device_put(big, dev0)
            src1 = jax.device_put(srcq, dev0)
            fn1 = jax.jit(
                lambda i, s: ann.get_tweet_candidates_batch(i, s, cfg_h))
            jax.block_until_ready(fn1(big1, src1))
        best = best1 = float("inf")
        for _ in range(16):
            t0 = time.perf_counter()
            out = fn(sh_big, srcq)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
            if pid == 0:
                t0 = time.perf_counter()
                jax.block_until_ready(fn1(big1, src1))
                best1 = min(best1, time.perf_counter() - t0)
        if pid == 0:
            print(f"SANNTIME mesh_ms={best * 1e3:.2f} "
                  f"single_ms={best1 * 1e3:.2f} d_i={d_i} q={Q}")


if __name__ == "__main__":
    main()
