"""Scaling-efficiency bar on the 8-device virtual mesh (BASELINE ≥80%).

The DP train step on the full 8-device mesh must reach ≥0.8 of the
single-device throughput on the SAME total workload — i.e. the sharding
machinery (psum of grads, partitioned batch layout, multi-executable
dispatch) may cost at most 20%. This is the honest multi-chip proxy a
shared-core virtual mesh can measure (scaling_bench.py holds the full
curve; SCALING_r03.json the recorded run).
"""

import numpy as np
import pytest

import scaling_bench


@pytest.mark.slow
def test_train_step_sharding_efficiency_at_8_devices():
    # median of 3 trials — single-machine throughput numbers bounce ±20%
    # under co-tenant load; the bar is on the achievable ratio
    effs = []
    for _ in range(3):
        mesh_eps, single_eps = scaling_bench.masknet_train_scaling(
            b_per_device=256, num_features=512, sizes=(8,), reps=10
        )
        effs.append(mesh_eps[8] / single_eps[8])
    assert float(np.median(effs)) >= 0.8, effs


@pytest.mark.slow
def test_sann_sharded_curve_reports(tmp_path):
    # the retrieval fan-out curve must at least run at every mesh size and
    # return sane throughputs (its efficiency accounting is reported by
    # scaling_bench.py; the fan-out replicates scan shapes per shard, so no
    # >=0.8 bar applies on a shared-core mesh — see SCALING_r03.json notes)
    mesh_qps, single_qps = scaling_bench.sann_retrieval_scaling(
        c_per_device=2048, m=32, q=16, n_scan=8, x_res=32, sizes=(1, 8),
        reps=4,
    )
    assert mesh_qps[1] > 0 and mesh_qps[8] > 0
    assert single_qps[1] > 0


@pytest.mark.slow
def test_hybrid_sharding_beats_index_sharded_at_8():
    """r4: the query×index hybrid keeps compute-normalized efficiency
    ≥0.5 at 8 devices (the pure index-sharded path collapses there)."""
    out = scaling_bench.sann_hybrid_scaling(
        c_per_index_shard=2048, m=32, q=32, n_scan=8, x_res=32, reps=4)
    assert out[8]["efficiency_compute_normalized"] >= 0.5, out[8]
    assert out[8]["mesh"] == (4, 2)
