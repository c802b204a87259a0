"""Pallas run-collapse kernel (ops/seg_scan.py) — interpret-mode parity.

The kernel is the TPU fast path of ``retrieval._dedup_sum``; these tests run
it through the Pallas interpreter on the CPU mesh against a dict oracle and
against the portable associative-scan path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from the_algorithm_tpu.ops import retrieval
from the_algorithm_tpu.ops.seg_scan import (
    run_collapse_sorted,
    run_collapse_sorted_1d,
)
from the_algorithm_tpu.ops.sparse import PAD_ID


def _oracle(ids_row, *vals):
    sums = [dict() for _ in vals]
    for i, t in enumerate(ids_row):
        for d, v in zip(sums, vals):
            d[int(t)] = d.get(int(t), 0.0) + float(v[i])
    return sums


def _collapse_to_dict(rep, *sums):
    out = {}
    for i in range(rep.shape[0]):
        if rep[i] != int(PAD_ID):
            assert int(rep[i]) not in out, "duplicate representative"
            out[int(rep[i])] = tuple(float(s[i]) for s in sums)
    return out


@pytest.mark.parametrize(
    "W,hi",
    [(256, 13), (1024, 200), (2500, 50_000), (512, 1)],
)
def test_run_collapse_matches_oracle(W, hi):
    rng = np.random.default_rng(W + hi)
    Q = 3
    ids = np.sort(rng.integers(0, hi, size=(Q, W)).astype(np.int32), axis=1)
    ids[0, -W // 4 :] = int(PAD_ID)  # padded tail row
    v1 = rng.random((Q, W)).astype(np.float32)
    v2 = rng.random((Q, W)).astype(np.float32)

    rep, s1, s2 = run_collapse_sorted(
        jnp.asarray(ids), jnp.asarray(v1), jnp.asarray(v2), interpret=True
    )
    rep, s1, s2 = np.asarray(rep), np.asarray(s1), np.asarray(s2)
    for q in range(Q):
        want1, want2 = _oracle(ids[q], v1[q], v2[q])
        got = _collapse_to_dict(rep[q], s1[q], s2[q])
        want_keys = {t for t in want1 if t != int(PAD_ID)}
        assert set(got) == want_keys
        for t, (a, b) in got.items():
            np.testing.assert_allclose(a, want1[t], rtol=1e-4)
            np.testing.assert_allclose(b, want2[t], rtol=1e-4)


def test_1d_vmapped_matches_portable_dedup():
    rng = np.random.default_rng(0)
    Q, W = 4, 600
    ids = np.sort(rng.integers(0, 80, size=(Q, W)).astype(np.int32), axis=1)
    vals = rng.random((Q, W)).astype(np.float32)

    rep_p, sum_p = jax.vmap(
        lambda i, v: run_collapse_sorted_1d(i, v, interpret=True)
    )(jnp.asarray(ids), jnp.asarray(vals))

    for q in range(Q):
        rep_s, sum_s = retrieval._dedup_sum(
            jnp.asarray(ids[q]), jnp.asarray(vals[q])
        )
        got_p = _collapse_to_dict(np.asarray(rep_p[q]), np.asarray(sum_p[q]))
        got_s = _collapse_to_dict(np.asarray(rep_s), np.asarray(sum_s))
        assert set(got_p) == set(got_s)
        for t in got_p:
            np.testing.assert_allclose(got_p[t], got_s[t], rtol=1e-4)
