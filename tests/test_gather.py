"""Row-gather primitive: CPU fallback correctness + interpreter-mode kernel."""

import jax.numpy as jnp
import numpy as np

from the_algorithm_tpu.ops.gather import _row_gather_pallas, row_gather


def test_cpu_fallback_matches_indexing():
    rng = np.random.default_rng(0)
    t1 = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
    t2 = jnp.asarray(rng.integers(0, 100, (64, 8)).astype(np.int32))
    ids = jnp.asarray(rng.integers(0, 64, (4, 5)).astype(np.int32))
    o1, o2 = row_gather(ids, t1, t2)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(t1[ids]))
    np.testing.assert_array_equal(np.asarray(o2), np.asarray(t2[ids]))
    assert o1.shape == (4, 5, 16) and o2.shape == (4, 5, 8)


def test_pallas_kernel_interpret_mode():
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=(32, 128)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 32, (10,)).astype(np.int32))
    (out,) = _row_gather_pallas(ids, table, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(table[ids]))
