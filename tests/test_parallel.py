"""Sharded-table lookup and distributed top-K tests on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from the_algorithm_tpu.parallel import distributed_topk, sharded_table


class TestShardedTable:
    def test_create_is_sharded(self, mesh8):
        t = sharded_table.create(mesh8, rows=16, dim=8)
        assert t.array.sharding.spec == P("model", None)
        assert t.rows == 16 and t.dim == 8

    def test_lookup_matches_host(self, mesh8):
        rng = np.random.default_rng(0)
        data = rng.normal(size=(32, 8)).astype(np.float32)
        t = sharded_table.create(mesh8, 32, 8, init=data)
        ids = jnp.asarray([0, 31, 7, 7, 16], jnp.int32)
        got = np.asarray(sharded_table.lookup(t, ids))
        np.testing.assert_allclose(got, data[np.asarray(ids)], rtol=1e-6)

    def test_lookup_onehot_psum_matches(self, mesh8):
        rng = np.random.default_rng(1)
        data = rng.normal(size=(32, 8)).astype(np.float32)
        t = sharded_table.create(mesh8, 32, 8, init=data)
        ids = jnp.asarray([3, 12, 28, 0, 31, 15], jnp.int32)
        got = np.asarray(sharded_table.lookup_onehot_psum(mesh8, t, ids))
        np.testing.assert_allclose(got, data[np.asarray(ids)], rtol=1e-5)

    def test_scatter_add_accumulates_duplicates(self, mesh8):
        t = sharded_table.create(mesh8, 16, 4)
        ids = jnp.asarray([2, 2, 5], jnp.int32)
        ups = jnp.ones((3, 4), jnp.float32)
        t2 = sharded_table.scatter_add(t, ids, ups)
        arr = np.asarray(t2.array)
        np.testing.assert_allclose(arr[2], 2.0)
        np.testing.assert_allclose(arr[5], 1.0)
        assert arr.sum() == 12.0

    def test_row_decay(self, mesh8):
        t = sharded_table.create(mesh8, 8, 4, init=np.ones((8, 4), np.float32))
        t2 = sharded_table.row_decay(t, 0.5)
        np.testing.assert_allclose(np.asarray(t2.array), 0.5)


class TestDistributedTopK:
    def test_sharded_topk_matches_global(self, mesh8):
        rng = np.random.default_rng(2)
        n = 64  # divisible by 4 model shards
        scores = rng.normal(size=(n,)).astype(np.float32)
        payload = np.arange(n, dtype=np.int32)
        got_s, got_p = distributed_topk.sharded_topk(
            mesh8, jnp.asarray(scores), jnp.asarray(payload), k=8
        )
        order = np.argsort(-scores)[:8]
        np.testing.assert_allclose(np.asarray(got_s), scores[order], rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(got_p), payload[order])

    def test_sharded_argtopk_batched(self, mesh8):
        rng = np.random.default_rng(3)
        items = rng.normal(size=(64, 16)).astype(np.float32)
        query = rng.normal(size=(16,)).astype(np.float32)

        got_s, got_p = distributed_topk.sharded_argtopk_batched(
            mesh8,
            lambda shard: shard @ jnp.asarray(query),
            jnp.asarray(items),
            k=5,
        )
        true = items @ query
        order = np.argsort(-true)[:5]
        np.testing.assert_array_equal(np.asarray(got_p), order)
        np.testing.assert_allclose(np.asarray(got_s), true[order], rtol=1e-5)
