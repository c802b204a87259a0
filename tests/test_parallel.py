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


class TestAllToAllLookup:
    """The explicit row-exchange multiget (BASELINE 'lookup exchange')."""

    def test_uniform_ids_match_host(self, mesh8):
        rng = np.random.default_rng(10)
        data = rng.normal(size=(64, 8)).astype(np.float32)
        t = sharded_table.create(mesh8, 64, 8, init=data)
        ids = jnp.asarray(rng.integers(0, 64, 40), jnp.int32)  # 40 % 4 == 0
        got = np.asarray(sharded_table.lookup_all_to_all(mesh8, t, ids))
        np.testing.assert_allclose(got, data[np.asarray(ids)], rtol=1e-6)

    def test_skewed_ids_exact_at_default_capacity(self, mesh8):
        """Worst case: every id owned by one shard — default cap is exact."""
        rng = np.random.default_rng(11)
        data = rng.normal(size=(64, 8)).astype(np.float32)
        t = sharded_table.create(mesh8, 64, 8, init=data)
        # all ids in shard 2's block [32, 48) on the 4-way model axis
        ids = jnp.asarray(rng.integers(32, 48, 16), jnp.int32)
        got, overflow = sharded_table.lookup_all_to_all(
            mesh8, t, ids, return_overflow=True
        )
        assert int(overflow) == 0
        np.testing.assert_allclose(
            np.asarray(got), data[np.asarray(ids)], rtol=1e-6
        )

    def test_capacity_overflow_reported_and_zeroed(self, mesh8):
        rng = np.random.default_rng(12)
        data = rng.normal(size=(64, 8)).astype(np.float32) + 1.0
        t = sharded_table.create(mesh8, 64, 8, init=data)
        # per shard (B_local=4), all 4 ids hit owner 0 → cap=2 drops 2 each
        ids = jnp.asarray([1, 2, 3, 4] * 4, jnp.int32)
        got, overflow = sharded_table.lookup_all_to_all(
            mesh8, t, ids, capacity=2, return_overflow=True
        )
        got = np.asarray(got)
        assert int(overflow) == 8  # 2 dropped per requester shard × 4 shards
        served = (np.abs(got).sum(axis=1) > 0).sum()
        assert served == 8
        # every served row is the correct row
        ids_np = np.asarray(ids)
        for i in range(16):
            if np.abs(got[i]).sum() > 0:
                np.testing.assert_allclose(got[i], data[ids_np[i]], rtol=1e-6)

    def test_multiget_pytree_shares_routing(self, mesh8):
        """Multiple same-rows tables (e.g. cluster index ids/scores/ts)."""
        rng = np.random.default_rng(13)
        a = rng.normal(size=(32, 8)).astype(np.float32)
        b = rng.integers(0, 100, size=(32, 5)).astype(np.int32)
        sh = jax.sharding.NamedSharding(mesh8, P("model", None))
        tables = {
            "scores": jax.device_put(jnp.asarray(a), sh),
            "ids": jax.device_put(jnp.asarray(b), sh),
        }
        ids = jnp.asarray(rng.integers(0, 32, 24), jnp.int32)
        out = sharded_table.multiget_all_to_all(mesh8, tables, ids)
        np.testing.assert_allclose(
            np.asarray(out["scores"]), a[np.asarray(ids)], rtol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(out["ids"]), b[np.asarray(ids)]
        )

    def test_gradient_matches_plain_gather(self, mesh8):
        """d/dtable of a loss over looked-up rows == scatter-add transpose."""
        rng = np.random.default_rng(14)
        data = rng.normal(size=(32, 8)).astype(np.float32)
        ids = jnp.asarray([0, 5, 5, 31, 12, 3, 3, 3], jnp.int32)
        w = jnp.asarray(rng.normal(size=(8, 8)).astype(np.float32))

        def loss_a2a(tbl):
            rows = sharded_table.multiget_all_to_all(mesh8, tbl, ids)
            return jnp.sum((rows @ w) ** 2)

        def loss_plain(tbl):
            return jnp.sum((tbl[ids] @ w) ** 2)

        arr = jax.device_put(
            jnp.asarray(data),
            jax.sharding.NamedSharding(mesh8, P("model", None)),
        )
        g_a2a = jax.grad(loss_a2a)(arr)
        g_plain = jax.grad(loss_plain)(jnp.asarray(data))
        np.testing.assert_allclose(
            np.asarray(g_a2a), np.asarray(g_plain), rtol=1e-4, atol=1e-5
        )

    def test_lookup_collective_joint_batch(self, mesh8):
        """Training-path variant: batch sharded over (data×model) jointly."""
        rng = np.random.default_rng(15)
        data = rng.normal(size=(64, 16)).astype(np.float32)
        arr = jax.device_put(
            jnp.asarray(data),
            jax.sharding.NamedSharding(mesh8, P("model", None)),
        )
        ids = jnp.asarray(rng.integers(0, 64, 32), jnp.int32)  # 32 % 8 == 0

        @jax.jit
        def run(tbl):
            return sharded_table.lookup_collective(tbl, ids, mesh8)

        got = np.asarray(run(arr))
        np.testing.assert_allclose(got, data[np.asarray(ids)], rtol=1e-6)


class TestTwoTowerExplicitLookup:
    def test_two_tower_explicit_matches_plain(self, mesh8):
        from the_algorithm_tpu.core import mesh as meshlib
        from the_algorithm_tpu.models import two_tower

        U, I, B = 32, 64, 16
        rng = np.random.default_rng(2)
        users = jnp.asarray(rng.integers(0, U, B), jnp.int32)
        items = jnp.asarray(rng.integers(0, I, B), jnp.int32)
        cfg_p = two_tower.TwoTowerConfig(num_users=U, num_items=I, embed_dim=8)
        cfg_x = two_tower.TwoTowerConfig(
            num_users=U, num_items=I, embed_dim=8, explicit_lookup=True
        )
        m_p, m_x = two_tower.TwoTower(cfg_p), two_tower.TwoTower(cfg_x)
        params = m_p.init(jax.random.PRNGKey(0), users, items)
        u1, v1 = m_p.apply(params, users, items)
        with meshlib.local_mesh(mesh8):
            u2, v2 = jax.jit(lambda p: m_x.apply(p, users, items))(params)
        np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)
