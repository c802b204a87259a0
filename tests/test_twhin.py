"""TwHIN heterogeneous-relation embedding tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from the_algorithm_tpu.models import twhin


class TestTwhin:
    def test_relations_shift_user_embedding(self):
        cfg = twhin.TwhinConfig(num_users=8, num_items=8, embed_dim=4)
        model = twhin.Twhin(cfg)
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((2,), jnp.int32), jnp.zeros((2,), jnp.int32),
            jnp.zeros((2,), jnp.int32),
        )
        u0, _ = model.apply(
            params, jnp.asarray([0]), jnp.asarray([0]), jnp.asarray([0])
        )
        u1, _ = model.apply(
            params, jnp.asarray([0]), jnp.asarray([1]), jnp.asarray([0])
        )
        # same user, different relation → translated differently
        assert not np.allclose(np.asarray(u0), np.asarray(u1))

    def test_learns_relation_specific_preferences(self):
        """User u follows item u but favorites item u+8: the relation
        translation must separate the two target sets."""
        U, I = 16, 32
        cfg = twhin.TwhinConfig(num_users=U, num_items=I, embed_dim=16)
        model = twhin.Twhin(cfg)
        users = np.tile(np.arange(U, dtype=np.int32), 2)
        rels = np.concatenate([np.zeros(U, np.int32), np.ones(U, np.int32)])
        items = np.concatenate([
            np.arange(U, dtype=np.int32),  # follows → item u
            np.arange(U, dtype=np.int32) + U,  # favs → item u+16
        ])
        params = model.init(
            jax.random.PRNGKey(0), jnp.asarray(users), jnp.asarray(rels),
            jnp.asarray(items),
        )
        import optax

        tx = optax.adam(5e-2)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt):
            def loss(p):
                u, v = model.apply(
                    p, jnp.asarray(users), jnp.asarray(rels), jnp.asarray(items)
                )
                return twhin.twhin_loss(u, v, jnp.asarray(items), cfg.temperature)

            lv, g = jax.value_and_grad(loss)(params)
            up, opt = tx.update(g, opt)
            return optax.apply_updates(params, up), opt, lv

        for _ in range(300):
            params, opt, lv = step(params, opt)

        # retrieval per relation finds the right target set
        item_table = twhin.entity_embeddings(params)
        u_f, _ = model.apply(
            params, jnp.arange(U), jnp.zeros(U, jnp.int32), jnp.zeros(U, jnp.int32)
        )
        scores = np.asarray(u_f @ item_table.T)  # [U, I]
        top1 = scores.argmax(axis=1)
        follow_acc = (top1 == np.arange(U)).mean()
        u_v, _ = model.apply(
            params, jnp.arange(U), jnp.ones(U, jnp.int32), jnp.zeros(U, jnp.int32)
        )
        scores_v = np.asarray(u_v @ item_table.T)
        fav_acc = (scores_v.argmax(axis=1) == np.arange(U) + U).mean()
        assert follow_acc > 0.8, follow_acc
        assert fav_acc > 0.8, fav_acc

    def test_partition_rules_shard_tables(self, mesh8):
        from the_algorithm_tpu.core.partition import match_partition_rules
        from jax.sharding import PartitionSpec as P

        cfg = twhin.TwhinConfig(num_users=16, num_items=16, embed_dim=8)
        model = twhin.Twhin(cfg)
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1,), jnp.int32),
        )
        specs = match_partition_rules(twhin.PARTITION_RULES, params)
        assert specs["params"]["user_table"] == P("model", None)
        assert specs["params"]["relation_table"] == P()


class TestExplicitLookup:
    """TwHIN over the explicit all-to-all sharded-table exchange."""

    def test_explicit_lookup_matches_plain_gather(self, mesh8):
        from the_algorithm_tpu.core import mesh as meshlib

        U, I, B = 32, 64, 16  # B % 8 devices == 0; rows % 4 shards == 0
        rng = np.random.default_rng(0)
        users = jnp.asarray(rng.integers(0, U, B), jnp.int32)
        rels = jnp.asarray(rng.integers(0, 6, B), jnp.int32)
        items = jnp.asarray(rng.integers(0, I, B), jnp.int32)

        cfg_plain = twhin.TwhinConfig(num_users=U, num_items=I, embed_dim=8)
        cfg_a2a = twhin.TwhinConfig(
            num_users=U, num_items=I, embed_dim=8, explicit_lookup=True
        )
        m_plain, m_a2a = twhin.Twhin(cfg_plain), twhin.Twhin(cfg_a2a)
        params = m_plain.init(jax.random.PRNGKey(0), users, rels, items)

        with meshlib.local_mesh(mesh8):
            u2, v2 = jax.jit(
                lambda p: m_a2a.apply(p, users, rels, items)
            )(params)
        u1, v1 = m_plain.apply(params, users, rels, items)
        np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)

    def test_explicit_lookup_gradients_match(self, mesh8):
        from the_algorithm_tpu.core import mesh as meshlib

        U, I, B = 32, 64, 16
        rng = np.random.default_rng(1)
        users = jnp.asarray(rng.integers(0, U, B), jnp.int32)
        rels = jnp.asarray(rng.integers(0, 6, B), jnp.int32)
        items = jnp.asarray(rng.integers(0, I, B), jnp.int32)

        cfg_plain = twhin.TwhinConfig(num_users=U, num_items=I, embed_dim=8)
        cfg_a2a = twhin.TwhinConfig(
            num_users=U, num_items=I, embed_dim=8, explicit_lookup=True
        )
        m_plain, m_a2a = twhin.Twhin(cfg_plain), twhin.Twhin(cfg_a2a)
        params = m_plain.init(jax.random.PRNGKey(0), users, rels, items)

        def loss_fn(model):
            def f(p):
                u, v = model.apply(p, users, rels, items)
                return twhin.twhin_loss(u, v, items)
            return f

        g_plain = jax.grad(loss_fn(m_plain))(params)
        with meshlib.local_mesh(mesh8):
            g_a2a = jax.jit(jax.grad(loss_fn(m_a2a)))(params)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            ),
            g_plain, g_a2a,
        )
