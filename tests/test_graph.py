"""Graph-job tests: tweepcred PageRank, RealGraph edge model, UTEG traversal."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from the_algorithm_tpu.graph import realgraph, tweepcred, uteg
from the_algorithm_tpu.ops.sparse import PAD_ID


class TestTweepcred:
    def _star_graph(self):
        """Everyone follows node 0 (edge = follower → followee)."""
        N, D = 8, 2
        dst = np.full((N, D), int(PAD_ID), np.int32)
        w = np.zeros((N, D), np.float32)
        for u in range(1, N):
            dst[u, 0] = 0
            w[u, 0] = 1.0
        return tweepcred.OutEdges(jnp.asarray(dst), jnp.asarray(w))

    def test_hub_gets_highest_rank(self):
        edges = self._star_graph()
        prior = jnp.ones((8,), jnp.float32)
        pr = tweepcred.weighted_pagerank(edges, prior)
        pr = np.asarray(pr)
        assert pr.argmax() == 0
        assert pr.sum() == pytest.approx(1.0, rel=1e-4)

    def test_matches_networkx_style_reference(self):
        rng = np.random.default_rng(0)
        N, D = 16, 4
        dst = np.full((N, D), int(PAD_ID), np.int32)
        w = np.zeros((N, D), np.float32)
        for u in range(N):
            nbrs = rng.choice([x for x in range(N) if x != u], D, replace=False)
            dst[u] = nbrs
            w[u] = rng.uniform(0.5, 1.0, D)
        pr = np.asarray(
            tweepcred.weighted_pagerank(
                tweepcred.OutEdges(jnp.asarray(dst), jnp.asarray(w)),
                jnp.ones((N,), jnp.float32),
                tweepcred.PageRankParams(max_iterations=100, threshold=1e-9),
            )
        )
        # numpy power-iteration reference
        P = np.zeros((N, N))
        for u in range(N):
            P[u, dst[u]] = w[u] / w[u].sum()
        v = np.ones(N) / N
        for _ in range(200):
            v = 0.15 * np.ones(N) / N + 0.85 * (P.T @ v)
        np.testing.assert_allclose(pr, v, atol=1e-4)

    def test_scaled_reputation_range(self):
        pr = jnp.asarray([0.0, 1e-30, 1e-10, 1e-5, 0.5])
        rep = np.asarray(tweepcred.scaled_reputation(pr))
        assert rep[0] == 0 and rep[1] == 0
        assert 0 <= rep.min() and rep.max() <= 100
        assert rep[4] > rep[3] > rep[2]

    def test_post_adjustment_penalizes_follow_spam(self):
        mass = jnp.asarray([1.0, 1.0])
        followers = jnp.asarray([10, 10])
        followings = jnp.asarray([3000, 10])  # spammer vs normal
        adj = np.asarray(
            tweepcred.adjust_post_calculation(mass, followers, followings)
        )
        assert adj[0] < 1.0
        assert adj[1] == 1.0

    def test_user_mass_heuristics(self):
        mass = np.asarray(
            tweepcred.user_mass_prior(
                is_suspended=jnp.asarray([True, False, False]),
                is_verified=jnp.asarray([False, True, False]),
                account_age_days=jnp.asarray([100, 100, 1000]),
                has_valid_device=jnp.asarray([True, True, False]),
                is_restricted=jnp.asarray([False, False, True]),
            )
        )
        assert mass[0] == 0.0
        assert mass[1] == 100.0
        assert 0 < mass[2] < 1.0  # restricted multiplier


class TestRealGraph:
    def test_apply_and_features(self):
        table = realgraph.init_table(4, degree=3)
        fav = realgraph.INTERACTION_TYPES.index("fav")
        reply = realgraph.INTERACTION_TYPES.index("reply")
        table = realgraph.apply_interactions(
            table,
            jnp.asarray([0, 0, 0], jnp.int32),
            jnp.asarray([1, 1, 2], jnp.int32),
            jnp.asarray([fav, fav, reply], jnp.int32),
            jnp.asarray([10, 10, 10], jnp.int32),
        )
        nbrs = np.asarray(table.neighbor_ids[0])
        feats = np.asarray(realgraph.edge_features(table, jnp.int32(10)))
        slot1 = int(np.where(nbrs == 1)[0][0])
        slot2 = int(np.where(nbrs == 2)[0][0])
        assert feats[0, slot1, fav] == pytest.approx(2.0)
        assert feats[0, slot2, reply] == pytest.approx(1.0)

    def test_decay(self):
        table = realgraph.init_table(2, degree=2)
        fav = realgraph.INTERACTION_TYPES.index("fav")
        table = realgraph.apply_interactions(
            table,
            jnp.asarray([0], jnp.int32), jnp.asarray([1], jnp.int32),
            jnp.asarray([fav], jnp.int32), jnp.asarray([0], jnp.int32),
            half_life_s=100.0,
        )
        feats = realgraph.edge_features(table, jnp.int32(100), half_life_s=100.0)
        assert float(feats[0, 0, fav]) == pytest.approx(0.5)

    def test_eviction_keeps_strong_edges(self):
        table = realgraph.init_table(2, degree=2)
        fav = realgraph.INTERACTION_TYPES.index("fav")
        # edges to 1 (x3), 2 (x1), then 3 (x1) → 2 (weakest) evicted
        src = jnp.asarray([0] * 5, jnp.int32)
        dst = jnp.asarray([1, 1, 1, 2, 3], jnp.int32)
        table = realgraph.apply_interactions(
            table, src, dst,
            jnp.full((5,), fav, jnp.int32), jnp.arange(5, dtype=jnp.int32),
        )
        nbrs = set(int(x) for x in np.asarray(table.neighbor_ids[0]))
        assert 1 in nbrs and 3 in nbrs and 2 not in nbrs

    def test_model_learns_edge_strength(self):
        rng = np.random.default_rng(0)
        F = len(realgraph.INTERACTION_TYPES)
        feats = rng.exponential(2.0, size=(512, F)).astype(np.float32)
        # ground truth: interaction iff lots of favs
        labels = (feats[:, 0] > 2.0).astype(np.float32)
        params = realgraph.init_model(jax.random.PRNGKey(0))
        import optax

        tx = optax.adam(0.1)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt):
            lv, g = jax.value_and_grad(realgraph.loss_fn)(
                params, jnp.asarray(feats), jnp.asarray(labels)
            )
            up, opt = tx.update(g, opt)
            return optax.apply_updates(params, up), opt, lv

        for _ in range(100):
            params, opt, lv = step(params, opt)
        preds = realgraph.predict_edge_scores(params, jnp.asarray(feats))
        from the_algorithm_tpu.training.metrics import auc

        assert float(auc(preds, jnp.asarray(labels))) > 0.95

    def test_top_edges(self):
        table = realgraph.init_table(2, degree=4)
        fav = realgraph.INTERACTION_TYPES.index("fav")
        src = jnp.asarray([0, 0, 0, 0], jnp.int32)
        dst = jnp.asarray([1, 1, 1, 2], jnp.int32)
        table = realgraph.apply_interactions(
            table, src, dst, jnp.full((4,), fav, jnp.int32),
            jnp.arange(4, dtype=jnp.int32),
        )
        params = realgraph.init_model(jax.random.PRNGKey(0))
        params = {"w": jnp.ones(len(realgraph.INTERACTION_TYPES)), "b": jnp.zeros(())}
        ids, scores = realgraph.top_edges(table, params, jnp.int32(0), jnp.int32(4), k=2)
        assert int(ids[0]) == 1  # 3 favs beats 1 fav


class TestUteg:
    def test_recommend_social_proof(self):
        graph = uteg.init_graph(8, width=4)
        # seeds 1 and 2 both faved tweet 100; seed 1 also faved 200
        graph = uteg.record_engagements(
            graph,
            np.array([1, 2, 1]),
            np.array([100, 100, 200]),
            np.array([int(uteg.EngagementType.FAVORITE)] * 3),
            np.array([10, 11, 12]),
        )
        ids, scores, proof = uteg.recommend(
            graph,
            jnp.asarray([1, 2], jnp.int32),
            jnp.asarray([1.0, 0.5], jnp.float32),
            max_results=5,
        )
        got = {
            int(i): (float(s), int(p))
            for i, s, p in zip(ids, scores, proof)
            if int(i) != int(PAD_ID)
        }
        assert got[100] == (pytest.approx(1.5), 2)
        assert got[200] == (pytest.approx(1.0), 1)
        assert list(got)[0] == 100  # highest score first

    def test_min_social_proof_filters(self):
        graph = uteg.init_graph(4, width=2)
        graph = uteg.record_engagements(
            graph, np.array([1]), np.array([55]),
            np.array([int(uteg.EngagementType.FAVORITE)]), np.array([1]),
        )
        ids, _, _ = uteg.recommend(
            graph, jnp.asarray([1, 2], jnp.int32),
            jnp.ones(2, jnp.float32), max_results=5, min_social_proof=2,
        )
        assert all(int(i) == int(PAD_ID) for i in ids)

    def test_time_and_type_filters(self):
        graph = uteg.init_graph(4, width=4)
        graph = uteg.record_engagements(
            graph,
            np.array([1, 1]),
            np.array([7, 8]),
            np.array([int(uteg.EngagementType.FAVORITE), int(uteg.EngagementType.CLICK)]),
            np.array([100, 200]),
        )
        ids, _, _ = uteg.recommend(
            graph, jnp.asarray([1], jnp.int32), jnp.ones(1, jnp.float32),
            max_results=5, min_timestamp=jnp.int32(150),
            exclude_types=(uteg.EngagementType.CLICK,),
        )
        assert all(int(i) == int(PAD_ID) for i in ids)  # 7 too old, 8 excluded
