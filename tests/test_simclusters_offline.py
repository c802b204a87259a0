"""Offline SimClusters chain tests: segment ops, KnownFor recovery on a
planted-community graph, InterestedIn aggregation, producer embeddings."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from the_algorithm_tpu.data import synthetic
from the_algorithm_tpu.ops.segment import row_dedup_count, row_dedup_sum
from the_algorithm_tpu.ops.sparse import PAD_ID
from the_algorithm_tpu.simclusters import (
    interested_in as ii,
    known_for as kf,
    producer_embeddings as pe,
    sims_graph,
)


class TestRowDedupSum:
    def test_basic(self):
        ids = jnp.asarray([[3, 1, 3, 1, 7, int(PAD_ID)]], jnp.int32)
        vals = jnp.asarray([[1.0, 2.0, 10.0, 20.0, 5.0, 0.0]])
        rep, summed = row_dedup_sum(ids, vals)
        got = {
            int(i): float(v)
            for i, v in zip(rep[0], summed[0])
            if int(i) != int(PAD_ID)
        }
        assert got == {1: 22.0, 3: 11.0, 7: 5.0}

    def test_multi_rows_independent(self):
        ids = jnp.asarray([[1, 1, 2], [2, 3, 3]], jnp.int32)
        vals = jnp.ones((2, 3))
        rep, s = row_dedup_sum(ids, vals)
        row0 = {int(i): float(v) for i, v in zip(rep[0], s[0]) if int(i) != int(PAD_ID)}
        row1 = {int(i): float(v) for i, v in zip(rep[1], s[1]) if int(i) != int(PAD_ID)}
        assert row0 == {1: 2.0, 2: 1.0}
        assert row1 == {2: 1.0, 3: 2.0}

    def test_counts(self):
        rep, counts = row_dedup_count(jnp.asarray([[5, 5, 5, 9]], jnp.int32))
        got = {int(i): float(c) for i, c in zip(rep[0], counts[0]) if int(i) != int(PAD_ID)}
        assert got == {5: 3.0, 9: 1.0}

    def test_random_vs_numpy(self):
        rng = np.random.default_rng(0)
        ids = rng.integers(0, 10, size=(8, 32)).astype(np.int32)
        vals = rng.normal(size=(8, 32)).astype(np.float32)
        rep, summed = row_dedup_sum(jnp.asarray(ids), jnp.asarray(vals))
        for r in range(8):
            got = {
                int(i): float(v)
                for i, v in zip(rep[r], summed[r])
                if int(i) != int(PAD_ID)
            }
            want = {}
            for i, v in zip(ids[r], vals[r]):
                want[int(i)] = want.get(int(i), 0.0) + float(v)
            assert got.keys() == want.keys()
            for k in want:
                assert got[k] == pytest.approx(want[k], abs=1e-4)


@pytest.fixture(scope="module")
def planted():
    cfg = synthetic.CommunityGraphConfig(
        num_users=512, num_producers=128, num_communities=8,
        follows_per_user=24, seed=3,
    )
    return synthetic.community_graph(cfg)


@pytest.fixture(scope="module")
def producer_graph(planted):
    """Producer-producer sims graph from the planted follow matrix."""
    follow = sims_graph.follow_matrix_from_adjacency(
        jnp.asarray(planted.producer_ids), planted.config.num_producers
    )
    g = sims_graph.cosine_similarity_graph(follow, top_k=16)
    return sims_graph.symmetrize(g)


class TestSimsGraph:
    def test_self_loops_and_range(self, planted, producer_graph):
        g = producer_graph
        P = planted.config.num_producers
        ids = np.asarray(g.nbr_ids)
        w = np.asarray(g.nbr_weights)
        valid = ids != int(PAD_ID)
        assert ids[valid].min() >= 0 and ids[valid].max() < P
        assert w[valid].min() > 0 and w[valid].max() <= 1.0 + 1e-5
        # self-similarity = 1 should appear as top neighbor for most nodes
        self_top = (ids[:, 0] == np.arange(P)).mean()
        assert self_top > 0.9

    def test_symmetry(self, producer_graph):
        ids = np.asarray(producer_graph.nbr_ids)
        P, D = ids.shape
        adj = {(p, int(q)) for p in range(P) for q in ids[p] if q != int(PAD_ID)}
        asym = [(p, q) for (p, q) in adj if (q, p) not in adj]
        # symmetrize keeps top-D, so a few asymmetric edges can survive
        assert len(asym) / max(len(adj), 1) < 0.2

    def test_in_community_similarity_higher(self, planted, producer_graph):
        ids = np.asarray(producer_graph.nbr_ids)
        comm = planted.producer_community
        P = ids.shape[0]
        same = 0
        tot = 0
        for p in range(P):
            for q in ids[p]:
                if q != int(PAD_ID) and q != p:
                    tot += 1
                    same += comm[p] == comm[int(q)]
        assert same / max(tot, 1) > 0.5  # neighbors are mostly in-community


class TestKnownFor:
    def test_recovers_planted_communities(self, planted, producer_graph):
        P = planted.config.num_producers
        params = kf.KnownForParams(num_clusters=64, final_score="ratio_membership")
        init = kf.initialize_random(jax.random.PRNGKey(0), P, 64)
        out = kf.iterate(producer_graph, init, params, num_iterations=6)
        cluster = np.asarray(out.cluster)
        comm = planted.producer_community
        assigned = cluster >= 0
        assert assigned.mean() > 0.8
        # purity: within each discovered cluster, the dominant planted
        # community should clearly dominate
        purities = []
        for c in np.unique(cluster[assigned]):
            members = comm[cluster == c]
            if len(members) >= 3:
                purities.append(
                    np.bincount(members).max() / len(members)
                )
        assert np.mean(purities) > 0.8

    def test_scores_in_range(self, planted, producer_graph):
        P = planted.config.num_producers
        params = kf.KnownForParams(num_clusters=64)
        init = kf.initialize_random(jax.random.PRNGKey(1), P, 64)
        out = kf.iterate(producer_graph, init, params, num_iterations=3)
        score = np.asarray(out.score)
        assigned = np.asarray(out.cluster) >= 0
        # final ratio scores are in [0, 1]
        assert score[assigned].min() >= 0.0
        assert score[assigned].max() <= 1.0 + 1e-6


class TestInterestedIn:
    def test_aggregates_followed_producers(self, planted, producer_graph):
        P = planted.config.num_producers
        params = kf.KnownForParams(num_clusters=64)
        init = kf.initialize_random(jax.random.PRNGKey(0), P, 64)
        known = kf.iterate(producer_graph, init, params, num_iterations=6)

        graph = ii.FollowFavGraph(
            jnp.asarray(planted.producer_ids),
            jnp.asarray(planted.followed),
            jnp.asarray(planted.fav_score),
            jnp.asarray(planted.log_fav_score),
        )
        out = jax.jit(
            lambda g, k: ii.interested_in_from_known_for(
                g, k, ii.InterestedInParams(num_clusters=64, max_clusters_per_user=10)
            )
        )(graph, known)
        ids = np.asarray(out.ids)
        fav = np.asarray(out.fav_score)
        U = planted.config.num_users
        assert ids.shape == (U, 10)
        has_any = (ids != int(PAD_ID)).any(axis=1)
        assert has_any.mean() > 0.9

        # cross-check one user against a dict recomputation
        u = int(np.argmax(has_any))
        want: dict = {}
        cluster = np.asarray(known.cluster)
        kscore = np.asarray(known.score)
        for d in range(planted.producer_ids.shape[1]):
            p = int(planted.producer_ids[u, d])
            if p == int(PAD_ID) or cluster[p] < 0:
                continue
            c = int(cluster[p])
            ksc = max(0.0, float(kscore[p]))
            want[c] = want.get(c, 0.0) + float(planted.fav_score[u, d]) * ksc
        got = {
            int(i): float(v)
            for i, v in zip(ids[u], fav[u])
            if int(i) != int(PAD_ID)
        }
        for c, v in got.items():
            assert v == pytest.approx(want[c], rel=1e-4)

    def test_social_proof_threshold(self):
        # single contributing producer < threshold=2 → no interest
        pid = jnp.asarray([[0, int(PAD_ID)]], jnp.int32)
        graph = ii.FollowFavGraph(
            pid,
            jnp.asarray([[True, False]]),
            jnp.asarray([[1.0, 0.0]], jnp.float32),
            jnp.asarray([[0.7, 0.0]], jnp.float32),
        )
        known = kf.KnownFor(jnp.asarray([5], jnp.int32), jnp.asarray([1.0], jnp.float32))
        out = ii.interested_in_from_known_for(
            graph, known, ii.InterestedInParams(num_clusters=8, social_proof_threshold=2)
        )
        assert (np.asarray(out.ids) == int(PAD_ID)).all()


class TestProducerEmbeddings:
    def test_shapes_and_consistency(self, planted):
        U, P, C = planted.config.num_users, planted.config.num_producers, 32
        rng = np.random.default_rng(0)
        i_ids = rng.integers(0, C, size=(U, 4)).astype(np.int32)
        i_scores = rng.uniform(0.1, 1.0, size=(U, 4)).astype(np.float32)
        out = pe.producer_embeddings_from_interested_in(
            jnp.asarray(planted.producer_ids),
            jnp.asarray(planted.fav_score),
            jnp.asarray(i_ids),
            jnp.asarray(i_scores),
            num_producers=P,
            num_clusters=C,
            top_k_clusters=8,
            top_k_producers=16,
            threshold=0.0,
        )
        assert out.by_producer.ids.shape == (P, 8)
        assert out.cluster_top_producers_ids.shape == (C, 16)
        # spot-check one producer against dense recomputation
        dense = np.zeros((P, C), np.float32)
        for u in range(U):
            for d in range(planted.producer_ids.shape[1]):
                p = int(planted.producer_ids[u, d])
                if p == int(PAD_ID):
                    continue
                for k in range(4):
                    dense[p, i_ids[u, k]] += planted.fav_score[u, d] * i_scores[u, k]
        p0 = 0
        got = {
            int(i): float(s)
            for i, s in zip(out.by_producer.ids[p0], out.by_producer.scores[p0])
            if int(i) != int(PAD_ID)
        }
        want_order = np.argsort(-dense[p0])[: len(got)]
        for c in want_order:
            assert got[int(c)] == pytest.approx(dense[p0, c], rel=1e-3)
