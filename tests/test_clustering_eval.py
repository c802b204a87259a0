"""Clustering library, entity embeddings, and cluster-evaluation tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from the_algorithm_tpu.ops.sparse import PAD_ID, SparseEmbedding
from the_algorithm_tpu.simclusters import clustering, entity_embeddings, evaluation
from the_algorithm_tpu.simclusters.known_for import Graph, KnownFor


def embs(rows, K=4):
    ids = np.full((len(rows), K), PAD_ID, np.int32)
    sc = np.zeros((len(rows), K), np.float32)
    for r, d in enumerate(rows):
        for i, (k, v) in enumerate(sorted(d.items(), key=lambda kv: -kv[1])[:K]):
            ids[r, i], sc[r, i] = k, v
    return SparseEmbedding(jnp.asarray(ids), jnp.asarray(sc))


class TestClustering:
    # two obvious groups: {0,1} share cluster 1, {2,3} share cluster 9
    E = embs([{1: 1.0}, {1: 0.9, 2: 0.1}, {9: 1.0}, {9: 0.8}])

    def test_connected_components(self):
        sim = clustering.similarity_matrix(self.E)
        labels = np.asarray(clustering.connected_components(sim, threshold=0.5))
        assert labels[0] == labels[1]
        assert labels[2] == labels[3]
        assert labels[0] != labels[2]

    def test_connected_components_no_edges(self):
        sim = jnp.eye(3)
        labels = np.asarray(clustering.connected_components(sim, 0.5))
        assert len(set(labels.tolist())) == 3

    def test_largest_dimension(self):
        labels = np.asarray(clustering.largest_dimension(self.E))
        assert labels.tolist() == [1, 1, 9, 9]

    def test_louvain_groups(self):
        sim = np.asarray(clustering.similarity_matrix(self.E))
        labels = clustering.louvain(sim, threshold=0.2)
        assert labels[0] == labels[1]
        assert labels[2] == labels[3]
        assert labels[0] != labels[2]

    def test_medoid_representative(self):
        labels = jnp.asarray([0, 0, 1, 1])
        is_medoid = np.asarray(clustering.medoid_representative(self.E, labels))
        # at least one medoid per cluster; in cluster 0 the asymmetric member
        # similarities give a unique winner (cluster 1's members are parallel
        # vectors — cosine ties, so both qualify)
        assert is_medoid[:2].sum() == 1
        assert is_medoid[2:].sum() >= 1

    def test_max_weight_representative(self):
        labels = jnp.asarray([0, 0, 1, 1])
        w = jnp.asarray([5.0, 1.0, 0.5, 9.0])
        rep = np.asarray(clustering.max_weight_representative(labels, w))
        assert rep.tolist() == [True, False, False, True]


class TestEntityEmbeddings:
    def test_sum_and_normalize(self):
        interests = embs([{3: 1.0}, {3: 0.5, 7: 0.5}])
        out = entity_embeddings.entity_embeddings_from_engagements(
            jnp.asarray([0, 0], jnp.int32),  # both events on entity 0
            jnp.asarray([0, 1], jnp.int32),
            jnp.asarray([1.0, 2.0]),
            interests,
            num_entities=2,
            num_clusters=16,
            top_k=4,
        )
        got = {
            int(i): float(s)
            for i, s in zip(out.ids[0], out.scores[0])
            if int(i) != int(PAD_ID)
        }
        # raw: c3 = 1 + 2*0.5 = 2 ; c7 = 2*0.5 = 1 → normalized by √5
        assert got[3] == pytest.approx(2 / np.sqrt(5), rel=1e-5)
        assert got[7] == pytest.approx(1 / np.sqrt(5), rel=1e-5)
        # entity 1 untouched
        assert (np.asarray(out.ids[1]) == int(PAD_ID)).all()


class TestEvaluation:
    def _two_cliques(self):
        # nodes 0-2 clique A, 3-5 clique B, one cross edge 2-3
        D = 3
        ids = np.full((6, D), int(PAD_ID), np.int32)
        w = np.zeros((6, D), np.float32)
        edges = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)]
        adj = {u: [] for u in range(6)}
        for u, v in edges:
            adj[u].append(v)
            adj[v].append(u)
        for u, nbrs in adj.items():
            for i, v in enumerate(nbrs[:D]):
                ids[u, i] = v
                w[u, i] = 1.0
        return Graph(jnp.asarray(ids), jnp.asarray(w))

    def test_evaluate_clusters(self):
        g = self._two_cliques()
        kf = KnownFor(
            jnp.asarray([0, 0, 0, 1, 1, 1], jnp.int32), jnp.ones(6, jnp.float32)
        )
        q = evaluation.evaluate_clusters(g, kf, num_clusters=2)
        assert np.asarray(q.sizes).tolist() == [3.0, 3.0]
        fracs = np.asarray(q.in_cluster_weight_fraction)
        assert (fracs > 0.6).all()  # most weight stays inside the cliques

    def test_compare_known_for(self):
        a = KnownFor(jnp.asarray([0, 0, 1, 1], jnp.int32), jnp.ones(4))
        b = KnownFor(jnp.asarray([5, 5, 9, 9], jnp.int32), jnp.ones(4))  # relabeled
        out = evaluation.compare_known_for(a, b, 10)
        assert out["purity_ab"] == 1.0 and out["purity_ba"] == 1.0
        c = KnownFor(jnp.asarray([5, 9, 5, 9], jnp.int32), jnp.ones(4))
        out2 = evaluation.compare_known_for(a, c, 10)
        assert out2["purity_ab"] < 1.0

    def test_bipartite_engagement_eval(self):
        score = evaluation.bipartite_engagement_eval(
            jnp.asarray([0, 1], jnp.int32),
            jnp.asarray([0, 0, 1], jnp.int32),
            jnp.asarray([0, 1, 1], jnp.int32),
            jnp.asarray([0, 1], jnp.int32),
        )
        assert score == pytest.approx(2 / 3)

    def test_top_eigenvectors(self):
        # weighted graph with well-separated eigenvalue magnitudes (the
        # unweighted two-clique graph has a ±1.732 magnitude tie that block
        # power iteration legitimately cannot split)
        rng = np.random.default_rng(0)
        N, D = 8, 8
        A = rng.uniform(0.1, 1.0, (N, N))
        A = (A + A.T) / 2 + np.eye(N) * 2  # diagonally dominant, distinct |λ|
        ids = np.tile(np.arange(N, dtype=np.int32), (N, 1))
        g = Graph(jnp.asarray(ids), jnp.asarray(A.astype(np.float32)))
        vals, vecs = evaluation.top_eigenvectors(g, k=2, iterations=200)
        true = np.linalg.eigvalsh(A)
        true = true[np.argsort(-np.abs(true))][:2]
        np.testing.assert_allclose(
            np.sort(np.abs(np.asarray(vals)))[::-1],
            np.sort(np.abs(true))[::-1],
            rtol=1e-3,
        )


class TestLocaleAndTfgEmbeddings:
    """r3 locale/TFG variants (scalding/embedding/Locale*, tfg/FavTfg…)."""

    def _interests(self, U=6, K=2, C=8):
        import numpy as np

        ids = np.zeros((U, K), np.int32)
        sc = np.zeros((U, K), np.float32)
        for u in range(U):
            ids[u, 0] = u % C
            sc[u, 0] = 1.0
            ids[u, 1] = int(PAD_ID)
        return SparseEmbedding(jnp.asarray(ids), jnp.asarray(sc))

    def test_locale_embeddings_are_per_locale(self):
        import numpy as np

        from the_algorithm_tpu.simclusters import entity_embeddings as ee

        interests = self._interests()
        # entity 0 engaged by user 1 in locale 0 and user 2 in locale 1
        emb = ee.locale_entity_embeddings(
            jnp.asarray([0, 0], jnp.int32), jnp.asarray([0, 1], jnp.int32),
            jnp.asarray([1, 2], jnp.int32), jnp.ones(2, jnp.float32),
            interests, num_entities=2, num_locales=2, num_clusters=8,
            top_k=4,
        )
        r0 = ee.locale_row(0, 0, 2)
        r1 = ee.locale_row(0, 1, 2)
        ids0 = [int(i) for i in np.asarray(emb.ids[r0]) if i != int(PAD_ID)]
        ids1 = [int(i) for i in np.asarray(emb.ids[r1]) if i != int(PAD_ID)]
        assert ids0 == [1]  # user 1's cluster only (locale 0)
        assert ids1 == [2]  # user 2's cluster only (locale 1)

    def test_fav_tfg_log_weighting(self):
        import numpy as np

        from the_algorithm_tpu.simclusters import entity_embeddings as ee

        interests = self._interests()
        # same topic, two users with fav counts 1 vs e^3-1: log1p weights
        emb = ee.fav_tfg_topic_embeddings(
            jnp.asarray([0, 0], jnp.int32), jnp.asarray([0, 0], jnp.int32),
            jnp.asarray([1, 2], jnp.int32),
            jnp.asarray([np.e - 1.0, np.e**3 - 1.0], jnp.float32),
            interests, num_topics=1, num_locales=1, num_clusters=8,
            top_k=4,
        )
        sc = np.asarray(emb.scores[0])
        ids = np.asarray(emb.ids[0])
        s1 = float(sc[list(ids).index(1)])
        s2 = float(sc[list(ids).index(2)])
        # weights 1 vs 3 → after L2 normalization ratio 3 preserved
        np.testing.assert_allclose(s2 / s1, 3.0, rtol=1e-4)

    def test_reverse_cluster_index(self):
        import numpy as np

        from the_algorithm_tpu.simclusters import entity_embeddings as ee

        ids = jnp.asarray([[1, int(PAD_ID)], [1, 2]], jnp.int32)  # 2 entities
        sc = jnp.asarray([[0.9, 0.0], [0.5, 0.7]], jnp.float32)
        rev = ee.reverse_cluster_index(
            SparseEmbedding(ids, sc), num_clusters=4, top_m=2)
        # cluster 1: entity 0 (0.9) then entity 1 (0.5)
        np.testing.assert_array_equal(np.asarray(rev.ids[1]), [0, 1])
        # cluster 2: only entity 1
        assert int(rev.ids[2][0]) == 1
        assert int(rev.ids[2][1]) == int(PAD_ID)
