"""SimClusters sparse-embedding op tests vs. straightforward numpy/dict math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from the_algorithm_tpu.ops import sparse
from the_algorithm_tpu.ops.sparse import PAD_ID, SparseEmbedding


def emb_from_dict(d, capacity=8):
    ids = np.full(capacity, PAD_ID, np.int32)
    scores = np.zeros(capacity, np.float32)
    items = sorted(d.items(), key=lambda kv: -kv[1])[:capacity]
    for i, (k, v) in enumerate(items):
        ids[i] = k
        scores[i] = v
    return SparseEmbedding(jnp.asarray(ids), jnp.asarray(scores))


A = {3: 0.5, 10: 0.2, 145000: 0.9, 7: 0.1}
B = {3: 0.4, 7: 0.3, 99: 0.8}


def dict_dot(a, b):
    return sum(a[k] * b[k] for k in set(a) & set(b))


def dict_norm(a):
    return np.sqrt(sum(v * v for v in a.values()))


class TestSimilarities:
    def test_dot(self):
        got = float(sparse.dot(emb_from_dict(A), emb_from_dict(B)))
        assert got == pytest.approx(dict_dot(A, B), rel=1e-6)

    def test_dot_disjoint_is_zero(self):
        assert float(sparse.dot(emb_from_dict({1: 1.0}), emb_from_dict({2: 1.0}))) == 0.0

    def test_cosine(self):
        want = dict_dot(A, B) / (dict_norm(A) * dict_norm(B))
        got = float(sparse.cosine(emb_from_dict(A), emb_from_dict(B)))
        assert got == pytest.approx(want, rel=1e-6)

    def test_log_norm_cosine(self):
        ln = lambda d: np.log1p(sum(v * v for v in d.values()))
        want = dict_dot(A, B) / (ln(A) * ln(B))
        got = float(sparse.log_norm_cosine(emb_from_dict(A), emb_from_dict(B)))
        assert got == pytest.approx(want, rel=1e-6)

    def test_exp_scaled_cosine(self):
        en = lambda d: sum(v * v for v in d.values()) ** 0.3
        want = dict_dot(A, B) / (en(A) * en(B))
        got = float(sparse.exp_scaled_cosine(emb_from_dict(A), emb_from_dict(B)))
        assert got == pytest.approx(want, rel=1e-6)

    def test_jaccard(self):
        want = len(set(A) & set(B)) / len(set(A) | set(B))
        got = float(sparse.jaccard(emb_from_dict(A), emb_from_dict(B)))
        assert got == pytest.approx(want, rel=1e-6)

    def test_fuzzy_jaccard(self):
        keys = set(A) | set(B)
        num = sum(min(A.get(k, 0), B.get(k, 0)) for k in keys)
        den = sum(max(A.get(k, 0), B.get(k, 0)) for k in keys)
        got = float(sparse.fuzzy_jaccard(emb_from_dict(A), emb_from_dict(B)))
        assert got == pytest.approx(num / den, rel=1e-6)

    def test_euclidean(self):
        keys = set(A) | set(B)
        want = np.sqrt(sum((A.get(k, 0.0) - B.get(k, 0.0)) ** 2 for k in keys))
        got = float(sparse.euclidean(emb_from_dict(A), emb_from_dict(B)))
        assert got == pytest.approx(want, rel=1e-6)

    def test_manhattan(self):
        keys = set(A) | set(B)
        want = sum(abs(A.get(k, 0.0) - B.get(k, 0.0)) for k in keys)
        got = float(sparse.manhattan(emb_from_dict(A), emb_from_dict(B)))
        assert got == pytest.approx(want, rel=1e-6)

    def test_empty_embedding(self):
        empty = emb_from_dict({})
        assert float(sparse.cosine(empty, emb_from_dict(B))) == 0.0
        assert float(sparse.jaccard(empty, emb_from_dict(B))) == 0.0


class TestMonoid:
    def test_add_merges_duplicates(self):
        out = sparse.add(emb_from_dict(A), emb_from_dict(B), capacity=8)
        want = {k: A.get(k, 0) + B.get(k, 0) for k in set(A) | set(B)}
        got = {
            int(i): float(s)
            for i, s in zip(out.ids, out.scores)
            if int(i) != int(PAD_ID)
        }
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k], rel=1e-6)

    def test_add_truncates_to_capacity(self):
        out = sparse.add(emb_from_dict(A), emb_from_dict(B), capacity=3)
        got = {
            int(i): float(s)
            for i, s in zip(out.ids, out.scores)
            if int(i) != int(PAD_ID)
        }
        want = {k: A.get(k, 0) + B.get(k, 0) for k in set(A) | set(B)}
        top3 = dict(sorted(want.items(), key=lambda kv: -kv[1])[:3])
        assert got.keys() == top3.keys()

    def test_scale_truncate(self):
        e = sparse.scale(emb_from_dict(A), 2.0)
        assert float(sparse.dot(e, emb_from_dict(B))) == pytest.approx(
            2 * dict_dot(A, B), rel=1e-6
        )
        t = sparse.truncate(emb_from_dict(A), 2)
        assert int(jnp.sum(t.valid_mask())) == 2


class TestDense:
    def test_round_trip(self):
        e = emb_from_dict(A)
        dense = sparse.to_dense(e, 145001)
        back = sparse.from_dense(dense, 8)
        got = {
            int(i): float(s)
            for i, s in zip(back.ids, back.scores)
            if int(i) != int(PAD_ID)
        }
        assert got.keys() == A.keys()
        for k in A:
            assert got[k] == pytest.approx(A[k], rel=1e-6)

    def test_l2_normalize(self):
        e = sparse.l2_normalize(emb_from_dict(A))
        assert float(sparse.l2_norm(e)) == pytest.approx(1.0, rel=1e-6)


class TestBatchedAndJit:
    def test_vmap_cosine(self):
        a = SparseEmbedding(
            jnp.stack([emb_from_dict(A).ids, emb_from_dict(B).ids]),
            jnp.stack([emb_from_dict(A).scores, emb_from_dict(B).scores]),
        )
        out = sparse.cosine_batch(a, a)
        np.testing.assert_allclose(np.asarray(out), [1.0, 1.0], rtol=1e-6)

    def test_jit_compiles(self):
        f = jax.jit(sparse.cosine)
        v = float(f(emb_from_dict(A), emb_from_dict(B)))
        assert v == pytest.approx(
            dict_dot(A, B) / (dict_norm(A) * dict_norm(B)), rel=1e-6
        )

    def test_pairwise_matrix(self):
        a = SparseEmbedding(
            jnp.stack([emb_from_dict(A).ids, emb_from_dict(B).ids]),
            jnp.stack([emb_from_dict(A).scores, emb_from_dict(B).scores]),
        )
        m = sparse.pairwise_cosine_matrix(a, a)
        assert m.shape == (2, 2)
        np.testing.assert_allclose(np.diag(np.asarray(m)), [1.0, 1.0], rtol=1e-6)
