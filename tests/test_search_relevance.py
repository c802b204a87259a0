"""Earlybird text relevance depth (BM25 tf/idf + length norm + proximity —
the FeatureBasedScoringFunction luceneScore analog) and the archive tier
roll-off crossing the realtime boundary."""

import numpy as np
import jax.numpy as jnp
import pytest

from the_algorithm_tpu.ops.sparse import PAD_ID
from the_algorithm_tpu.search import earlybird as eb
from the_algorithm_tpu.search import persistence, root


def _pad_docs(docs, L):
    out = np.full((len(docs), L), int(PAD_ID), np.int32)
    for i, d in enumerate(docs):
        out[i, :len(d)] = d
    return out


class TestTextRelevanceOracle:
    def test_parity_with_python_reference(self):
        rng = np.random.default_rng(0)
        vocab = list(range(100, 130))
        docs = [list(rng.choice(vocab, rng.integers(3, 12)))
                for _ in range(40)]
        q = [105, 117, 122]
        got = np.asarray(eb.text_relevance(
            jnp.asarray(_pad_docs(docs, 16)),
            jnp.asarray(np.array(q + [int(PAD_ID)], np.int32)),
            jnp.ones(len(docs), bool),
        ))
        want = eb.text_relevance_reference(docs, q)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_rare_term_outweighs_common(self):
        # "rare" appears in 1 doc, "common" in all; one hit of rare must
        # outscore one hit of common (idf)
        docs = [[1, 2, 3], [1, 2, 4], [1, 2, 5], [1, 2, 99]]
        toks = jnp.asarray(_pad_docs(docs, 8))
        live = jnp.ones(4, bool)
        s_rare = np.asarray(eb.text_relevance(
            toks, jnp.asarray([99, int(PAD_ID)], dtype=jnp.int32), live))
        s_common = np.asarray(eb.text_relevance(
            toks, jnp.asarray([1, int(PAD_ID)], dtype=jnp.int32), live))
        assert s_rare[3] > s_common[3]

    def test_term_frequency_saturates_but_ranks(self):
        docs = [[7, 1, 2, 3], [7, 7, 1, 2], [7, 7, 7, 1]]
        s = np.asarray(eb.text_relevance(
            jnp.asarray(_pad_docs(docs, 8)),
            jnp.asarray([7, int(PAD_ID)], dtype=jnp.int32),
            jnp.ones(3, bool)))
        assert s[0] < s[1] < s[2]  # monotone in tf
        assert (s[2] - s[1]) < (s[1] - s[0])  # saturating

    def test_proximity_boosts_adjacent_pairs(self):
        # same tf for both terms; distance 1 vs distance 5
        docs = [[5, 6, 1, 2, 3, 4, 9, 9], [5, 1, 2, 3, 4, 9, 6, 9]]
        s = np.asarray(eb.text_relevance(
            jnp.asarray(_pad_docs(docs, 8)),
            jnp.asarray([5, 6], dtype=jnp.int32),
            jnp.ones(2, bool)))
        assert s[0] > s[1]

    def test_search_ranks_by_text_relevance(self):
        cfg = eb.EarlybirdConfig(capacity=8, max_tokens=8)
        idx = eb.init_index(cfg)
        texts = [
            "tpu mesh sharding guide",          # both terms adjacent
            "tpu notes and also mesh notes",    # both terms, far apart
            "tpu only here",                    # one term
            "nothing relevant at all",
        ]
        toks = jnp.asarray(np.stack([eb.tokenize(t, 8) for t in texts]))
        n = len(texts)
        idx = eb.ingest(
            idx, toks, jnp.arange(1, n + 1, dtype=jnp.int32),
            jnp.full((n,), 100, jnp.int32),
            jnp.zeros((n, len(eb.DOC_FEATURES)), jnp.float32),
            jnp.asarray(np.arange(11, 11 + n, dtype=np.int32)),
        )
        q = eb.SearchQuery(
            tokens=jnp.asarray(eb.tokenize("tpu mesh", 8)),
            require_all=False,
            min_ts=jnp.int32(0), max_ts=jnp.int32(1000),
        )
        ids, scores = eb.search(idx, q, max_results=4)
        ids = [int(i) for i in np.asarray(ids) if int(i) != int(PAD_ID)]
        assert ids[:2] == [11, 12]  # two-term docs first, adjacent on top
        assert ids[2] == 13


class TestArchiveTier:
    def _mk(self, n, t0, cap=16):
        cfg = eb.EarlybirdConfig(capacity=cap, max_tokens=4)
        idx = eb.init_index(cfg)
        toks = jnp.asarray(np.stack(
            [eb.tokenize(f"hello doc {i}", 4) for i in range(n)]))
        idx = eb.ingest(
            idx, toks, jnp.arange(1, n + 1, dtype=jnp.int32),
            jnp.asarray(t0 + np.arange(n) * 10, jnp.int32),
            jnp.zeros((n, len(eb.DOC_FEATURES)), jnp.float32),
            jnp.asarray(np.arange(500, 500 + n, dtype=np.int32)),
        )
        return idx

    def test_roll_expired_moves_docs(self):
        rt = self._mk(8, t0=100)  # ts 100..170
        archive = eb.init_index(eb.EarlybirdConfig(capacity=32, max_tokens=4))
        rt2, ar2, n = persistence.roll_expired(
            rt, archive, now=200, retention_s=60)
        # ts < 140 expired: ts 100,110,120,130 → 4 docs
        assert n == 4
        rt_ids = set(int(i) for i in np.asarray(rt2.tweet_ids)
                     if int(i) != int(PAD_ID))
        ar_ids = set(int(i) for i in np.asarray(ar2.tweet_ids)
                     if int(i) != int(PAD_ID))
        assert ar_ids == {500, 501, 502, 503}
        assert rt_ids == {504, 505, 506, 507}
        # idempotent: nothing left to roll
        _, _, n2 = persistence.roll_expired(
            rt2, ar2, now=200, retention_s=60)
        assert n2 == 0

    def test_superroot_query_crosses_tier_boundary(self):
        rt = self._mk(8, t0=100)
        archive = eb.init_index(eb.EarlybirdConfig(capacity=32, max_tokens=4))
        rt, archive, _ = persistence.roll_expired(
            rt, archive, now=200, retention_s=60)
        sr = root.SuperRoot([
            root.Tier("realtime", rt, min_ts=140, max_ts=1 << 30),
            root.Tier("full_archive", archive, min_ts=0, max_ts=139),
        ])
        q = eb.SearchQuery(
            tokens=jnp.asarray(eb.tokenize("hello", 4)),
            require_all=True,
            min_ts=jnp.int32(0), max_ts=jnp.int32(1 << 30),
        )
        ids, scores, per_tier = sr.search(q, max_results=8)
        assert {int(i) for i in ids} == set(range(500, 508))
        tiers = {r.tier for r in per_tier}
        assert tiers == {"realtime", "full_archive"}
        # a window entirely in the past routes only to the archive
        q_old = q._replace(max_ts=jnp.int32(135))
        _, _, per_tier_old = sr.search(q_old, max_results=8)
        assert {r.tier for r in per_tier_old} == {"full_archive"}
