"""Earlybird-equivalent index tests: ingest ring, match semantics, scoring,
in-network filter, sharded fan-out parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from the_algorithm_tpu.ops.sparse import PAD_ID
from the_algorithm_tpu.search import earlybird as eb


def make_index(cap=32):
    cfg = eb.EarlybirdConfig(capacity=cap, max_tokens=4)
    index = eb.init_index(cfg)
    texts = [
        "jax on tpu is fast",
        "cats and dogs",
        "tpu pods scale",
        "dogs love tpu",
    ]
    toks = jnp.asarray(np.stack([eb.tokenize(t, 4) for t in texts]))
    authors = jnp.asarray([10, 11, 12, 11], jnp.int32)
    ts = jnp.asarray([100, 200, 300, 400], jnp.int32)
    feats = jnp.zeros((4, len(eb.DOC_FEATURES)), jnp.float32)
    feats = feats.at[:, 0].set(jnp.asarray([5.0, 1.0, 50.0, 2.0]))  # fav_count
    ids = jnp.asarray([1001, 1002, 1003, 1004], jnp.int32)
    return eb.ingest(index, toks, authors, ts, feats, ids), cfg


def q(tokens, require_all=False, min_ts=0, max_ts=10**9, follows=None):
    return eb.SearchQuery(
        tokens=jnp.asarray(eb.tokenize(tokens, 4)),
        require_all=require_all,
        min_ts=jnp.int32(min_ts),
        max_ts=jnp.int32(max_ts),
        followed_authors=None if follows is None else jnp.asarray(sorted(follows), jnp.int32),
    )


def result_ids(ids):
    return [int(i) for i in ids if int(i) != int(PAD_ID)]


class TestSearch:
    def test_any_match(self):
        index, _ = make_index()
        ids, _ = eb.search(index, q("tpu"), max_results=10)
        assert set(result_ids(ids)) == {1001, 1003, 1004}

    def test_all_match(self):
        index, _ = make_index()
        ids, _ = eb.search(index, q("tpu dogs", require_all=True), max_results=10)
        assert result_ids(ids) == [1004]

    def test_or_match_ranked_by_overlap_and_favs(self):
        index, _ = make_index()
        ids, scores = eb.search(index, q("tpu dogs"), max_results=10)
        got = result_ids(ids)
        assert set(got) == {1001, 1003, 1004, 1002}
        # 1003's 50 favs dominate; among similar-fav tweets the double-token
        # overlap (1004) outranks the single-token one (1001)
        assert got[0] == 1003
        assert got.index(1004) < got.index(1001)

    def test_time_window(self):
        index, _ = make_index()
        ids, _ = eb.search(index, q("tpu", min_ts=250), max_results=10)
        assert set(result_ids(ids)) == {1003, 1004}

    def test_in_network_filter(self):
        index, _ = make_index()
        ids, _ = eb.search(index, q("tpu", follows=[11]), max_results=10)
        assert result_ids(ids) == [1004]

    def test_ring_buffer_overwrite(self):
        index, cfg = make_index(cap=4)
        # ingest 2 more → wraps, overwriting the 2 oldest
        toks = jnp.asarray(np.stack([eb.tokenize("new tweet tpu", 4)] * 2))
        index = eb.ingest(
            index, toks,
            jnp.asarray([20, 21], jnp.int32), jnp.asarray([500, 600], jnp.int32),
            jnp.zeros((2, len(eb.DOC_FEATURES)), jnp.float32),
            jnp.asarray([2001, 2002], jnp.int32),
        )
        ids, _ = eb.search(index, q("tpu"), max_results=10)
        got = set(result_ids(ids))
        assert 1001 not in got  # overwritten
        assert {2001, 2002} <= got

    def test_model_score_fn_override(self):
        index, _ = make_index()
        # model: score = reply_count → tweet 1003 (50 favs? no — col 0) …
        ids, scores = eb.search(
            index, q("tpu"), max_results=3,
            model_score_fn=lambda f: f[:, 0],  # raw fav_count
        )
        assert result_ids(ids)[0] == 1003  # 50 favs dominates

    def test_sharded_matches_single(self, mesh8):
        cfg = eb.EarlybirdConfig(capacity=32, max_tokens=4)
        index = eb.init_index(cfg)
        rng = np.random.default_rng(0)
        texts = ["tpu fast"] * 8 + ["other things"] * 8
        toks = jnp.asarray(np.stack([eb.tokenize(t, 4) for t in texts]))
        index = eb.ingest(
            index, toks,
            jnp.asarray(rng.integers(0, 5, 16).astype(np.int32)),
            jnp.asarray(np.arange(16, dtype=np.int32)),
            jnp.asarray(rng.uniform(0, 1, (16, len(eb.DOC_FEATURES))).astype(np.float32)),
            jnp.asarray(np.arange(100, 116, dtype=np.int32)),
        )
        query = q("tpu")
        si, ss = eb.search(index, query, max_results=8)
        shi, shs = eb.search_sharded(mesh8, index, query, max_results=8)
        np.testing.assert_array_equal(np.asarray(shi), np.asarray(si))
        np.testing.assert_allclose(
            np.asarray(shs), np.asarray(ss), rtol=1e-6
        )

    def test_tokenize_stable_and_padded(self):
        a = eb.tokenize("Hello WORLD", 4)
        b = eb.tokenize("hello world extra tokens overflow", 4)
        assert a[0] == b[0] and a[1] == b[1]
        assert a[2] == int(PAD_ID)
        assert (b != int(PAD_ID)).all()


class TestInNetworkBatch:
    """search_in_network_batch ≡ per-user search() with followed_authors
    (the r4 batched product leg): corpus scoring hoisted out of the
    per-user vmap must not change results."""

    def test_matches_per_user_search(self):
        rng = np.random.default_rng(4)
        T, A, R, FW, K = 256, 32, 6, 8, 12
        toks = np.full((T, 4), int(PAD_ID), np.int32)
        toks[:, 0] = 7
        authors = (np.arange(T) % A).astype(np.int32)
        ts = (1000 + rng.integers(0, 500, T)).astype(np.int32)
        feats = rng.random((T, len(eb.DOC_FEATURES))).astype(np.float32)
        tids = (5000 + np.arange(T)).astype(np.int32)
        idx = eb.EarlybirdIndex(
            jnp.asarray(toks), jnp.asarray(authors), jnp.asarray(ts),
            jnp.asarray(feats), jnp.asarray(tids), jnp.int32(T))
        q = eb.SearchQuery(
            tokens=jnp.full((1,), int(PAD_ID), jnp.int32),
            require_all=True, min_ts=jnp.int32(0), max_ts=jnp.int32(2000))
        follows = np.full((R, FW), int(PAD_ID), np.int32)
        for r in range(R):
            n = int(rng.integers(2, FW))
            follows[r, :n] = np.sort(rng.choice(A, n, replace=False))

        got_ids, got_scores = eb.search_in_network_batch(
            idx, q, jnp.asarray(follows), max_results=K,
            approx_top_k=False)
        for r in range(R):
            qr = q._replace(followed_authors=jnp.asarray(follows[r]))
            want_ids, want_scores = eb.search(idx, qr, max_results=K)
            np.testing.assert_array_equal(
                np.asarray(got_ids)[r], np.asarray(want_ids), err_msg=str(r))
            np.testing.assert_allclose(
                np.asarray(got_scores)[r], np.asarray(want_scores),
                atol=1e-5, err_msg=str(r))
