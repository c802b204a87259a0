"""Earlybird query-language depth (VERDICT r1 #7): phrase + negation
matching, 30-field doc schema, request-scoped relevance params, facet
counting, ingester document builder, and model-based scoring in the sharded
path — each against a numpy oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from the_algorithm_tpu.ops.sparse import PAD_ID
from the_algorithm_tpu.search import earlybird as eb


def _tok(text):
    return eb.tokenize(text, 8)


def make_corpus():
    cfg = eb.EarlybirdConfig(capacity=16, max_tokens=8)
    texts = [
        "hello world how are you",      # 500
        "world hello inverted order",   # 501
        "hello there spam content",     # 502
        "pure noise tokens here",       # 503
        "hello world spam",             # 504
    ]
    tweets = [
        eb.RawTweet(tweet_id=500 + i, author_id=10 + i, created_ts=100 + i,
                    text=t, fav_count=i * 10)
        for i, t in enumerate(texts)
    ]
    docs = eb.build_documents(tweets, cfg, now=200)
    index = eb.ingest(eb.init_index(cfg), *docs[:5])
    return cfg, index, docs[5]  # facets


CFG, INDEX, FACETS = make_corpus()


def _search_ids(query, **kw):
    ids, _ = eb.search(INDEX, query, max_results=8, **kw)
    return set(int(i) for i in np.asarray(ids) if i != PAD_ID)


class TestQueryLanguage:
    def test_phrase_requires_consecutive_order(self):
        q = eb.SearchQuery(
            tokens=jnp.asarray(_tok("")), require_all=False,
            min_ts=jnp.int32(0), max_ts=jnp.int32(1000),
            phrases=jnp.asarray(_tok("hello world")[None, :4]),
        )
        got = _search_ids(q)
        # 500 + 504 contain "hello world" consecutively; 501 has both
        # words in the wrong order; 502 has only "hello"
        assert got == {500, 504}

    def test_negation_excludes_docs(self):
        kw = eb.parse_query("hello -spam")
        q = eb.SearchQuery(
            require_all=False, min_ts=jnp.int32(0), max_ts=jnp.int32(1000),
            **kw,
        )
        got = _search_ids(q)
        assert got == {500, 501}  # 502/504 contain spam

    def test_phrase_plus_negation(self):
        kw = eb.parse_query('"hello world" -spam')
        q = eb.SearchQuery(
            require_all=False, min_ts=jnp.int32(0), max_ts=jnp.int32(1000),
            **kw,
        )
        assert _search_ids(q) == {500}

    def test_parse_query_round_trip(self):
        kw = eb.parse_query('tpu "exact phrase" -bad -worse')
        assert int((np.asarray(kw["exclude_tokens"]) != PAD_ID).sum()) == 2
        assert kw["phrases"].shape[1] == 4
        assert int((np.asarray(kw["tokens"]) != PAD_ID).sum()) == 1

    def test_empty_phrase_rows_ignored(self):
        phr = np.full((2, 4), int(PAD_ID), np.int32)
        phr[0, :2] = np.asarray(_tok("hello world")[:2])
        q = eb.SearchQuery(
            tokens=jnp.asarray(_tok("")), require_all=False,
            min_ts=jnp.int32(0), max_ts=jnp.int32(1000),
            phrases=jnp.asarray(phr),
        )
        assert _search_ids(q) == {500, 504}


class TestRelevanceParams:
    def test_linear_score_matches_numpy_oracle(self):
        rel = eb.default_relevance_params()
        feats = np.asarray(INDEX.features)
        got = np.asarray(eb.linear_score(INDEX.features, rel))
        w = np.asarray(rel.weights)
        x = np.where(eb._COUNT_MASK, np.log1p(np.maximum(feats, 0)), feats)
        want = x @ w
        # demotions are 1.0 and language boost 0 by default
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_request_scoped_recency_boost(self):
        w = np.zeros(len(eb.DOC_FEATURES), np.float32)
        rel = eb.RelevanceParams(
            weights=jnp.asarray(w),
            recency_weight=jnp.float32(2.0),
            recency_half_life_s=jnp.float32(1.0),
        )
        q = eb.SearchQuery(
            tokens=jnp.asarray(_tok("")), require_all=False,
            min_ts=jnp.int32(0), max_ts=jnp.int32(104),
        )
        ids, scores = eb.search(INDEX, q, max_results=5, relevance=rel)
        # newest tweet (504, ts=104) must rank first on pure recency
        assert int(np.asarray(ids)[0]) == 504

    def test_reply_demotion_multiplies(self):
        feats = np.zeros((2, len(eb.DOC_FEATURES)), np.float32)
        feats[:, eb.DOC_FEATURE_INDEX["text_score"]] = 1.0
        feats[1, eb.DOC_FEATURE_INDEX["is_reply"]] = 1.0
        w = np.zeros(len(eb.DOC_FEATURES), np.float32)
        w[eb.DOC_FEATURE_INDEX["text_score"]] = 1.0
        rel = eb.RelevanceParams(
            weights=jnp.asarray(w), reply_demotion=jnp.float32(0.5)
        )
        got = np.asarray(eb.linear_score(jnp.asarray(feats), rel))
        np.testing.assert_allclose(got, [1.0, 0.5], rtol=1e-6)


class TestFacets:
    def test_facet_counts_top_k(self):
        cfg = eb.EarlybirdConfig(capacity=8, max_tokens=8)
        tweets = [
            eb.RawTweet(tweet_id=i, author_id=1, created_ts=10,
                        text=f"#jax rocks {'#tpu' if i % 2 else ''}")
            for i in range(6)
        ]
        docs = eb.build_documents(tweets, cfg)
        index = eb.ingest(eb.init_index(cfg), *docs[:5])
        facets = docs[5]
        match = jnp.asarray([True] * 6 + [False] * 2)
        ids, counts = eb.facet_counts(facets, match[:6], k=3)
        ids, counts = np.asarray(ids), np.asarray(counts)
        jax_h = eb._hash_term("#jax")
        tpu_h = eb._hash_term("#tpu")
        assert ids[0] == jax_h and counts[0] == 6
        assert ids[1] == tpu_h and counts[1] == 3

    def test_facets_respect_match_mask(self):
        facets = jnp.asarray(
            [[7, PAD_ID], [7, 9], [7, 9]], jnp.int32
        )
        match = jnp.asarray([True, False, True])
        ids, counts = eb.facet_counts(facets, match, k=2)
        got = dict(zip(np.asarray(ids).tolist(), np.asarray(counts).tolist()))
        assert got.get(7) == 2 and got.get(9) == 1


class TestIngester:
    def test_document_features_oracle(self):
        cfg = eb.EarlybirdConfig(capacity=4, max_tokens=8)
        t = eb.RawTweet(
            tweet_id=1, author_id=2, created_ts=1000,
            text="check this out https://x.com #jax @you",
            fav_count=7, is_reply=True, language="en",
        )
        _, _, _, feats, _, facets = eb.build_documents([t], cfg, now=4600)
        f = np.asarray(feats)[0]
        ix = eb.DOC_FEATURE_INDEX
        assert f[ix["fav_count"]] == 7
        assert f[ix["is_reply"]] == 1.0
        assert f[ix["has_url"]] == 1.0
        assert f[ix["num_hashtags"]] == 1.0
        assert f[ix["num_mentions"]] == 1.0
        assert f[ix["language_match"]] == 1.0
        assert f[ix["tweet_age_hours"]] == 1.0
        assert np.asarray(facets)[0, 0] != int(PAD_ID)


class TestShardedModelScoring:
    def test_sharded_phrase_negation_model_matches_oracle(self, mesh8):
        """The VERDICT 'done' bar: sharded search with phrase + negation +
        model scoring equals the numpy oracle."""
        cfg = eb.EarlybirdConfig(capacity=32, max_tokens=8)
        rng = np.random.default_rng(0)
        texts = []
        for i in range(32):
            base = "hello world" if i % 3 == 0 else "world hello"
            spam = " spam" if i % 4 == 0 else ""
            texts.append(f"{base} filler{i}{spam}")
        tweets = [
            eb.RawTweet(tweet_id=600 + i, author_id=i, created_ts=50 + i,
                        text=t, fav_count=int(rng.integers(0, 50)))
            for i, t in enumerate(texts)
        ]
        docs = eb.build_documents(tweets, cfg)
        index = eb.ingest(eb.init_index(cfg), *docs[:5])

        w = rng.normal(0, 1, len(eb.DOC_FEATURES)).astype(np.float32)
        model = lambda f: jnp.einsum("tf,f->t", f, jnp.asarray(w))

        kw = eb.parse_query('"hello world" -spam')
        q = eb.SearchQuery(
            require_all=False, min_ts=jnp.int32(0), max_ts=jnp.int32(1000),
            **kw,
        )
        ids, scores = eb.search_sharded(
            mesh8, index, q, max_results=8, model_score_fn=model
        )
        ids = np.asarray(ids)

        # numpy oracle over the raw corpus
        feats = np.asarray(index.features)
        base_score = feats @ w
        want = {}
        for i, t in enumerate(texts):
            if "spam" in t:
                continue
            toks = t.split()
            ok = any(
                toks[j] == "hello" and toks[j + 1] == "world"
                for j in range(len(toks) - 1)
            )
            if ok:
                want[600 + i] = base_score[i] + 0.0
        want_ids = sorted(want, key=lambda k: -want[k])[:8]
        got_ids = [int(i) for i in ids if i != int(PAD_ID)]
        assert got_ids == want_ids


class TestDocFeatureReader:
    def test_reader_feeds_hydrator_block(self):
        read = eb.doc_feature_reader(INDEX)
        block = read(np.asarray([504, 999]))
        assert set(block) == set(eb.DOC_FEATURES)
        assert block["fav_count"][0] == 40.0  # tweet 504 had fav_count=40
        assert all(block[n][1] == 0.0 for n in eb.DOC_FEATURES)  # unknown id


class TestPhraseAtDocTail:
    def test_short_phrase_matches_at_last_positions(self):
        """Regression: a phrase shorter than the padded phrase_len must
        match when it sits in the doc's final token positions."""
        cfg = eb.EarlybirdConfig(capacity=4, max_tokens=6)
        # 6 tokens, "hello world" at positions 4..5 (the tail)
        t = eb.RawTweet(tweet_id=1, author_id=2, created_ts=10,
                        text="a b c d hello world")
        index = eb.ingest(eb.init_index(cfg),
                          *eb.build_documents([t], cfg)[:5])
        kw = eb.parse_query('"hello world"')
        q = eb.SearchQuery(require_all=False, min_ts=jnp.int32(0),
                           max_ts=jnp.int32(100), **kw)
        ids, _ = eb.search(index, q, max_results=2)
        assert int(np.asarray(ids)[0]) == 1


class TestDemotionNegativeScores:
    def test_demotion_lowers_negative_scores_too(self):
        feats = np.zeros((2, len(eb.DOC_FEATURES)), np.float32)
        feats[:, eb.DOC_FEATURE_INDEX["text_score"]] = -2.0
        feats[1, eb.DOC_FEATURE_INDEX["is_reply"]] = 1.0
        w = np.zeros(len(eb.DOC_FEATURES), np.float32)
        w[eb.DOC_FEATURE_INDEX["text_score"]] = 1.0
        rel = eb.RelevanceParams(weights=jnp.asarray(w),
                                 reply_demotion=jnp.float32(0.5))
        got = np.asarray(eb.linear_score(jnp.asarray(feats), rel))
        assert got[1] < got[0]  # demoted reply ranks BELOW, not above
