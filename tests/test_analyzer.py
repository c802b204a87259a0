"""Text-analysis chain tests: normalization, token classes, CJK, stemming,
URL/card resolution, and the ≥100-field doc schema (r4 earlybird text)."""

import numpy as np

from the_algorithm_tpu.ops.sparse import PAD_ID
from the_algorithm_tpu.search import analyzer as anl
from the_algorithm_tpu.search import earlybird as eb


def classes_of(text, **kw):
    return [(t.cls, t.text) for t in anl.analyze(text, **kw)]


class TestAnalyzer:
    def test_token_classes_preserved(self):
        toks = anl.analyze("Check #JAX and @bigbird plus $TSLA now")
        by_cls = {}
        for t in toks:
            by_cls.setdefault(t.cls, []).append(t.text)
        assert by_cls[anl.TokenClass.HASHTAG] == ["jax"]
        assert by_cls[anl.TokenClass.MENTION] == ["bigbird"]
        assert by_cls[anl.TokenClass.CASHTAG] == ["tsla"]
        assert "check" in by_cls[anl.TokenClass.WORD]

    def test_hashtag_differs_from_bare_word(self):
        h = anl.term_id(anl.Token("jax", anl.TokenClass.HASHTAG))
        w = anl.term_id(anl.Token("jax", anl.TokenClass.WORD))
        assert h != w

    def test_unicode_normalization_strips_accents(self):
        a = anl.analyze("Café CRÈME")
        texts = [t.text for t in a]
        assert texts == ["cafe", "creme"]

    def test_nfkc_folds_fullwidth(self):
        texts = [t.text for t in anl.analyze("ＴＰＵ ｆａｓｔ")]
        assert texts == ["tpu", "fast"]

    def test_url_emits_full_and_domain(self):
        toks = anl.analyze("see https://Example.com/a/b?q=1 now")
        urls = [t.text for t in toks if t.cls is anl.TokenClass.URL]
        assert "example.com" in urls
        assert any(u.startswith("https://example.com/a/b") for u in urls)

    def test_cjk_bigrams(self):
        toks = anl.analyze("東京タワー nights")
        bgs = [t.text for t in toks if t.cls is anl.TokenClass.CJK_BIGRAM]
        # overlapping bigrams over the CJK run
        assert "東京" in bgs and "京タ" in bgs and "タワ" in bgs and "ワー" in bgs
        words = [t.text for t in toks if t.cls is anl.TokenClass.WORD]
        assert words == ["nights"]

    def test_korean_and_mixed_script(self):
        toks = anl.analyze("안녕하세요 world")
        bgs = [t.text for t in toks if t.cls is anl.TokenClass.CJK_BIGRAM]
        assert "안녕" in bgs
        assert [t.text for t in toks if t.cls is anl.TokenClass.WORD] == [
            "world"]

    def test_stemming_optional_and_distinct_class(self):
        plain = anl.analyze("running dogs")
        assert all(t.cls is not anl.TokenClass.STEM for t in plain)
        stemmed = anl.analyze("running dogs", stemming=True)
        stems = [t.text for t in stemmed if t.cls is anl.TokenClass.STEM]
        assert "runn" in stems and "dog" in stems
        # exact surface form still indexed
        words = [t.text for t in stemmed if t.cls is anl.TokenClass.WORD]
        assert "running" in words and "dogs" in words

    def test_stem_rules(self):
        assert anl.stem("studies") == "study"
        assert anl.stem("flies") == "fly"
        assert anl.stem("walked") == "walk"
        assert anl.stem("cats") == "cat"
        assert anl.stem("was") == "was"  # stem must stay >= 3 chars

    def test_query_and_doc_tokenize_identically(self):
        doc = eb.tokenize("TPU melts #JAX", 8)
        q = eb.tokenize("#JAX", 8)
        assert q[0] in doc.tolist()
        assert int(q[0]) != int(PAD_ID)

    def test_extract_entities(self):
        e = anl.extract_entities(
            "RT @a check #b #c https://t.co/xyz and www.news.com/x $D")
        assert e["hashtags"] == ["b", "c"]
        assert e["mentions"] == ["a"]
        assert e["cashtags"] == ["d"]
        assert "t.co" in e["domains"] and "news.com" in e["domains"]


class TestSchemaBreadthAndResolution:
    def test_doc_schema_at_least_100_fields(self):
        assert len(eb.DOC_FEATURES) >= 100
        assert len(set(eb.DOC_FEATURES)) == len(eb.DOC_FEATURES)

    def test_url_card_resolution_fills_fields(self):
        cfg = eb.EarlybirdConfig(capacity=8, max_tokens=8)
        t = eb.RawTweet(
            tweet_id=9, author_id=1, created_ts=100,
            text="Breaking: https://bit.ly/x and 東京 #news $ABC 😀 WOW",
        )
        _, _, _, feats, _, _ = eb.build_documents(
            [t], cfg, now=200,
            url_reputation={"bit.ly": 0.2},
            card_store={9: "summary"},
        )
        f = np.asarray(feats)[0]
        ix = eb.DOC_FEATURE_INDEX
        assert f[ix["num_urls"]] == 1.0
        assert f[ix["has_shortened_url"]] == 1.0
        assert f[ix["url_domain_rep"]] == np.float32(0.2)
        assert f[ix["has_summary_card"]] == 1.0
        assert f[ix["has_poll_card"]] == 0.0
        assert f[ix["num_cashtags"]] == 1.0
        assert f[ix["num_cjk_tokens"]] >= 1.0
        assert f[ix["emoji_count"]] >= 1.0
        assert f[ix["caps_ratio"]] > 0.0
        assert f[ix["token_entropy"]] > 0.0

    def test_ingester_passes_resolvers(self):
        from the_algorithm_tpu.search.ingester import EarlybirdIngester

        ing = EarlybirdIngester(
            eb.EarlybirdConfig(capacity=8, max_tokens=8),
            url_reputation={"spam.biz": 0.05},
            card_store={7: "poll"},
        )
        ing.ingest_tweets([eb.RawTweet(
            tweet_id=7, author_id=1, created_ts=10,
            text="vote! https://spam.biz/p")], now=20)
        row = np.asarray(ing.index.features)[0]
        ix = eb.DOC_FEATURE_INDEX
        assert row[ix["has_poll_card"]] == 1.0
        assert row[ix["url_domain_rep"]] == np.float32(0.05)

    def test_bm25_search_with_classed_tokens(self):
        """End to end: hashtag query matches only hashtag docs."""
        cfg = eb.EarlybirdConfig(capacity=16, max_tokens=8)
        idx = eb.init_index(cfg)
        tweets = [
            eb.RawTweet(tweet_id=1, author_id=1, created_ts=50,
                        text="i love #jax so much"),
            eb.RawTweet(tweet_id=2, author_id=1, created_ts=50,
                        text="jax is a place in florida"),
        ]
        idx = eb.ingest(idx, *eb.build_documents(tweets, cfg)[:5])
        import jax.numpy as jnp

        q = eb.SearchQuery(
            tokens=jnp.asarray(eb.tokenize("#jax", 8)), require_all=True,
            min_ts=jnp.int32(0), max_ts=jnp.int32(100))
        ids, scores = eb.search(idx, q, max_results=4)
        found = [int(i) for i in np.asarray(ids) if int(i) != int(PAD_ID)]
        assert found == [1]  # the bare-word doc does NOT match the hashtag
