"""Earlybird field-operator surface: from:/lang:/filter:/min_faves:
pushed through parse_query → match_mask → search → search_sharded.

≡ the reference query parser + query cache operators
(``src/java/com/twitter/search/earlybird/queryparser/``,
``common/query/``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from the_algorithm_tpu.core.mesh import MeshSpec, make_mesh
from the_algorithm_tpu.ops.sparse import PAD_ID
from the_algorithm_tpu.search import earlybird as eb

NOW = 1000


@pytest.fixture(scope="module")
def op_index():
    cfg = eb.EarlybirdConfig(capacity=16, max_tokens=8)
    tweets = [
        eb.RawTweet(tweet_id=700, author_id=1, created_ts=10,
                    text="tpu compilers hello", language="en",
                    fav_count=50, has_image=True),
        eb.RawTweet(tweet_id=701, author_id=2, created_ts=20,
                    text="tpu kernels hello https://t.co/x", language="ja",
                    fav_count=5, has_video=True),
        eb.RawTweet(tweet_id=702, author_id=1, created_ts=30,
                    text="mesh scan hello", language="en",
                    fav_count=200, is_reply=True),
        eb.RawTweet(tweet_id=703, author_id=3, created_ts=40,
                    text="hello sharding", language="es",
                    retweet_count=80),
        eb.RawTweet(tweet_id=704, author_id=2, created_ts=50,
                    text="hello retrieval", language="en",
                    is_retweet=True, fav_count=120),
    ]
    return eb.ingest(eb.init_index(cfg), *eb.build_documents(tweets, cfg)[:5])


def _ids(index, q, **kw):
    ids, _ = eb.search(index, q, max_results=8, **kw)
    return {int(i) for i in np.asarray(ids) if i != int(PAD_ID)}


def _q(text, **bq):
    return eb.build_query(text, max_ts=NOW, **bq)


class TestOperators:
    def test_from_author(self, op_index):
        assert _ids(op_index, _q("hello from:1")) == {700, 702}

    def test_from_follows_resolves_viewer_set(self, op_index):
        got = _ids(op_index, _q("hello from:follows", follows=[2, 3]))
        assert got == {701, 703, 704}

    def test_from_follows_unresolved_raises(self):
        with pytest.raises(ValueError):
            eb.build_query("hello from:follows")

    def test_from_follows_matches_bespoke_author_set_path(self, op_index):
        """The in-network leg in operator form ≡ the author-set query."""
        q_op = _q("from:follows", follows=[1, 2])
        bespoke = eb.SearchQuery(
            tokens=jnp.full((1,), int(PAD_ID), jnp.int32),
            require_all=True, min_ts=jnp.int32(0), max_ts=jnp.int32(NOW),
            followed_authors=jnp.asarray([1, 2], jnp.int32))
        assert _ids(op_index, q_op) == _ids(op_index, bespoke)

    def test_lang(self, op_index):
        assert _ids(op_index, _q("hello lang:en")) == {700, 702, 704}
        assert _ids(op_index, _q("hello lang:ja")) == {701}

    def test_filter_single_columns(self, op_index):
        assert _ids(op_index, _q("hello filter:images")) == {700}
        assert _ids(op_index, _q("hello filter:replies")) == {702}
        assert _ids(op_index, _q("hello filter:retweets")) == {704}
        assert _ids(op_index, _q("hello filter:links")) == {701}

    def test_filter_negation(self, op_index):
        assert _ids(op_index, _q("hello -filter:retweets")) == {
            700, 701, 702, 703}

    def test_filter_media_any_group(self, op_index):
        # image OR video
        assert _ids(op_index, _q("hello filter:media")) == {700, 701}
        assert _ids(op_index, _q("hello filter:videos")) == {701}

    def test_min_faves(self, op_index):
        assert _ids(op_index, _q("hello min_faves:100")) == {702, 704}
        assert _ids(op_index, _q("hello min_retweets:50")) == {703}

    def test_operator_combination(self, op_index):
        got = _ids(op_index, _q("hello lang:en min_faves:40 -filter:replies"))
        assert got == {700, 704}

    def test_time_and_id_windows(self, op_index):
        assert _ids(op_index, _q("hello since_time:25 until_time:45")) == {
            702, 703}
        assert _ids(op_index, _q("hello since_id:701 max_id:704")) == {
            702, 703}

    def test_plain_queries_unchanged(self, op_index):
        kw = eb.parse_query("hello -sharding")
        assert "from_follows" not in kw
        q = eb.SearchQuery(
            require_all=False, min_ts=jnp.int32(0), max_ts=jnp.int32(NOW),
            **kw)
        assert 703 not in _ids(op_index, q)


class TestCrossShardOperators:
    def test_sharded_operator_parity(self, op_index):
        """Operators push down through search_sharded unchanged."""
        mesh = make_mesh(MeshSpec(data=1, model=4), jax.devices()[:4])
        q = _q("hello lang:en min_faves:40", follows=None)
        want = _ids(op_index, q)
        ids, _ = eb.search_sharded(mesh, op_index, q, max_results=8)
        got = {int(i) for i in np.asarray(ids) if i != int(PAD_ID)}
        assert got == want

    def test_sharded_from_follows(self, op_index):
        mesh = make_mesh(MeshSpec(data=1, model=4), jax.devices()[:4])
        q = _q("from:follows", follows=[2])
        ids, _ = eb.search_sharded(mesh, op_index, q, max_results=8)
        got = {int(i) for i in np.asarray(ids) if i != int(PAD_ID)}
        assert got == {701, 704}
