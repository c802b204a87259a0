"""Earlybird flush/load, feature updates, and query-cache tests."""

import jax.numpy as jnp
import numpy as np

from the_algorithm_tpu.ops.sparse import PAD_ID
from the_algorithm_tpu.search import earlybird as eb
from the_algorithm_tpu.search import persistence as pers


def make_index(n=8, cap=16):
    cfg = eb.EarlybirdConfig(capacity=cap, max_tokens=4)
    index = eb.init_index(cfg)
    B = n
    tokens = np.full((B, 4), int(PAD_ID), np.int32)
    tokens[:, 0] = np.arange(B) + 100
    index = eb.ingest(
        index,
        jnp.asarray(tokens),
        jnp.arange(B, dtype=jnp.int32),  # authors
        jnp.arange(B, dtype=jnp.int32) + 1000,  # ts
        jnp.zeros((B, cfg.num_features), jnp.float32),
        jnp.arange(B, dtype=jnp.int32) + 500,  # tweet ids
    )
    return cfg, index


class TestFlushLoad:
    def test_roundtrip(self, tmp_path):
        _, index = make_index()
        path = str(tmp_path / "seg.npz")
        pers.flush_index(index, path, log_offset=8)
        loaded, offset = pers.load_index(path)
        assert offset == 8
        np.testing.assert_array_equal(
            np.asarray(loaded.tweet_ids), np.asarray(index.tweet_ids)
        )
        assert int(loaded.write_pos) == int(index.write_pos)

    def test_replay_catchup(self, tmp_path):
        cfg, index = make_index()
        path = str(tmp_path / "seg.npz")
        pers.flush_index(index, path, log_offset=8)

        def replay(offset):
            assert offset == 8
            B = 2
            tokens = np.full((B, 4), int(PAD_ID), np.int32)
            return (
                tokens,
                np.asarray([77, 78], np.int32),
                np.asarray([2000, 2001], np.int32),
                np.zeros((B, cfg.num_features), np.float32),
                np.asarray([900, 901], np.int32),
                10,
            )

        loaded, offset = pers.load_index(path, replay=replay)
        assert offset == 10
        ids = np.asarray(loaded.tweet_ids).tolist()
        assert 900 in ids and 901 in ids


class TestFeatureUpdates:
    def test_set_and_miss_dropped(self):
        _, index = make_index()
        updated = pers.apply_feature_updates(
            index,
            jnp.asarray([502, 9999], jnp.int32),  # second id not in ring
            jnp.asarray([0, 0], jnp.int32),
            jnp.asarray([42.0, 13.0]),
        )
        feats = np.asarray(updated.features)
        ids = np.asarray(index.tweet_ids)
        slot = int(np.flatnonzero(ids == 502)[0])
        assert feats[slot, 0] == 42.0
        # nothing else touched
        assert (feats.sum()) == 42.0

    def test_increment(self):
        _, index = make_index()
        for _ in range(3):
            index = pers.increment_feature(
                index,
                jnp.asarray([503], jnp.int32),
                jnp.asarray([1], jnp.int32),
                jnp.asarray([1.0]),
            )
        feats = np.asarray(index.features)
        slot = int(np.flatnonzero(np.asarray(index.tweet_ids) == 503)[0])
        assert feats[slot, 1] == 3.0

    def test_updates_visible_to_scoring(self):
        _, index = make_index()
        index = pers.apply_feature_updates(
            index,
            jnp.asarray([500], jnp.int32),
            jnp.asarray([0], jnp.int32),
            jnp.asarray([100.0]),
        )
        scores = eb.linear_score(index.features, eb.default_relevance_params())
        slot = int(np.flatnonzero(np.asarray(index.tweet_ids) == 500)[0])
        assert float(scores[slot]) > 0


class TestQueryCache:
    def test_hit_then_ttl_expiry(self):
        t = [0.0]
        cache = pers.QueryCache(ttl_s=5.0, clock=lambda: t[0])
        calls = []
        fn = lambda: calls.append(1) or "result"
        assert cache.get_or_compute(("q", 1), fn) == "result"
        assert cache.get_or_compute(("q", 1), fn) == "result"
        assert len(calls) == 1 and cache.hits == 1
        t[0] = 6.0
        cache.get_or_compute(("q", 1), fn)
        assert len(calls) == 2

    def test_write_generation_invalidates(self):
        cache = pers.QueryCache(ttl_s=100.0, max_stale_writes=1)
        calls = []
        fn = lambda: calls.append(1) or "r"
        cache.get_or_compute(("q",), fn)
        cache.on_write()  # within staleness budget
        cache.get_or_compute(("q",), fn)
        assert len(calls) == 1
        cache.on_write()  # now 2 writes past entry
        cache.get_or_compute(("q",), fn)
        assert len(calls) == 2

    def test_lru_bound(self):
        cache = pers.QueryCache(max_items=2)
        for i in range(4):
            cache.get_or_compute(("q", i), lambda i=i: i)
        assert len(cache._cache) == 2
