"""Feature-subsystem tests: RSX engagement similarity, USS store, GFS
intersections, aggregation framework decayed counters."""

import jax.numpy as jnp
import numpy as np
import pytest

from the_algorithm_tpu.features import (
    aggregation as agg,
    graph_features as gfs,
    representation_scorer as rsx,
    user_signals as uss,
)
from the_algorithm_tpu.ops.sparse import PAD_ID, SparseEmbedding


def emb(d, K=8):
    ids = np.full(K, PAD_ID, np.int32)
    sc = np.zeros(K, np.float32)
    for i, (k, v) in enumerate(sorted(d.items(), key=lambda kv: -kv[1])[:K]):
        ids[i], sc[i] = k, v
    return ids, sc


class TestRepresentationScorer:
    def test_engagement_similarity(self):
        cand_ids, cand_sc = emb({1: 1.0})
        candidates = SparseEmbedding(
            jnp.asarray(cand_ids[None]), jnp.asarray(cand_sc[None])
        )
        # two fav engagements: one identical embedding (cos 1), one disjoint (cos 0)
        e1 = emb({1: 0.5})
        e2 = emb({2: 0.5})
        engagements = rsx.EngagementSet(
            embeddings=SparseEmbedding(
                jnp.asarray(np.stack([e1[0], e2[0]])),
                jnp.asarray(np.stack([e1[1], e2[1]])),
            ),
            signal_type=jnp.asarray([0, 0], jnp.int32),  # fav
            timestamp=jnp.asarray([1000, 1000], jnp.int32),
            valid=jnp.asarray([True, True]),
        )
        out = rsx.engagement_similarity_features(
            candidates, engagements, now=jnp.int32(2000)
        )
        assert float(out["fav_7d_max"][0]) == pytest.approx(1.0, abs=1e-6)
        assert float(out["fav_7d_min"][0]) == pytest.approx(0.0, abs=1e-6)
        assert float(out["fav_7d_avg"][0]) == pytest.approx(0.5, abs=1e-6)
        # no retweet signals → zeros
        assert float(out["retweet_7d_max"][0]) == 0.0

    def test_window_filtering(self):
        cand = SparseEmbedding(
            jnp.asarray(emb({1: 1.0})[0][None]), jnp.asarray(emb({1: 1.0})[1][None])
        )
        e = emb({1: 1.0})
        engagements = rsx.EngagementSet(
            embeddings=SparseEmbedding(jnp.asarray(e[0][None]), jnp.asarray(e[1][None])),
            signal_type=jnp.asarray([0], jnp.int32),
            timestamp=jnp.asarray([0], jnp.int32),  # 2 days old
            valid=jnp.asarray([True]),
        )
        now = jnp.int32(2 * 86400)
        out = rsx.engagement_similarity_features(cand, engagements, now)
        assert float(out["fav_7d_max"][0]) == pytest.approx(1.0)
        assert float(out["fav_1d_max"][0]) == 0.0  # outside 1d window

    def test_pair_score_store_kinds(self):
        a = SparseEmbedding(*map(jnp.asarray, emb({1: 0.6, 2: 0.4})))
        b = SparseEmbedding(*map(jnp.asarray, emb({1: 0.5, 3: 0.5})))
        dot = float(rsx.PairScoreStore("dot")(a, b))
        assert dot == pytest.approx(0.3, rel=1e-5)
        blended = rsx.weighted_sum_score(
            {"dot": jnp.asarray(dot), "cosine": jnp.asarray(0.5)},
            {"dot": 2.0, "cosine": 1.0},
        )
        assert float(blended) == pytest.approx(1.1, rel=1e-5)


class TestUserSignals:
    def test_record_and_fetch(self):
        store = uss.init_store(4, width=4)
        store = uss.record(
            store,
            np.array([1, 1, 1]),
            np.array([int(uss.SignalType.TWEET_FAVORITE)] * 3),
            np.array([100, 101, 102]),
            np.array([10, 20, 30]),
        )
        ids, ts, valid = uss.fetch(store, jnp.int32(1), uss.SignalType.TWEET_FAVORITE)
        got = [(int(i), int(t)) for i, t, v in zip(ids, ts, valid) if v]
        assert got == [(102, 30), (101, 20), (100, 10)]  # newest first

    def test_ring_buffer_eviction(self):
        store = uss.init_store(2, width=2)
        store = uss.record(
            store,
            np.zeros(3, int),
            np.array([int(uss.SignalType.RETWEET)] * 3),
            np.array([1, 2, 3]),
            np.array([1, 2, 3]),
        )
        ids, _, valid = uss.fetch(store, jnp.int32(0), uss.SignalType.RETWEET)
        assert [int(i) for i, v in zip(ids, valid) if v] == [3, 2]

    def test_min_timestamp_filter(self):
        store = uss.init_store(2, width=4)
        store = uss.record(
            store,
            np.array([0, 0]),
            np.array([int(uss.SignalType.TWEET_SHARE)] * 2),
            np.array([5, 6]),
            np.array([100, 200]),
        )
        ids, _, valid = uss.fetch(
            store, jnp.int32(0), uss.SignalType.TWEET_SHARE,
            min_timestamp=jnp.int32(150),
        )
        assert [int(i) for i, v in zip(ids, valid) if v] == [6]

    def test_fetch_engagement_tweets_concat(self):
        store = uss.init_store(2, width=2)
        store = uss.record(
            store,
            np.array([0, 0]),
            np.array([int(uss.SignalType.TWEET_FAVORITE), int(uss.SignalType.REPLY)]),
            np.array([11, 22]),
            np.array([1, 2]),
        )
        ids, ts, valid, types = uss.fetch_engagement_tweets(
            store, jnp.int32(0),
            [uss.SignalType.TWEET_FAVORITE, uss.SignalType.REPLY],
        )
        got = {(int(i), int(t)) for i, t, v in zip(ids, types, valid) if v}
        assert got == {(11, int(uss.SignalType.TWEET_FAVORITE)), (22, int(uss.SignalType.REPLY))}


class TestGraphFeatures:
    def _tables(self):
        U, D = 6, 4
        n = np.full((len(gfs.EdgeType), U, D), int(PAD_ID), np.int32)
        # user 0 follows 1, 2, 3
        n[int(gfs.EdgeType.FOLLOWING), 0, :3] = [1, 2, 3]
        # author 5 favorited-by 2, 3, 4
        n[int(gfs.EdgeType.FAVORITED_BY), 5, :3] = [2, 3, 4]
        # author 4 favorited-by 1
        n[int(gfs.EdgeType.FAVORITED_BY), 4, :1] = [1]
        return gfs.GraphTables(jnp.asarray(n))

    def test_intersection_counts(self):
        tables = self._tables()
        counts, degree = gfs.get_intersection(
            tables, jnp.int32(0), jnp.asarray([5, 4], jnp.int32),
            gfs.EdgeType.FOLLOWING, gfs.EdgeType.FAVORITED_BY,
        )
        assert [int(c) for c in counts] == [2, 1]  # {2,3} and {1}
        assert int(degree) == 3

    def test_feature_block_normalization(self):
        tables = self._tables()
        out = gfs.feature_block(tables, jnp.int32(0), jnp.asarray([5], jnp.int32))
        assert float(out["follows_who_favorited"][0]) == 2.0
        assert float(out["follows_who_favorited_normalized"][0]) == pytest.approx(2 / 3)


class TestAggregation:
    GROUP = agg.AggregateGroup(
        name="user_author",
        features=("fav_count",),
        labels=("any", "is_favorited"),
        metrics=("count", "sum", "max"),
        half_lives_s=(100.0,),
    )

    def test_output_names(self):
        names = self.GROUP.output_names()
        assert len(names) == self.GROUP.n_outputs == 6
        assert "user_author.fav_count.is_favorited.sum.100s" in names

    def test_update_and_read(self):
        store = agg.init_store(self.GROUP, capacity=8)
        rows = jnp.asarray([0, 0, 1], jnp.int32)
        feats = jnp.asarray([[2.0], [3.0], [10.0]])
        labels = jnp.asarray([[1.0, 1.0], [1.0, 0.0], [1.0, 1.0]])
        ts = jnp.asarray([10, 10, 10], jnp.int32)
        store = agg.update(self.GROUP, store, rows, feats, labels, ts)
        out = agg.read(self.GROUP, store, jnp.asarray([0, 1], jnp.int32), jnp.int32(10))
        names = self.GROUP.output_names()
        row0 = dict(zip(names, np.asarray(out[0])))
        assert row0["user_author.fav_count.any.count.100s"] == 2.0
        assert row0["user_author.fav_count.any.sum.100s"] == 5.0
        assert row0["user_author.fav_count.any.max.100s"] == 3.0
        assert row0["user_author.fav_count.is_favorited.sum.100s"] == 2.0

    def test_half_life_decay(self):
        store = agg.init_store(self.GROUP, capacity=4)
        rows = jnp.asarray([0], jnp.int32)
        store = agg.update(
            self.GROUP, store, rows, jnp.asarray([[4.0]]),
            jnp.asarray([[1.0, 0.0]]), jnp.asarray([0], jnp.int32),
        )
        # one half-life later: everything halves
        out = agg.read(self.GROUP, store, rows, jnp.int32(100))
        names = self.GROUP.output_names()
        row = dict(zip(names, np.asarray(out[0])))
        assert row["user_author.fav_count.any.sum.100s"] == pytest.approx(2.0)
        # update at t=100 decays old then adds
        store = agg.update(
            self.GROUP, store, rows, jnp.asarray([[4.0]]),
            jnp.asarray([[1.0, 0.0]]), jnp.asarray([100], jnp.int32),
        )
        out = agg.read(self.GROUP, store, rows, jnp.int32(100))
        row = dict(zip(names, np.asarray(out[0])))
        assert row["user_author.fav_count.any.sum.100s"] == pytest.approx(6.0)

    def test_key_resolver(self):
        kr = agg.KeyResolver(capacity=2)
        rows = kr.resolve([(1, 2), (3, 4), (1, 2)])
        assert list(rows) == [0, 1, 0]
        with pytest.raises(KeyError):
            kr.resolve([(5, 6)])


class TestGfsSharded:
    """GFS worker fan-out on the mesh: partial intersections psum to exact
    single-device parity (WorkerGetIntersectionHandler.scala:18-31)."""

    @pytest.mark.slow
    def test_sharded_parity_with_single_device(self, mesh8):
        import numpy as np

        from the_algorithm_tpu.features import graph_features as gf
        from the_algorithm_tpu.ops.sparse import PAD_ID

        rng = np.random.default_rng(3)
        E, U, D = len(gf.EdgeType), 32, 12
        nbrs = np.full((E, U, D), int(PAD_ID), np.int32)
        for e in range(E):
            for u in range(U):
                deg = int(rng.integers(1, D))
                nbrs[e, u, :deg] = np.sort(
                    rng.choice(U, size=deg, replace=False))
        tables = gf.GraphTables(jnp.asarray(nbrs))
        n_shards = mesh8.shape["model"]
        sharded = gf.shard_tables(tables, n_shards)
        uid = jnp.int32(5)
        cands = jnp.asarray(rng.integers(0, U, 16), jnp.int32)
        want = gf.feature_block(tables, uid, cands)
        got = gf.feature_block_sharded(mesh8, sharded, uid, cands)
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(want[k]), rtol=1e-6,
                err_msg=k)

    def test_shard_tables_partitions_ids(self):
        import numpy as np

        from the_algorithm_tpu.features import graph_features as gf
        from the_algorithm_tpu.ops.sparse import PAD_ID

        nbrs = np.full((1, 2, 6), int(PAD_ID), np.int32)
        nbrs[0, 0, :4] = [1, 2, 7, 8]
        tables = gf.GraphTables(jnp.asarray(nbrs))
        sharded = np.asarray(gf.shard_tables(tables, 2))
        row0 = [x for x in sharded[0, 0, 0] if x != int(PAD_ID)]
        row1 = [x for x in sharded[1, 0, 0] if x != int(PAD_ID)]
        assert row0 == [2, 8] and row1 == [1, 7]  # bucket = id % 2, sorted


class TestSetSemanticsMetrics:
    """latest / last_reset metrics (r4): replace-semantics with a batched
    winner-per-(row,label) scatter, no decay, dict oracle."""

    def _group(self):
        from the_algorithm_tpu.features import aggregation as agg

        return agg.AggregateGroup(
            name="g", features=("v",), labels=("fav", "reply"),
            metrics=("sum", "latest", "last_reset"),
            half_lives_s=(86400.0,),
        )

    def test_latest_and_last_reset_match_oracle(self):
        import numpy as np

        from the_algorithm_tpu.features import aggregation as agg

        g = self._group()
        store = agg.init_store(g, capacity=4)
        rng = np.random.default_rng(0)
        oracle = {}  # (row, label, metric) -> value

        for batch in range(4):
            B = 8
            rows = rng.integers(0, 4, B).astype(np.int32)
            fv = rng.uniform(-2, 2, (B, 1)).astype(np.float32)
            lv = (rng.random((B, 2)) < 0.6).astype(np.float32)
            ts = np.full(B, 1000 * (batch + 1), np.int32)
            store = agg.update(
                g, store, jnp.asarray(rows), jnp.asarray(fv),
                jnp.asarray(lv), jnp.asarray(ts))
            for i in range(B):  # event order defines "latest"
                for li in range(2):
                    if lv[i, li]:
                        oracle[(int(rows[i]), li, "latest")] = float(fv[i, 0])
                        oracle[(int(rows[i]), li, "last_reset")] = float(
                            ts[i])

        col = agg._layout(g)
        vals = np.asarray(agg.read(
            g, store, jnp.arange(4, dtype=jnp.int32), jnp.int32(9000)))
        for row in range(4):
            for li in range(2):
                want_latest = oracle.get((row, li, "latest"), 0.0)
                want_reset = oracle.get((row, li, "last_reset"), 0.0)
                np.testing.assert_allclose(
                    vals[row, col(0, li, 1, 0)], want_latest, atol=1e-5,
                    err_msg=f"latest row={row} label={li}")
                np.testing.assert_allclose(
                    vals[row, col(0, li, 2, 0)], want_reset, atol=1e-5,
                    err_msg=f"last_reset row={row} label={li}")

    def test_latest_is_undecayed_but_sum_decays(self):
        import numpy as np

        from the_algorithm_tpu.features import aggregation as agg

        g = self._group()
        store = agg.init_store(g, capacity=2)
        store = agg.update(
            g, store, jnp.asarray([0], jnp.int32),
            jnp.asarray([[3.0]], jnp.float32),
            jnp.asarray([[1.0, 0.0]], jnp.float32),
            jnp.asarray([0], jnp.int32))
        col = agg._layout(g)
        # read one half-life later: sum halves, latest holds
        vals = np.asarray(agg.read(
            g, store, jnp.asarray([0], jnp.int32), jnp.int32(86400)))
        np.testing.assert_allclose(vals[0, col(0, 0, 0, 0)], 1.5, atol=1e-5)
        np.testing.assert_allclose(vals[0, col(0, 0, 1, 0)], 3.0, atol=1e-5)

    def test_smaller_new_latest_replaces(self):
        import numpy as np

        from the_algorithm_tpu.features import aggregation as agg

        g = self._group()
        store = agg.init_store(g, capacity=2)
        for v, ts in ((5.0, 100), (2.0, 200)):  # latest DECREASES
            store = agg.update(
                g, store, jnp.asarray([0], jnp.int32),
                jnp.asarray([[v]], jnp.float32),
                jnp.asarray([[1.0, 0.0]], jnp.float32),
                jnp.asarray([ts], jnp.int32))
        col = agg._layout(g)
        vals = np.asarray(agg.read(
            g, store, jnp.asarray([0], jnp.int32), jnp.int32(200)))
        np.testing.assert_allclose(vals[0, col(0, 0, 1, 0)], 2.0, atol=1e-5)
