"""Core runtime tests: mesh, partition rules, config, hashing, metrics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from the_algorithm_tpu.core import config as cfg
from the_algorithm_tpu.core import hashing, metrics
from the_algorithm_tpu.core.mesh import MeshSpec, make_mesh
from the_algorithm_tpu.core.partition import (
    match_partition_rules,
    shard_tree,
    tree_path_names,
)


class TestMesh:
    def test_make_mesh_shapes(self):
        m = make_mesh(MeshSpec(data=4, model=2))
        assert m.devices.shape == (4, 2)
        assert m.axis_names == ("data", "model")

    def test_infer_data_axis(self):
        m = make_mesh(MeshSpec(data=-1, model=2))
        assert m.devices.shape == (4, 2)

    def test_bad_shape_raises(self):
        with pytest.raises(ValueError):
            make_mesh(MeshSpec(data=3, model=3))


class TestPartitionRules:
    def test_match_rules(self):
        params = {
            "embedding": {"table": np.zeros((16, 8))},
            "dense": {"kernel": np.zeros((8, 4)), "bias": np.zeros((4,))},
            "scale": np.zeros(()),
        }
        rules = [
            (r"embedding/table", P("model", None)),
            (r"kernel", P(None, "model")),
            (r".*", P()),
        ]
        specs = match_partition_rules(rules, params)
        assert specs["embedding"]["table"] == P("model", None)
        assert specs["dense"]["kernel"] == P(None, "model")
        assert specs["dense"]["bias"] == P()
        assert specs["scale"] == P()  # scalars never partitioned

    def test_missing_rule_raises(self):
        with pytest.raises(ValueError):
            match_partition_rules([], {"w": np.zeros((4, 4))})

    def test_tree_path_names(self):
        names = tree_path_names({"a": {"b": 1}, "c": [2, 3]})
        assert names["a"]["b"] == "a/b"
        assert names["c"][0] == "c/0"

    def test_shard_tree_places_on_mesh(self, mesh8):
        tree = {"table": np.arange(64, dtype=np.float32).reshape(16, 4)}
        sharded = shard_tree(tree, mesh8, {"table": P("model", None)})
        assert sharded["table"].sharding.spec == P("model", None)
        np.testing.assert_array_equal(np.asarray(sharded["table"]), tree["table"])


class TestConfig:
    MAX_CANDS = cfg.Param("max_candidates", 200, lo=1, hi=1000)

    def test_default(self):
        assert cfg.Params()(self.MAX_CANDS) == 200

    def test_override_and_clamp(self):
        p = cfg.Params({self.MAX_CANDS: 5000})
        assert p(self.MAX_CANDS) == 1000  # clamped to hi

    def test_param_scope(self):
        with cfg.param_scope({self.MAX_CANDS: 7}):
            assert cfg.Params()(self.MAX_CANDS) == 7
        assert cfg.Params()(self.MAX_CANDS) == 200

    def test_explicit_beats_ambient(self):
        with cfg.param_scope({self.MAX_CANDS: 7}):
            assert cfg.Params({self.MAX_CANDS: 9})(self.MAX_CANDS) == 9


class TestMurmur3:
    def test_known_vectors(self):
        # Public MurmurHash3_x64_128 test vectors (seed 0).
        h1, h2 = hashing.murmur3_x64_128(b"")
        assert (h1, h2) == (0, 0)
        h1, _ = hashing.murmur3_x64_128(b"hello")
        assert h1 == 0xCBD8A7B341BD9B02
        h1, _ = hashing.murmur3_x64_128(b"hello, world")
        assert h1 == 0x342FAC623A5EBC8E
        h1, _ = hashing.murmur3_x64_128(b"The quick brown fox jumps over the lazy dog.")
        assert h1 == 0xCD99481F9EE902C9

    def test_feature_id_deterministic(self):
        a = hashing.feature_id("recap.engagement.is_favorited")
        b = hashing.feature_id("recap.engagement.is_favorited")
        assert a == b
        assert a != hashing.feature_id("recap.engagement.is_replied")

    def test_feature_id_hash_split(self):
        # 'name#key' uses two-stage hashing, differing from the flat hash
        assert hashing.feature_id("a#b") != hashing.feature_id("a_b")


class TestMultiplicativeHash:
    def _reference_hash(self, fid, bucket, bits):
        # direct transcription of the uint64 C++ semantics for cross-checking
        M = (1 << 64) - 1
        c = 2654435761
        h = (fid * c) & M
        h = (h + bucket) & M
        h = (h * c) & M
        h >>= 32 - bits
        return h & ((1 << bits) - 1)

    def test_matches_uint64_semantics(self):
        rng = np.random.default_rng(0)
        fids = rng.integers(0, 2**63 - 1, size=256, dtype=np.int64)
        buckets = rng.integers(0, 100, size=256, dtype=np.int64)
        for bits in (10, 16, 22):
            got = hashing.multiplicative_hash_np(fids, buckets, bits)
            want = np.array(
                [
                    self._reference_hash(int(f) & ((1 << 64) - 1), int(b), bits)
                    for f, b in zip(fids, buckets)
                ],
                dtype=np.int64,
            )
            np.testing.assert_array_equal(got.astype(np.int64), want)

    def test_jnp_matches_np(self):
        rng = np.random.default_rng(1)
        fids = rng.integers(0, 2**31 - 1, size=128, dtype=np.int64)
        buckets = rng.integers(0, 50, size=128, dtype=np.int64)
        got_np = hashing.multiplicative_hash_np(fids, buckets, 18)
        got_jnp = np.asarray(
            hashing.multiplicative_hash_jnp(jnp.asarray(fids), jnp.asarray(buckets), 18)
        )
        np.testing.assert_array_equal(got_np, got_jnp)

    def test_range(self):
        fids = np.arange(1000, dtype=np.int64)
        out = hashing.multiplicative_hash_np(fids, np.zeros(1000, np.int64), 8)
        assert out.min() >= 0 and out.max() < 256
        # spread: sequential ids land in many distinct buckets (the hash is
        # affine mod 2^32, so perfect uniformity isn't expected — parity with
        # the reference function matters more than its statistical quality)
        assert len(np.unique(out)) > 64


class TestMetrics:
    def test_counters_and_scope(self):
        s = metrics.StatsReceiver()
        s.counter("requests")
        child = s.scope("sann")
        child.counter("requests", 2)
        assert s.counters() == {"requests": 1, "sann/requests": 2}

    def test_stats_percentiles(self):
        s = metrics.StatsReceiver()
        for v in range(100):
            s.stat("latency", float(v))
        summary = s.stat_summary("latency")
        assert summary["count"] == 100
        assert 45 <= summary["p50"] <= 55

    def test_prometheus_export(self):
        s = metrics.StatsReceiver()
        s.counter("reqs")
        s.gauge("qf", 0.5)
        text = s.export_prometheus()
        assert "reqs_total 1" in text
        assert "qf 0.5" in text
