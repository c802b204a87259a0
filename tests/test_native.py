"""Native C++ data plane: builds, and is bit-identical to the Python parity
implementations (murmur3, feature ids, multiplicative hash); TRec codec
round-trips; densify + hash-discretize agree with the Python ops."""

import numpy as np
import pytest

from the_algorithm_tpu import native
from the_algorithm_tpu.core import hashing as pyhash
from the_algorithm_tpu.ops import discretizer as disc


@pytest.fixture(scope="module", autouse=True)
def built():
    native.lib()  # triggers g++ build on first use


class TestHashParity:
    def test_murmur3_matches_python(self):
        for data in [b"", b"a", b"hello", b"hello, world", b"x" * 33, bytes(range(256))]:
            assert native.murmur3_x64_128(data) == pyhash.murmur3_x64_128(data)

    def test_feature_id_matches_python(self):
        for name in [
            "recap.engagement.is_favorited",
            "a#b",
            "encoded_tweet_features.favorite_count",
            "meta#user_id",
        ]:
            assert native.feature_id(name) == pyhash.feature_id(name), name

    def test_multiplicative_hash_matches_python(self):
        rng = np.random.default_rng(0)
        fids = rng.integers(0, 2**63 - 1, 512, dtype=np.int64)
        buckets = rng.integers(0, 64, 512, dtype=np.int64)
        for bits in (8, 16, 20):
            got = native.multiplicative_hash(fids, buckets, bits)
            want = pyhash.multiplicative_hash_np(fids, buckets, bits)
            np.testing.assert_array_equal(got, want)


class TestTRecCodec:
    RECORDS = [
        ({1: 0.5, 99: -2.0}, {1000: 1.0}),
        ({}, {}),
        ({2**62: 3.25}, {1000: 0.0, 1001: 1.0}),
    ]

    def test_round_trip(self):
        blob = native.encode_block(self.RECORDS)
        got = native.decode_block(blob)
        assert got == self.RECORDS

    def test_corrupt_block_raises(self):
        with pytest.raises(ValueError):
            native.decode_block(b"garbagegarbage")

    def test_densify_matches_dicts(self):
        vocab = np.array(sorted([1, 99, 2**62]), np.int64)
        blob = native.encode_block(self.RECORDS)
        values, mask = native.densify(blob, vocab)
        assert values.shape == (3, 3)
        for r, (cont, _) in enumerate(self.RECORDS):
            for ci, fid in enumerate(vocab):
                if int(fid) in cont:
                    assert mask[r, ci]
                    assert values[r, ci] == pytest.approx(cont[int(fid)])
                else:
                    assert not mask[r, ci]


class TestHashDiscretizeParity:
    def test_matches_python_transform(self):
        rng = np.random.default_rng(1)
        F, B = 6, 8
        fids = np.sort(rng.choice(2**40, F, replace=False).astype(np.int64))
        samples = {int(f): rng.normal(size=1000).astype(np.float32) for f in fids}
        bins = disc.fit_percentile_bins(samples, n_bins=B)
        hd = disc.HashingDiscretizer(bins, output_bits=14)

        records = []
        for _ in range(5):
            cont = {int(f): float(rng.normal()) for f in fids}
            records.append((cont, {}))
        blob = native.encode_block(records)
        idx, vals, mask = native.hash_discretize(
            blob, bins.feature_ids, bins.bin_vals, 14, max_width=F
        )
        # python path on the same data
        for r, (cont, _) in enumerate(records):
            f_arr = np.array(list(cont.keys()), np.int64)
            v_arr = np.array(list(cont.values()), np.float32)
            want = set(hd.transform_np(f_arr, v_arr).tolist())
            got = set(idx[r][mask[r]].tolist())
            assert got == want

    def test_unknown_features_skipped(self):
        vocab = np.array([10], np.int64)
        bins = np.zeros((1, 3), np.float32)
        blob = native.encode_block([({999: 1.0}, {})])
        idx, vals, mask = native.hash_discretize(blob, vocab, bins, 10, 4)
        assert not mask.any()
