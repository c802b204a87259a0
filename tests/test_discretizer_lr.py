"""Discretizer calibrate/apply and hashed sparse LR op tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from the_algorithm_tpu.ops import discretizer as disc
from the_algorithm_tpu.ops import hashed_lr


class TestPercentileBins:
    def test_fit_equal_mass(self):
        rng = np.random.default_rng(0)
        samples = {7: rng.normal(size=10000).astype(np.float32)}
        bins = disc.fit_percentile_bins(samples, n_bins=4)
        assert bins.n_bins == 4
        # quartile boundaries of a standard normal
        np.testing.assert_allclose(
            bins.bin_vals[0], [-0.6745, 0.0, 0.6745], atol=0.05
        )

    def test_bucketize_consistent_np_jnp(self):
        rng = np.random.default_rng(1)
        samples = {1: rng.uniform(0, 1, 5000).astype(np.float32),
                   2: rng.normal(size=5000).astype(np.float32)}
        bins = disc.fit_percentile_bins(samples, n_bins=8)
        rows = np.array([0, 0, 1, 1, 0, 1])
        vals = np.array([0.1, 0.9, -2.0, 2.0, 0.5, 0.0], np.float32)
        got_np = disc.bucketize_np(bins, rows, vals)
        got_jnp = np.asarray(
            disc.bucketize_jnp(jnp.asarray(bins.bin_vals), jnp.asarray(rows), jnp.asarray(vals))
        )
        np.testing.assert_array_equal(got_np, got_jnp)
        assert got_np.min() >= 0 and got_np.max() <= 7

    def test_lower_bound_semantics(self):
        # value exactly on a boundary goes to the boundary's bin (std::lower_bound)
        bins = disc.PercentileBins(
            np.array([5], np.int64), np.array([[1.0, 2.0, 3.0]], np.float32)
        )
        got = disc.bucketize_np(bins, np.array([0, 0, 0, 0]), np.array([0.5, 1.0, 2.5, 9.0], np.float32))
        np.testing.assert_array_equal(got, [0, 0, 2, 3])
        got_j = np.asarray(disc.bucketize_jnp(
            jnp.asarray(bins.bin_vals), jnp.asarray([0, 0, 0, 0]), jnp.asarray([0.5, 1.0, 2.5, 9.0])
        ))
        np.testing.assert_array_equal(got_j, [0, 0, 2, 3])


class TestHashingDiscretizer:
    def test_np_jnp_parity(self):
        rng = np.random.default_rng(2)
        fids = np.array([101, 202, 303], np.int64)
        samples = {int(f): rng.normal(size=2000).astype(np.float32) for f in fids}
        bins = disc.fit_percentile_bins(samples, n_bins=16)
        hd = disc.HashingDiscretizer(bins, output_bits=12)
        feats = np.array([101, 303, 202, 101], np.int64)
        vals = np.array([0.3, -1.0, 0.0, 2.0], np.float32)
        got_np = hd.transform_np(feats, vals)
        rows = np.array([hd.row_index()[int(f)] for f in feats])
        got_jnp = np.asarray(
            hd.transform_jnp(jnp.asarray(rows), jnp.asarray(feats.astype(np.int32)), jnp.asarray(vals))
        )
        np.testing.assert_array_equal(got_np, got_jnp)
        assert got_np.max() < 2**12


class TestHashedLR:
    def test_sparse_logits_matches_dense(self):
        rng = np.random.default_rng(3)
        B, W, N = 4, 6, 64
        idx = rng.integers(0, N, size=(B, W)).astype(np.int32)
        vals = rng.normal(size=(B, W)).astype(np.float32)
        mask = rng.uniform(size=(B, W)) > 0.3
        w = rng.normal(size=(N,)).astype(np.float32)
        batch = hashed_lr.SparseBatch(
            jnp.asarray(idx), jnp.asarray(vals), jnp.asarray(mask)
        )
        got = np.asarray(hashed_lr.sparse_logits(batch, jnp.asarray(w), bias=jnp.float32(0.5)))
        want = np.array(
            [
                0.5 + sum(w[idx[b, j]] * vals[b, j] for j in range(W) if mask[b, j])
                for b in range(B)
            ]
        )
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_multi_output(self):
        rng = np.random.default_rng(4)
        B, W, N, O = 2, 3, 32, 5
        idx = rng.integers(0, N, size=(B, W)).astype(np.int32)
        vals = np.ones((B, W), np.float32)
        mask = np.ones((B, W), bool)
        w = rng.normal(size=(N, O)).astype(np.float32)
        batch = hashed_lr.SparseBatch(jnp.asarray(idx), jnp.asarray(vals), jnp.asarray(mask))
        got = np.asarray(hashed_lr.sparse_logits(batch, jnp.asarray(w)))
        assert got.shape == (B, O)
        want = w[idx].sum(axis=1)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_gradient_flows(self):
        B, W, N = 2, 3, 16
        idx = jnp.asarray(np.array([[0, 1, 2], [3, 3, 4]], np.int32))
        vals = jnp.ones((B, W), jnp.float32)
        mask = jnp.ones((B, W), bool)
        batch = hashed_lr.SparseBatch(idx, vals, mask)

        def loss(w):
            return jnp.sum(hashed_lr.sparse_logits(batch, w) ** 2)

        g = jax.grad(loss)(jnp.ones((N,), jnp.float32))
        # index 3 appears twice in example 1 → logit=…; gradient accumulates
        assert float(g[3]) != 0.0
        assert float(g[15]) == 0.0  # untouched bucket
