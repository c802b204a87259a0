"""Isotonic / MDL calibration op tests (twml calibrator parity patterns)."""

import jax
import jax.numpy as jnp
import numpy as np

from the_algorithm_tpu.ops.calibration import (
    IsotonicFit,
    MDLBins,
    apply_isotonic,
    fit_isotonic,
    fit_mdl,
    mdl_transform,
    sparse_max_norm,
    stitch,
)


class TestIsotonic:
    def test_monotone_and_interpolating(self):
        rng = np.random.default_rng(0)
        x = rng.uniform(0, 1, 500)
        y = (x + 0.2 * rng.normal(size=500) > 0.5).astype(float)
        fit = fit_isotonic(x, y)
        assert (np.diff(fit.ys) >= -1e-6).all()
        grid = jnp.linspace(0, 1, 101)
        out = np.asarray(apply_isotonic(fit, grid))
        assert (np.diff(out) >= -1e-6).all()
        assert out.min() >= 0 - 1e-6 and out.max() <= 1 + 1e-6

    def test_already_monotone_is_identity_on_knots(self):
        x = np.asarray([0.0, 1.0, 2.0, 3.0])
        y = np.asarray([0.1, 0.2, 0.6, 0.9])
        fit = fit_isotonic(x, y)
        np.testing.assert_allclose(fit.ys, y, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(apply_isotonic(fit, jnp.asarray(x))), y, rtol=1e-6
        )

    def test_pav_pools_violators_to_weighted_mean(self):
        # classic: [1, 3, 2] pools the last two to 2.5
        fit = fit_isotonic(np.asarray([0.0, 1.0, 2.0]), np.asarray([1.0, 3.0, 2.0]))
        np.testing.assert_allclose(fit.ys, [1.0, 2.5, 2.5])

    def test_weights_shift_pool_mean(self):
        fit = fit_isotonic(
            np.asarray([0.0, 1.0]),
            np.asarray([3.0, 1.0]),
            sample_weight=np.asarray([3.0, 1.0]),
        )
        np.testing.assert_allclose(fit.ys, [2.5, 2.5])

    def test_duplicate_x_merged(self):
        fit = fit_isotonic(
            np.asarray([0.0, 0.0, 1.0]), np.asarray([0.0, 1.0, 2.0])
        )
        np.testing.assert_allclose(fit.xs, [0.0, 1.0])
        np.testing.assert_allclose(fit.ys, [0.5, 2.0])

    def test_clamps_outside_range(self):
        fit = IsotonicFit(
            np.asarray([0.0, 1.0], np.float32), np.asarray([0.2, 0.8], np.float32)
        )
        out = np.asarray(apply_isotonic(fit, jnp.asarray([-5.0, 5.0])))
        np.testing.assert_allclose(out, [0.2, 0.8])


class TestMDL:
    def test_equal_mass_bins_and_transform(self):
        rng = np.random.default_rng(0)
        n, F, B = 4000, 3, 8
        rows = rng.integers(0, F, n)
        vals = rng.normal(loc=rows.astype(float) * 10, scale=1.0, size=n)
        bins = fit_mdl(rows, vals, F, B)
        assert bins.boundaries.shape == (F, B)
        assert (np.diff(bins.boundaries, axis=1) >= 0).all()
        idx, interp = jax.jit(mdl_transform)(
            bins.boundaries, jnp.asarray(rows[:512], jnp.int32),
            jnp.asarray(vals[:512], jnp.float32),
        )
        idx, interp = np.asarray(idx), np.asarray(interp)
        assert idx.min() >= 0 and idx.max() <= B - 1
        # equal-mass: per feature, bins should be roughly uniformly occupied
        for f in range(F):
            occ = np.bincount(idx[rows[:512] == f], minlength=B)
            assert occ.max() <= 4 * max(occ[occ > 0].min(), 1)
        # interpolated value sits within [bin, bin+1)
        assert ((interp >= idx - 1e-5) | (idx == B - 1)).all()

    def test_out_of_range_clamped(self):
        bins = MDLBins(np.tile(np.linspace(0, 1, 4, dtype=np.float32), (1, 1)))
        idx, interp = mdl_transform(
            bins, jnp.zeros(2, jnp.int32), jnp.asarray([-10.0, 10.0])
        )
        assert int(idx[0]) == 0 and int(idx[1]) == 3
        assert float(interp[0]) == 0.0 and float(interp[1]) <= 3.0

    def test_unseen_feature_goes_to_bin_zero(self):
        bins = fit_mdl(np.asarray([0, 0]), np.asarray([1.0, 2.0]), 2, 4)
        idx, _ = mdl_transform(
            bins, jnp.asarray([1], jnp.int32), jnp.asarray([5.0])
        )
        assert int(idx[0]) == 3 or int(idx[0]) == 0  # all-zero row: >= all


class TestLayers:
    def test_sparse_max_norm_tracks_running_max(self):
        v1 = jnp.asarray([[1.0, 4.0], [2.0, 1.0]])
        normed, rmax = sparse_max_norm(v1, jnp.zeros(2))
        np.testing.assert_allclose(np.asarray(rmax), [2.0, 4.0])
        np.testing.assert_allclose(
            np.asarray(normed), [[0.5, 1.0], [1.0, 0.25]]
        )
        v2 = jnp.asarray([[1.0, 8.0]])
        normed2, rmax2 = sparse_max_norm(v2, rmax)
        np.testing.assert_allclose(np.asarray(rmax2), [2.0, 8.0])
        # inference mode: no update
        _, rmax3 = sparse_max_norm(v2, rmax, is_training=False)
        np.testing.assert_allclose(np.asarray(rmax3), np.asarray(rmax))

    def test_stitch_roundtrip(self):
        a = jnp.asarray([[1.0], [3.0]])
        b = jnp.asarray([[2.0], [4.0]])
        out = stitch(
            (a, b),
            (jnp.asarray([0, 2]), jnp.asarray([1, 3])),
        )
        np.testing.assert_allclose(np.asarray(out)[:, 0], [1, 2, 3, 4])
