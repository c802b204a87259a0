"""Calibration ops: isotonic regression + MDL discretizer.

≡ twml's calibrator suite (``twml/twml/contrib/calibrators/
common_calibrators.py:199-689``) and the libtwml kernels behind it:
``twml/libtwml/src/ops/isotonic_calibration.cpp`` (per-feature
piecewise-linear calibration with interpolated lookup, via
``lib/optim.cpp``'s interpolation) and ``src/ops/discretizer.cpp`` (the MDL
discretizer: equal-mass bin boundaries fitted on a sample, transform =
bin index + within-bin linear interpolation).

TPU split of labor (SURVEY.md §2.2): *fitting* is a host pass (numpy PAV /
quantile sweep — it runs once over a calibration sample); *applying* is a
jittable ``searchsorted`` + gather + interpolate, fusable into the input
side of the model forward.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np


class IsotonicFit(NamedTuple):
    """Piecewise-constant isotonic knots (xs ascending, ys non-decreasing)."""

    xs: np.ndarray  # [K] knot inputs
    ys: np.ndarray  # [K] calibrated outputs


def fit_isotonic(
    x: np.ndarray,
    y: np.ndarray,
    sample_weight: Optional[np.ndarray] = None,
) -> IsotonicFit:
    """Pool-adjacent-violators: weighted least-squares monotone fit.

    ≡ the isotonic calibration fit phase
    (``common_calibrators.py`` IsotonicCalibrator → libtwml
    ``isotonic_calibration.cpp``): maps raw model scores to calibrated
    probabilities, non-decreasing in the score.
    """
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    w = (
        np.ones_like(x)
        if sample_weight is None
        else np.asarray(sample_weight, np.float64)
    )
    order = np.argsort(x, kind="stable")
    x, y, w = x[order], y[order], w[order]

    # merge duplicate xs first (PAV needs strictly grouped support points)
    ux, inv = np.unique(x, return_inverse=True)
    uw = np.bincount(inv, weights=w)
    uy = np.bincount(inv, weights=w * y) / np.maximum(uw, 1e-30)

    # PAV with explicit pools
    means = list(uy)
    weights = list(uw)
    counts = [1] * len(uy)
    i = 0
    while i < len(means) - 1:
        if means[i] <= means[i + 1] + 1e-15:
            i += 1
            continue
        total_w = weights[i] + weights[i + 1]
        means[i] = (means[i] * weights[i] + means[i + 1] * weights[i + 1]) / total_w
        weights[i] = total_w
        counts[i] += counts[i + 1]
        del means[i + 1], weights[i + 1], counts[i + 1]
        if i > 0:
            i -= 1
    # expand pools back to knots
    ys = np.repeat(np.asarray(means), np.asarray(counts, int))
    return IsotonicFit(ux.astype(np.float32), ys.astype(np.float32))


def apply_isotonic(fit: IsotonicFit, values: jnp.ndarray) -> jnp.ndarray:
    """Piecewise-linear interpolated lookup (jittable).

    ≡ libtwml ``internal/interpolate.h`` semantics: clamp outside the knot
    range, linear between knots.
    """
    return jnp.interp(
        values, jnp.asarray(fit.xs), jnp.asarray(fit.ys)
    )


class MDLBins(NamedTuple):
    """Per-feature bin boundaries [F, B] (equal-mass on the fit sample)."""

    boundaries: np.ndarray  # [F, B] float32, ascending per row


def fit_mdl(
    feature_rows: np.ndarray,  # [N] int feature index per sample value
    values: np.ndarray,  # [N] float
    num_features: int,
    num_bins: int,
) -> MDLBins:
    """Equal-mass ("maximum description length") bin boundaries per feature.

    ≡ the MDL calibrate phase (``common_calibrators.py:199-264`` MDL
    calibrator → ``libtwml/src/lib/discretizer_impl.cpp``): boundaries at
    the 1/B … (B-1)/B quantiles of each feature's sample, padded with ±∞
    behavior via edge clamping. Features with no sample get all-zero rows
    (transform maps them to bin 0, matching the C++ default path).
    """
    feature_rows = np.asarray(feature_rows)
    values = np.asarray(values, np.float64)
    out = np.zeros((num_features, num_bins), np.float32)
    qs = np.linspace(0.0, 1.0, num_bins)
    for f in range(num_features):
        v = values[feature_rows == f]
        if v.size == 0:
            continue
        out[f] = np.quantile(v, qs).astype(np.float32)
    return MDLBins(out)


def mdl_transform(
    bins: MDLBins | jnp.ndarray,
    feature_rows: jnp.ndarray,  # [N] int32
    values: jnp.ndarray,  # [N] float32
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (bin_idx [N] int32, interpolated [N] float32), jittable.

    ≡ the MDL op output (``ops/discretizer.cpp``): the discrete bin id
    (for embedding/hashed lookup) plus a continuous interpolated position
    in [0, B-1] (bin index + within-bin fraction) — the "soft" discretized
    value some models consume instead of one-hot bins.
    """
    b = bins.boundaries if isinstance(bins, MDLBins) else bins
    b = jnp.asarray(b)
    B = b.shape[1]
    rows = b[feature_rows]  # [N, B]
    idx = jnp.clip(
        jnp.sum(values[:, None] >= rows, axis=1) - 1, 0, B - 1
    ).astype(jnp.int32)
    lo_i = jnp.clip(idx, 0, B - 2)
    lo = jnp.take_along_axis(rows, lo_i[:, None], axis=1)[:, 0]
    hi = jnp.take_along_axis(rows, (lo_i + 1)[:, None], axis=1)[:, 0]
    frac = jnp.where(hi > lo, (values - lo) / jnp.maximum(hi - lo, 1e-30), 0.0)
    interp = jnp.clip(lo_i + jnp.clip(frac, 0.0, 1.0), 0.0, B - 1.0)
    return idx, interp


def sparse_max_norm(
    values: jnp.ndarray,  # [B, F] batch of sparse-feature magnitudes
    running_max: jnp.ndarray,  # [F] persistent per-feature max
    *,
    is_training: bool = True,
    epsilon: float = 1e-6,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """≡ ``twml/layers/sparse_max_norm.py``: divide each feature by the
    running max |value| seen so far (updated in training), a cheap
    normalization for unbounded count features."""
    if is_training:
        batch_max = jnp.max(jnp.abs(values), axis=0)
        running_max = jnp.maximum(running_max, batch_max)
    normed = values / jnp.maximum(running_max[None, :], epsilon)
    return normed, running_max


def stitch(
    values: Tuple[jnp.ndarray, ...], indices: Tuple[jnp.ndarray, ...]
) -> jnp.ndarray:
    """≡ ``twml/layers/stitch.py`` (tf.dynamic_stitch): interleave shards
    back into one batch by row index."""
    total = sum(int(v.shape[0]) for v in values)
    width = values[0].shape[1:]
    out = jnp.zeros((total, *width), values[0].dtype)
    for v, i in zip(values, indices):
        out = out.at[i].set(v)
    return out
