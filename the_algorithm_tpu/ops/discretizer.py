"""Percentile / hashing discretizers: calibrate on host, apply in-graph.

Reference: libtwml's ``PercentileDiscretizer`` / ``HashingDiscretizer`` C++ TF
ops (``twml/libtwml/src/ops/{discretizer,hashing_discretizer}.cpp``,
``src/lib/hashing_discretizer_impl.cpp``) and the two-phase "calibrate then
train" flow (``twml/twml/contrib/calibrators/common_calibrators.py:199-689``,
``calibrate_discretizer_and_export:537``).

TPU-native split:
  - **Calibration** (one pass over sample data) runs on host in numpy —
    it's a quantile computation per feature, done once before training.
  - **Apply** runs in-graph as ``jnp.searchsorted`` (≡ ``std::lower_bound``
    in ``hashing_discretizer_impl.cpp:9-12``) followed by the bit-identical
    multiplicative hash into ``2**output_bits`` buckets.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from the_algorithm_tpu.core.hashing import (
    multiplicative_hash_jnp,
    multiplicative_hash_np,
)


@dataclasses.dataclass(frozen=True)
class PercentileBins:
    """Per-feature bin boundaries: feature row f has ``bin_vals[f]`` sorted."""

    feature_ids: np.ndarray  # [F] int64 — original (hashed) feature ids
    bin_vals: np.ndarray  # [F, n_bins-1] float32 interior boundaries, sorted

    @property
    def n_features(self) -> int:
        return self.feature_ids.shape[0]

    @property
    def n_bins(self) -> int:
        return self.bin_vals.shape[1] + 1


def fit_percentile_bins(
    samples: Dict[int, np.ndarray], n_bins: int
) -> PercentileBins:
    """Fit equal-mass bin boundaries per feature from sampled values.

    ``samples`` maps feature_id → 1-D array of observed values. Boundaries are
    the interior (1/n .. (n-1)/n) quantiles, deduplicated by clamping — like
    the reference's percentile calibrator which allocates equal-mass bins from
    an accumulated sample (``common_calibrators.py:265``).
    """
    fids = np.array(sorted(samples.keys()), dtype=np.int64)
    qs = np.linspace(0.0, 1.0, n_bins + 1)[1:-1]
    rows = []
    for fid in fids:
        vals = np.asarray(samples[int(fid)], dtype=np.float32)
        if vals.size == 0:
            rows.append(np.zeros(n_bins - 1, np.float32))
        else:
            rows.append(np.quantile(vals, qs).astype(np.float32))
    return PercentileBins(fids, np.stack(rows) if rows else np.zeros((0, n_bins - 1), np.float32))


def bucketize_np(bins: PercentileBins, feature_rows: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Host-side bucketize: value → bin index via lower_bound per feature row."""
    out = np.empty(values.shape, np.int64)
    flat_rows = feature_rows.reshape(-1)
    flat_vals = values.reshape(-1)
    flat_out = out.reshape(-1)
    for i in range(flat_vals.shape[0]):
        flat_out[i] = np.searchsorted(
            bins.bin_vals[flat_rows[i]], flat_vals[i], side="left"
        )
    return out


def bucketize_jnp(bin_vals: jnp.ndarray, feature_rows: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """In-graph bucketize. ``bin_vals [F, B-1]``, rows/values ``[...]`` aligned.

    vmapped searchsorted over the gathered per-feature boundary rows.
    """
    rows = bin_vals[feature_rows]  # [..., B-1]
    return jnp.sum(rows < values[..., None], axis=-1).astype(jnp.int32)


@dataclasses.dataclass(frozen=True)
class HashingDiscretizer:
    """Percentile bins + multiplicative hash into 2**output_bits ids.

    ≡ ``HashingDiscretizer`` (``hashing_discretizer_impl.cpp:121-160``):
    hashed_id = integer_multiplicative_hashing(feature_id, bin_idx, bits).
    """

    bins: PercentileBins
    output_bits: int

    def row_index(self) -> Dict[int, int]:
        return {int(f): i for i, f in enumerate(self.bins.feature_ids)}

    def transform_np(
        self, feature_ids: np.ndarray, values: np.ndarray
    ) -> np.ndarray:
        """Host path: (feature_id, value) → hashed bucket id [0, 2**bits)."""
        idx_map = self.row_index()
        rows = np.array(
            [idx_map[int(f)] for f in feature_ids.reshape(-1)], dtype=np.int64
        ).reshape(feature_ids.shape)
        buckets = bucketize_np(self.bins, rows, values)
        return multiplicative_hash_np(feature_ids, buckets, self.output_bits)

    def transform_jnp(
        self,
        feature_rows: jnp.ndarray,
        feature_ids: jnp.ndarray,
        values: jnp.ndarray,
        bin_vals: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """In-graph path. ``feature_rows`` pre-resolved on host (static vocab)."""
        bv = bin_vals if bin_vals is not None else jnp.asarray(self.bins.bin_vals)
        buckets = bucketize_jnp(bv, feature_rows, values)
        return multiplicative_hash_jnp(feature_ids, buckets, self.output_bits)
