"""Earlybird light ranker: percentile-discretized hashed logistic regression.

Reference: ``src/python/twitter/deepbird/projects/timelines/scripts/models/
earlybird/train.py:39-105`` — the TF-v1 graph is percentile-discretizer →
sparse one-hot hash → ``full_sparse`` LR predicting engagement; per-label
example weights (``example_weights.py``); exports for in-index serving. The
twml input path hashes (feature_id, bin) pairs into 2**output_bits buckets
(``libtwml/src/lib/hashing_discretizer_impl.cpp``).

TPU build (the SURVEY.md "minimum end-to-end slice"): same three phases —
(1) calibrate percentile bins on host, (2) train the hashed LR under jit
with DP sharding, (3) export weights — with bit-identical hashing via
:mod:`the_algorithm_tpu.core.hashing`.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from the_algorithm_tpu.ops import discretizer as disc
from the_algorithm_tpu.ops import hashed_lr


@dataclasses.dataclass(frozen=True)
class LightRankerConfig:
    n_bins: int = 16  # percentile bins per feature
    output_bits: int = 18  # hash space = 2**18 (twml feature_config scale)
    learning_rate: float = 0.1
    l2: float = 1e-6


class LightRankerModel(NamedTuple):
    """Calibrated discretizer + LR weights — the exportable artifact."""

    feature_ids: np.ndarray  # [F] int64 — fixed feature vocabulary
    bin_vals: np.ndarray  # [F, n_bins-1]
    weights: jnp.ndarray  # [2**bits]
    bias: jnp.ndarray  # scalar
    output_bits: int


def calibrate(
    feature_ids: np.ndarray,  # [F] int64
    values: np.ndarray,  # [B, F] calibration sample
    config: LightRankerConfig,
) -> disc.HashingDiscretizer:
    """Phase 1 ≡ ``calibrate_discretizer_and_export``
    (``twml/twml/contrib/calibrators/common_calibrators.py:537``)."""
    samples = {int(f): values[:, i] for i, f in enumerate(feature_ids)}
    bins = disc.fit_percentile_bins(samples, config.n_bins)
    return disc.HashingDiscretizer(bins, config.output_bits)


def featurize(
    hd: disc.HashingDiscretizer,
    feature_ids: np.ndarray,  # [F] int64
    values: np.ndarray,  # [B, F]
) -> hashed_lr.SparseBatch:
    """Host-side transform: (feature, value) → hashed sparse batch.

    Full-width (every feature present — the recap config is dense-ish with
    ~40 features); missing features would be masked.
    """
    B, F = values.shape
    fids = np.broadcast_to(feature_ids[None, :], (B, F))
    idx = hd.transform_np(fids, values)
    return hashed_lr.SparseBatch(
        jnp.asarray(idx),
        jnp.ones((B, F), jnp.float32),  # binary one-hot per (feature, bin)
        jnp.ones((B, F), bool),
    )


def init_params(config: LightRankerConfig) -> Dict[str, jnp.ndarray]:
    return {
        "weights": jnp.zeros((2**config.output_bits,), jnp.float32),
        "bias": jnp.zeros((), jnp.float32),
    }


def logits_fn(params: Dict[str, jnp.ndarray], batch: hashed_lr.SparseBatch) -> jnp.ndarray:
    return hashed_lr.sparse_logits(batch, params["weights"], params["bias"])


def loss_fn(
    params: Dict[str, jnp.ndarray],
    batch: hashed_lr.SparseBatch,
    labels: jnp.ndarray,
    example_weights: Optional[jnp.ndarray] = None,
    l2: float = 0.0,
) -> jnp.ndarray:
    """Weighted sigmoid CE ≡ train.py:84-96 (+ optional L2)."""
    logits = logits_fn(params, batch)
    ce = -labels * jax.nn.log_sigmoid(logits) - (1 - labels) * jax.nn.log_sigmoid(-logits)
    if example_weights is not None:
        ce = ce * example_weights
        loss = jnp.sum(ce) / jnp.maximum(jnp.sum(example_weights), 1.0)
    else:
        loss = jnp.mean(ce)
    if l2 > 0:
        loss = loss + l2 * jnp.sum(params["weights"] ** 2)
    return loss


def predict_proba(model: LightRankerModel, values: np.ndarray) -> np.ndarray:
    """Serving path: featurize + LR forward, returns P(engagement)."""
    hd = disc.HashingDiscretizer(
        disc.PercentileBins(model.feature_ids, model.bin_vals), model.output_bits
    )
    batch = featurize(hd, model.feature_ids, values)
    logits = hashed_lr.sparse_logits(batch, model.weights, model.bias)
    return np.asarray(jax.nn.sigmoid(logits))


# -- lolly parity scorer (pure reference implementation) ---------------------


def lolly_linear_score(
    feature_values: np.ndarray,  # [B, F]
    bin_boundaries: np.ndarray,  # [F, n_bins-1]
    bin_weights: np.ndarray,  # [F, n_bins] per-(feature, bin) weight
    bias: float,
) -> np.ndarray:
    """Pure-numpy discretized-LR scorer ≡ the legacy "Lolly" parity oracle
    (``earlybird/lolly/scorer.py`` pattern): logit = bias + Σ_f w[f, bin(v_f)].

    Used as the golden model for ``--replicate_lolly``-style parity tests
    (train.py:88-91): the hashed LR must reproduce these logits when trained
    with MSE against them.
    """
    B, F = feature_values.shape
    out = np.full((B,), bias, np.float64)
    for f in range(F):
        bins = np.searchsorted(bin_boundaries[f], feature_values[:, f], side="left")
        out += bin_weights[f, bins]
    return out
