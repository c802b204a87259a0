"""Model-quality metrics: AUC (per head), accuracy, calibration.

≡ the reference's eval metric fns: per-engagement-class AUC
(``src/python/twitter/deepbird/projects/timelines/scripts/models/earlybird/metrics.py``,
``pushservice/src/main/python/models/libs/metric_fn_utils.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def auc(scores: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """ROC AUC via the rank statistic (Mann–Whitney U), tie-averaged.

    jit-friendly: one sort + one scatter. labels ∈ {0,1} float.
    """
    n = scores.shape[0]
    order = jnp.argsort(scores)
    sorted_scores = scores[order]
    # average ranks over ties: rank = mean of positions with equal score
    idx = jnp.arange(n, dtype=jnp.float32)
    same_prev = jnp.concatenate(
        [jnp.zeros((1,), bool), sorted_scores[1:] == sorted_scores[:-1]]
    )
    grp = jnp.cumsum(~same_prev) - 1  # tie-group index per position
    grp_sum = jax.ops.segment_sum(idx, grp, num_segments=n)
    grp_cnt = jax.ops.segment_sum(jnp.ones_like(idx), grp, num_segments=n)
    avg_rank = (grp_sum / jnp.maximum(grp_cnt, 1.0))[grp] + 1.0  # 1-based
    ranks = jnp.zeros((n,), jnp.float32).at[order].set(avg_rank)

    pos = jnp.sum(labels)
    neg = n - pos
    sum_pos_ranks = jnp.sum(ranks * labels)
    u = sum_pos_ranks - pos * (pos + 1) / 2.0
    return jnp.where(
        (pos > 0) & (neg > 0), u / jnp.maximum(pos * neg, 1.0), 0.5
    )


def auc_per_head(scores: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """[B, H] scores/labels → [H] AUC."""
    return jax.vmap(auc, in_axes=(1, 1))(scores, labels)


def accuracy(scores: jnp.ndarray, labels: jnp.ndarray, threshold: float = 0.5):
    return jnp.mean((scores > threshold) == (labels > 0.5))


def log_loss(probs: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    p = jnp.clip(probs, 1e-7, 1 - 1e-7)
    return -jnp.mean(labels * jnp.log(p) + (1 - labels) * jnp.log(1 - p))


def recall_at_k(
    retrieved_ids: jnp.ndarray,  # [Q, K] (PAD allowed)
    relevant_ids: jnp.ndarray,  # [Q, R] ground-truth (PAD allowed)
    pad_id: int,
) -> jnp.ndarray:
    """Mean fraction of relevant items appearing in the retrieved top-K —
    the ANN loadtest recall definition (``ann/.../LoadTestRecorder.scala:16-60``)."""
    hit = (retrieved_ids[:, :, None] == relevant_ids[:, None, :]) & (
        relevant_ids[:, None, :] != pad_id
    )
    hits_per_query = jnp.sum(jnp.any(hit, axis=1), axis=-1)
    n_relevant = jnp.sum(relevant_ids != pad_id, axis=-1)
    per_query = hits_per_query / jnp.maximum(n_relevant, 1)
    has_rel = n_relevant > 0
    return jnp.sum(jnp.where(has_rel, per_query, 0.0)) / jnp.maximum(
        jnp.sum(has_rel), 1
    )
