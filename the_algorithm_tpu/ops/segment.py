"""Static-shaped grouped reductions — the ``sumByKey`` of the TPU world.

Every Scalding shuffle in the reference's matrix jobs
(``UpdateKnownFor.collectInformationPerNode`` ``.sumByKey``,
``InterestedInFromKnownFor.userClusterPairsWithoutNormalization`` ``.sumByKey``)
becomes one of these: sort ids, detect runs, reduce runs with prefix sums —
all fixed-shape, all vectorized over rows on the VPU.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from the_algorithm_tpu.ops.sparse import PAD_ID


def row_dedup_sum(
    ids: jnp.ndarray, *values: jnp.ndarray
) -> Tuple[jnp.ndarray, ...]:
    """Per-row grouped sum: for each row, sum ``values`` over equal ids.

    ``ids``: [..., W] int32 (PAD_ID sorts last and is preserved as PAD).
    Returns (rep_ids, *sums) of the same shape: each distinct id appears once
    (at its run-start position after an in-row sort); other slots are
    PAD_ID / 0. Rows are independent — no cross-row reduction.
    """
    order = jnp.argsort(ids, axis=-1)
    s_ids = jnp.take_along_axis(ids, order, axis=-1)
    s_vals = [jnp.take_along_axis(v, order, axis=-1) for v in values]

    W = s_ids.shape[-1]
    prev = jnp.concatenate(
        [jnp.full(s_ids.shape[:-1] + (1,), -1, s_ids.dtype), s_ids[..., :-1]],
        axis=-1,
    )
    is_start = s_ids != prev  # first slot of each equal run
    nxt = jnp.concatenate(
        [s_ids[..., 1:], jnp.full(s_ids.shape[:-1] + (1,), -2, s_ids.dtype)],
        axis=-1,
    )
    is_end = s_ids != nxt  # last slot of each equal run

    idx = jnp.broadcast_to(jnp.arange(W), s_ids.shape)
    # index of each slot's run-end = nearest end position at-or-after the
    # slot: suffix cummin of end positions (lax ops reject negative axes)
    last_axis = s_ids.ndim - 1
    end_idx = jnp.flip(
        jax.lax.cummin(
            jnp.flip(jnp.where(is_end, idx, W), axis=-1), axis=last_axis
        ),
        axis=-1,
    )
    end_idx = jnp.minimum(end_idx, W - 1)  # guard (last slot is always an end)

    out = []
    for v in s_vals:
        c = jnp.cumsum(v, axis=-1)
        c_prev = jnp.concatenate(
            [jnp.zeros(c.shape[:-1] + (1,), c.dtype), c[..., :-1]], axis=-1
        )
        # run total = inclusive-cumsum at run end − exclusive-cumsum at run start
        run_total = jnp.take_along_axis(c, end_idx, axis=-1) - c_prev
        out.append(jnp.where(is_start, run_total, 0))

    rep_ids = jnp.where(is_start, s_ids, PAD_ID)
    return (rep_ids,) + tuple(out)


def row_dedup_count(ids: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row distinct ids + multiplicity counts (same layout as above)."""
    rep, counts = row_dedup_sum(ids, jnp.ones(ids.shape, jnp.float32))
    counts = jnp.where(rep == PAD_ID, 0.0, counts)
    return rep, counts
