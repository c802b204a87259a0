"""Pallas TPU kernel: run-collapse (dedup-sum) over sorted id rows.

The SANN scan's hashmap-accumulate (``ApproximateCosineSimilarity.scala:
83-100``) becomes sort + *grouped reduction by equal-id runs* on TPU. The
XLA formulation of the reduction (``lax.associative_scan`` over the whole
row) makes ~log2(W) full passes through HBM; this kernel does the identical
log-step segmented scan entirely in VMEM — one HBM read and one write per
element, with `pltpu.roll` supplying the flat-index shifts on the
[sublane, lane] layout.

Semantics (per row, ids sorted ascending): every maximal run of equal ids
is collapsed; the run's **last** slot holds (id, Σ value) for each value
array; every other slot holds (PAD_ID, 0). Only the set of populated slots
differs from :func:`the_algorithm_tpu.ops.retrieval._dedup_sum` (which
populates run *starts*) — downstream consumers mask by PAD_ID and never
depend on position.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from the_algorithm_tpu.ops.sparse import PAD_ID

LANES = 128


def _shift_flat(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """y[i] = x[i - d] in row-major flat order over an [S, 128] tile.

    Wrap-around values are NOT masked here — callers overwrite the first
    ``d`` flat slots with the scan identity.
    """
    dr, dl = divmod(d, LANES)
    if dl == 0:
        return pltpu.roll(x, shift=dr, axis=0)
    a = pltpu.roll(pltpu.roll(x, shift=dr, axis=0), shift=dl, axis=1)
    b = pltpu.roll(pltpu.roll(x, shift=dr + 1, axis=0), shift=dl, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    return jnp.where(lane >= dl, a, b)


def _collapse_tile(ids, vals):
    """The scan body on one [S, 128] tile; returns (rep_ids, summed vals)."""
    S = ids.shape[0]
    W = S * LANES
    flat = (
        jax.lax.broadcasted_iota(jnp.int32, ids.shape, 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, ids.shape, 1)
    )

    prev_ids = _shift_flat(ids, 1)
    head = (ids != prev_ids) | (flat == 0)  # run-start flags
    next_ids = _shift_flat(ids, W - 1)  # circular: x[i+1] == x[i-(W-1)]
    last = (ids != next_ids) | (flat == W - 1)  # run-end flags

    vals = list(vals)
    f = head.astype(jnp.int32)  # int32: pltpu.roll over bools is unsupported
    d = 1
    while d < W:
        blocked = flat < d
        yf = jnp.where(blocked, 1, _shift_flat(f, d))
        stop = blocked | (f == 1)
        for j in range(len(vals)):
            yv = _shift_flat(vals[j], d)
            vals[j] = vals[j] + jnp.where(stop, 0.0, yv)
        f = f | yf
        d *= 2

    rep = jnp.where(last, ids, PAD_ID)
    return rep, [jnp.where(last, v, 0.0) for v in vals]


def _run_collapse_kernel(k: int, ids_ref, *refs):
    """refs = (v_1..v_k, out_ids, out_1..out_k); one query row per step."""
    rep, sums = _collapse_tile(ids_ref[0], [refs[j][0] for j in range(k)])
    refs[k][0] = rep
    for j in range(k):
        refs[k + 1 + j][0] = sums[j]


def _run_collapse_kernel_2d(k: int, ids_ref, *refs):
    """Gridless [S, 128] single-tile form."""
    rep, sums = _collapse_tile(ids_ref[...], [refs[j][...] for j in range(k)])
    refs[k][...] = rep
    for j in range(k):
        refs[k + 1 + j][...] = sums[j]


def _run_collapse_single(ids, *values, interpret=False):
    """[S, 128] single-row form — safe under jax.vmap (the pallas batching
    rule turns the batch into a grid dimension)."""
    k = len(values)
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_run_collapse_kernel_2d, k),
        in_specs=[spec] * (1 + k),
        out_specs=[spec] * (1 + k),
        out_shape=[jax.ShapeDtypeStruct(ids.shape, jnp.int32)]
        + [jax.ShapeDtypeStruct(ids.shape, jnp.float32)] * k,
        interpret=interpret,
    )(ids, *values)
    return tuple(outs)


def run_collapse_sorted_1d(
    ids: jnp.ndarray, *values: jnp.ndarray, interpret: bool = False
) -> Tuple[jnp.ndarray, ...]:
    """1-D row variant of :func:`run_collapse_sorted` (vmap-friendly)."""
    W = ids.shape[0]
    Wp = -(-W // 1024) * 1024
    if Wp != W:
        ids = jnp.concatenate([ids, jnp.full((Wp - W,), PAD_ID, ids.dtype)])
        values = tuple(
            jnp.concatenate([v, jnp.zeros((Wp - W,), v.dtype)]) for v in values
        )
    shaped = ids.reshape(Wp // LANES, LANES)
    vals = [v.reshape(Wp // LANES, LANES) for v in values]
    outs = _run_collapse_single(shaped, *vals, interpret=interpret)
    return tuple(o.reshape(Wp)[:W] for o in outs)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run_collapse_call(ids, *values, interpret=False):
    Q, S, _ = ids.shape
    k = len(values)
    spec = pl.BlockSpec((1, S, LANES), lambda q: (q, 0, 0))
    outs = pl.pallas_call(
        functools.partial(_run_collapse_kernel, k),
        grid=(Q,),
        in_specs=[spec] * (1 + k),
        out_specs=[spec] * (1 + k),
        out_shape=[jax.ShapeDtypeStruct(ids.shape, jnp.int32)]
        + [jax.ShapeDtypeStruct(ids.shape, jnp.float32)] * k,
        interpret=interpret,
    )(ids, *values)
    return tuple(outs)


def run_collapse_sorted(
    ids: jnp.ndarray, *values: jnp.ndarray, interpret: bool = False
) -> Tuple[jnp.ndarray, ...]:
    """Collapse equal-id runs of pre-sorted rows by summing ``values``.

    ids: [Q, W] int32 sorted ascending per row; values: [Q, W] float32.
    Returns (rep_ids, *sums) of the same shape — run ends hold the id and
    the run total, all other slots are PAD_ID / 0. W is padded to a
    multiple of 1024 internally (PAD_ID rows collapse to a zero PAD run,
    identical to the unpadded result).
    """
    Q, W = ids.shape
    Wp = -(-W // 1024) * 1024
    if Wp != W:
        pad_i = jnp.full((Q, Wp - W), PAD_ID, ids.dtype)
        ids = jnp.concatenate([ids, pad_i], axis=1)
        values = tuple(
            jnp.concatenate(
                [v, jnp.zeros((Q, Wp - W), v.dtype)], axis=1
            )
            for v in values
        )
    shaped = ids.reshape(Q, Wp // LANES, LANES)
    vals = [v.reshape(Q, Wp // LANES, LANES) for v in values]
    outs = _run_collapse_call(shaped, *vals, interpret=interpret)
    outs = [o.reshape(Q, Wp)[:, :W] for o in outs]
    return tuple(outs)
