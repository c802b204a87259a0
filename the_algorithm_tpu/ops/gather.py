"""Fast row gather: Pallas DMA kernel for table[ids] on TPU.

XLA lowers a batched row gather (``table[ids]`` with thousands of distinct
rows) to a serialized dynamic-slice loop — measured ~0.6 GB/s on v5e, 34 ms
for the SANN scan's 12.8k-row multiget while every other stage runs at
roofline. This kernel issues the row copies through the Pallas pipeline
machinery instead: the id vector is a scalar-prefetch argument and each grid
step's input block is addressed by ``ids[i]`` (the canonical
PrefetchScalarGridSpec embedding-gather pattern), so row DMAs double-buffer
back-to-back at HBM bandwidth.

This is the "multiget" primitive of the framework (SURVEY.md §2.3: the
memcache/Manhattan row fetch). Non-TPU backends fall back to plain indexing.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(ids_ref, *refs):
    """refs = (in_1..in_k, out_1..out_k); block i is row ids[i] of each."""
    k = len(refs) // 2
    for j in range(k):
        refs[k + j][...] = refs[j][...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _row_gather_pallas(ids: jnp.ndarray, *tables: jnp.ndarray, interpret=False):
    B = ids.shape[0]
    # tables go in as [R, 1, M] so the (1, 1, M) row block's trailing two
    # dims equal the array dims (the TPU block-shape divisibility rule
    # forbids a bare (1, M) block of an [R, M] array)
    tables3 = [t[:, None, :] for t in tables]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, t.shape[2]), lambda i, ids_ref: (ids_ref[i], 0, 0)
            )
            for t in tables3
        ],
        out_specs=[
            pl.BlockSpec((1, 1, t.shape[2]), lambda i, ids_ref: (i, 0, 0))
            for t in tables3
        ],
    )
    outs = pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, t.shape[2]), t.dtype) for t in tables3
        ],
        interpret=interpret,
    )(ids, *tables3)
    return [o[:, 0, :] for o in outs]


def row_gather(
    ids: jnp.ndarray, *tables: jnp.ndarray
) -> Tuple[jnp.ndarray, ...]:
    """Gather the same rows from k aligned [R, M_k] tables.

    ``ids`` may have any shape; outputs are ``ids.shape + (M_k,)``. Ids must
    be in-range (clip/mask beforehand — PAD handling is the caller's).
    """
    flat = ids.reshape(-1).astype(jnp.int32)
    backend = jax.default_backend()
    if backend == "cpu":
        outs = tuple(t[flat] for t in tables)
    else:
        outs = tuple(_row_gather_pallas(flat, *tables))
    return tuple(o.reshape(ids.shape + (t.shape[1],)) for o, t in zip(outs, tables))
