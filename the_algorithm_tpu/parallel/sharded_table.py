"""Row-sharded embedding tables with collective lookup/update.

The TPU-native replacement for three reference mechanisms (SURVEY.md §2.3):

  - twml's parameter-server-partitioned embedding variables
    (``tf.min_max_variable_partitioner``, ``twml/twml/layers/full_sparse.py:124-135``)
  - memcache/Manhattan multiget fan-out (``clusterTweetCandidatesStore.multiGet``,
    ``simclusters-ann/.../SimClustersANNCandidateSource.scala:79``)
  - GFS server→worker sharded adjacency lookups
    (``graph-feature-service/.../GetIntersectionStore.scala``)

A table is a ``[rows, dim]`` array laid out ``P('model', None)`` on the mesh.
Two lookup strategies:

  - :func:`lookup` — plain ``table[ids]`` under a sharding constraint; XLA's
    SPMD partitioner inserts the gather collectives (the default; lets the
    compiler pick all-to-all vs all-gather based on shapes).
  - :func:`lookup_onehot_psum` — explicit shard_map: each shard one-hot
    matmuls its local rows (MXU work, no dynamic gather) and the results
    psum over ``model``. Deterministic comms; preferred inside larger
    shard_mapped programs.

Updates go through :func:`scatter_add` (the transpose — used for both
optimizer-free index maintenance and manual gradient paths).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from the_algorithm_tpu.core.mesh import MODEL_AXIS


class ShardedTable(NamedTuple):
    """A row-sharded [rows, dim] table. ``array`` carries the sharding."""

    array: jnp.ndarray

    @property
    def rows(self) -> int:
        return self.array.shape[0]

    @property
    def dim(self) -> int:
        return self.array.shape[1]


def create(
    mesh: Mesh,
    rows: int,
    dim: int,
    *,
    init: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
) -> ShardedTable:
    """Materialize a table sharded P('model', None) on the mesh."""
    sharding = NamedSharding(mesh, P(MODEL_AXIS, None))
    if init is not None:
        arr = jax.device_put(jnp.asarray(init, dtype), sharding)
    else:
        arr = jax.device_put(jnp.zeros((rows, dim), dtype), sharding)
    return ShardedTable(arr)


def lookup(table: ShardedTable, ids: jnp.ndarray) -> jnp.ndarray:
    """Gather rows by id; XLA SPMD inserts the cross-shard exchange.

    ``ids`` may be data-sharded [B] or replicated; output follows ids' batch
    sharding with replicated feature dim.
    """
    return table.array[ids]


def _local_onehot_lookup(local_rows: jnp.ndarray, ids: jnp.ndarray, rows_per_shard: int):
    """Inside shard_map: one-hot matmul of locally-owned rows, 0 elsewhere."""
    shard = jax.lax.axis_index(MODEL_AXIS)
    offset = shard * rows_per_shard
    local_ids = ids - offset
    in_shard = (local_ids >= 0) & (local_ids < rows_per_shard)
    safe = jnp.where(in_shard, local_ids, 0)
    onehot = jax.nn.one_hot(safe, rows_per_shard, dtype=local_rows.dtype)
    onehot = jnp.where(in_shard[..., None], onehot, 0)
    gathered = jnp.einsum(
        "...r,rd->...d", onehot, local_rows,
        preferred_element_type=jnp.float32,
    )
    return jax.lax.psum(gathered, MODEL_AXIS)


def lookup_onehot_psum(
    mesh: Mesh, table: ShardedTable, ids: jnp.ndarray
) -> jnp.ndarray:
    """Explicit-collective lookup: one-hot matmul per shard + psum('model').

    Each id is owned by exactly one shard, so the psum of zero-masked partial
    gathers reconstructs the full rows — the "multiget" as a collective.
    Requires ``rows % model_shards == 0``.
    """
    n_shards = mesh.shape[MODEL_AXIS]
    if table.rows % n_shards != 0:
        raise ValueError(f"rows={table.rows} not divisible by {n_shards} shards")
    rows_per_shard = table.rows // n_shards

    fn = jax.shard_map(
        functools.partial(_local_onehot_lookup, rows_per_shard=rows_per_shard),
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P()),
        out_specs=P(),
    )
    return fn(table.array, ids)


def scatter_add(
    table: ShardedTable, ids: jnp.ndarray, updates: jnp.ndarray
) -> ShardedTable:
    """table[ids] += updates (duplicate ids accumulate); sharding preserved."""
    flat_ids = ids.reshape(-1)
    flat_updates = updates.reshape(-1, updates.shape[-1])
    new = table.array.at[flat_ids].add(flat_updates)
    return ShardedTable(new)


def row_decay(table: ShardedTable, factor: float) -> ShardedTable:
    """Uniform exponential decay of all rows (half-life maintenance)."""
    return ShardedTable(table.array * jnp.asarray(factor, table.array.dtype))
