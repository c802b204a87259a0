"""Row-sharded embedding tables with collective lookup/update.

The TPU-native replacement for three reference mechanisms (SURVEY.md §2.3):

  - twml's parameter-server-partitioned embedding variables
    (``tf.min_max_variable_partitioner``, ``twml/twml/layers/full_sparse.py:124-135``)
  - memcache/Manhattan multiget fan-out (``clusterTweetCandidatesStore.multiGet``,
    ``simclusters-ann/.../SimClustersANNCandidateSource.scala:79``)
  - GFS server→worker sharded adjacency lookups
    (``graph-feature-service/.../GetIntersectionStore.scala``)

A table is a ``[rows, dim]`` array laid out ``P('model', None)`` on the mesh.
Three lookup strategies:

  - :func:`lookup` — plain ``table[ids]`` under a sharding constraint; XLA's
    SPMD partitioner inserts the gather collectives (the default; lets the
    compiler pick all-to-all vs all-gather based on shapes).
  - :func:`lookup_onehot_psum` — explicit shard_map: each shard one-hot
    matmuls its local rows (MXU work, no dynamic gather) and the results
    psum over ``model``. Deterministic comms but O(B·rows/shard·dim) FLOPs —
    only for small tables inside larger shard_mapped programs.
  - :func:`lookup_all_to_all` / :func:`multiget_all_to_all` — the explicit
    **row-exchange multiget** (BASELINE "speed-of-light sharded-table
    lookup"): each shard routes its requested ids to the owner shards with
    one ``lax.all_to_all`` (tiny id payload), owners gather rows from local
    HBM, and a second ``all_to_all`` returns the rows. Per-device bytes moved
    ≈ B_local·dim — a factor ``shards`` less than the psum/all-gather
    alternatives, with zero matmul FLOPs. Differentiable (the transpose is a
    row-exchange scatter-add back into the table).

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

from the_algorithm_tpu.core.mesh import DATA_AXIS, MODEL_AXIS


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


# -- explicit all-to-all row exchange (the multiget as a collective) ---------
#
# ≡ the reference's memcache/Manhattan multiget fan-out
# (``simclusters-ann/.../SimClustersANNCandidateSource.scala:79``) and twml's
# PS-partitioned embedding gathers (``twml/twml/layers/full_sparse.py:124-135``)
# — re-designed as two ICI all-to-alls instead of RPC scatter/gather.


def route_and_gather(local_tables, ids, *, rows_per_shard: int,
                     capacity: Optional[int] = None, axis: str = MODEL_AXIS):
    """Per-device multiget body — call inside shard_map over ``axis``.

    ``local_tables``: pytree of ``[rows_per_shard, ...]`` arrays (this shard's
    contiguous row block; shard s owns rows [s·rps, (s+1)·rps)).
    ``ids``: [B] ids requested by *this* device (distinct per device).

    Protocol (two collectives, both over ``axis``):
      1. bucket ids by owner shard (sort by owner, slot into a [E, cap]
         send buffer), ``all_to_all`` the id buffer — each owner receives
         the ids every peer wants from it (payload: E·cap·4 bytes).
      2. owners gather rows from local HBM ([E, cap, ...]),
         ``all_to_all`` back — each requester receives its rows
         (payload: E·cap·row_bytes), then unpermutes into request order.

    ``capacity`` bounds the per-(requester→owner) slot count. Default B —
    always exact (worst case: every id owned by one shard). Smaller values
    trade exactness for bandwidth: overflowed requests return zero rows and
    are counted in the returned ``overflow``.

    Returns ``(rows_pytree, overflow)`` where each rows leaf is [B, ...].
    Differentiable w.r.t. the table leaves (transpose = reverse exchange +
    scatter-add).
    """
    E = jax.lax.axis_size(axis)
    B = ids.shape[0]
    cap = int(capacity) if capacity else B
    ids = ids.astype(jnp.int32)
    if E == 1:
        # degenerate mesh: the multiget IS a local gather — skip routing
        idx = jnp.clip(ids, 0, rows_per_shard - 1)
        rows = jax.tree_util.tree_map(lambda tbl: tbl[idx], local_tables)
        return rows, jnp.zeros((), jnp.int32)
    owner = jnp.clip(ids // rows_per_shard, 0, E - 1)
    # rank within the owner bucket WITHOUT a sort: a running count per owner
    # (cumsum of the [B, E] owner one-hot — log-depth scan, far cheaper than
    # the bitonic argsort it replaces on TPU, and keeps request order stable)
    onehot = owner[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, E), 1)
    running = jnp.cumsum(onehot.astype(jnp.int32), axis=0)
    pos = jnp.sum(jnp.where(onehot, running, 0), axis=1) - 1  # [B]
    valid = pos < cap
    # overflowed requests get an out-of-bounds slot → dropped by the scatter
    slot = jnp.where(valid, owner * cap + pos, E * cap)
    send_ids = jnp.zeros((E * cap,), jnp.int32).at[slot].set(ids, mode="drop")

    # collective 1: ids → owners. recv_ids[e] = ids device e requests from us.
    recv_ids = jax.lax.all_to_all(send_ids.reshape(E, cap), axis, 0, 0)
    my_offset = jax.lax.axis_index(axis) * rows_per_shard
    local_idx = jnp.clip(recv_ids - my_offset, 0, rows_per_shard - 1)

    safe_slot = jnp.where(valid, slot, 0)

    def fetch(tbl):
        rows = tbl[local_idx]  # [E, cap, ...] local HBM gather
        # collective 2: rows → requesters. back[o] = rows owner o sent us.
        back = jax.lax.all_to_all(rows, axis, 0, 0)
        flat = back.reshape((E * cap,) + back.shape[2:])
        # unpermute as a GATHER (request i's row sits at its own slot) —
        # no data scatter on the hot path
        out = flat[safe_slot]
        return jnp.where(
            valid.reshape((B,) + (1,) * (out.ndim - 1)), out, 0
        )

    rows = jax.tree_util.tree_map(fetch, local_tables)
    overflow = (B - jnp.sum(valid)).astype(jnp.int32)
    return rows, overflow


def multiget_all_to_all(
    mesh: Mesh,
    tables,  # pytree of [rows, ...] arrays, all row-sharded P('model', …)
    ids: jnp.ndarray,  # [B] logical; B % model_shards == 0
    *,
    capacity: Optional[int] = None,
    return_overflow: bool = False,
):
    """Row-exchange multiget over a pytree of same-rows tables.

    Ids are batch-sharded over 'model' (each shard routes B/E requests);
    outputs come back [B, ...] batch-sharded the same way. Routing (the two
    all_to_alls) happens once; every table leaf rides the second exchange.
    """
    leaves = jax.tree_util.tree_leaves(tables)
    rows = leaves[0].shape[0]
    n_shards = mesh.shape[MODEL_AXIS]
    if rows % n_shards != 0:
        raise ValueError(f"rows={rows} not divisible by {n_shards} shards")
    if ids.shape[0] % n_shards != 0:
        raise ValueError(
            f"batch={ids.shape[0]} not divisible by {n_shards} shards"
        )
    rps = rows // n_shards

    def body(tbls, ids_local):
        rows_out, overflow = route_and_gather(
            tbls, ids_local, rows_per_shard=rps, capacity=capacity
        )
        return rows_out, overflow.reshape(1)  # rank-1 so shards concat

    table_specs = jax.tree_util.tree_map(
        lambda x: P(MODEL_AXIS, *([None] * (x.ndim - 1))), tables
    )
    out_specs = jax.tree_util.tree_map(
        lambda x: P(MODEL_AXIS, *([None] * (x.ndim - 1))), tables
    )
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(table_specs, P(MODEL_AXIS)),
        out_specs=(out_specs, P(MODEL_AXIS)),
    )
    out, overflow = fn(tables, ids)
    if return_overflow:
        return out, jnp.sum(overflow)
    return out


def lookup_all_to_all(
    mesh: Mesh,
    table: ShardedTable,
    ids: jnp.ndarray,
    *,
    capacity: Optional[int] = None,
    return_overflow: bool = False,
):
    """The BASELINE kernel: sharded-table lookup via all-to-all row exchange."""
    return multiget_all_to_all(
        mesh, table.array, ids, capacity=capacity,
        return_overflow=return_overflow,
    )


def lookup_collective(
    table_array: jnp.ndarray,  # [rows, dim], P('model', None)
    ids: jnp.ndarray,  # [B] batch-sharded over the whole mesh
    mesh: Mesh,
    *,
    capacity: Optional[int] = None,
) -> jnp.ndarray:
    """Training-path lookup: batch sharded over ('data','model') jointly.

    The embedding fetch for DP training over a mesh whose 'model' axis holds
    the table rows: the batch spreads over *every* device (both axes), each
    device exchanges rows only within its 'model' row-group, and the output
    keeps the joint batch sharding — no replication, no trailing all-gather.
    Use inside jit/value_and_grad; differentiable w.r.t. ``table_array``.
    """
    rows = table_array.shape[0]
    n_shards = mesh.shape[MODEL_AXIS]
    total = mesh.shape[DATA_AXIS] * n_shards
    if rows % n_shards != 0:
        raise ValueError(f"rows={rows} not divisible by {n_shards} shards")
    if ids.shape[0] % total != 0:
        raise ValueError(
            f"batch={ids.shape[0]} not divisible by {total} devices"
        )
    rps = rows // n_shards

    def body(tbl, ids_local):
        rows_out, _ = route_and_gather(
            tbl, ids_local, rows_per_shard=rps, capacity=capacity
        )
        return rows_out

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P((DATA_AXIS, MODEL_AXIS))),
        out_specs=P((DATA_AXIS, MODEL_AXIS), None),
    )
    return fn(table_array, ids)


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
