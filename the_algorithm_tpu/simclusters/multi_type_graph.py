"""Multi-type engagement graph assembly with right-node top-K truncation.

≡ ``src/scala/com/twitter/simclusters_v2/scalding/multi_type_graph/
assemble_multi_type_graph/AssembleMultiTypeGraph.scala`` (SURVEY.md §2.1
"SimClusters BQ/scio pipeline"): combine per-engagement-type bipartite edges
(user → {fav, retweet, reply, follow, click} → right node) into one typed
graph, truncating each right node to its top-K heaviest left neighbors —
the input for multi-type-graph embeddings and the engagement-based
cluster→tweet index generation jobs (``scio/bq_generation``).

TPU design: edges arrive as typed COO batches; assembly is one multi-key
sort by (right, type, -weight) + per-(right,type) rank scatter into a fixed
[R, E, K] table — the same sorted-rank pattern as the cluster-index build.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from the_algorithm_tpu.ops.sparse import PAD_ID


class MultiTypeGraph(NamedTuple):
    """right node → per edge-type top-K left neighbors."""

    left_ids: jnp.ndarray  # [R, E, K] int32, PAD_ID padded
    weights: jnp.ndarray  # [R, E, K] float32


def assemble(
    left: jnp.ndarray,  # [B] int32 left (user) ids
    right: jnp.ndarray,  # [B] int32 right node ids (< num_right)
    edge_type: jnp.ndarray,  # [B] int32 (< num_types)
    weight: jnp.ndarray,  # [B] float32
    *,
    num_right: int,
    num_types: int,
    top_k: int,
) -> MultiTypeGraph:
    """Assemble + truncate (``getTopKRightNounsWithFrequencies`` analog).

    Duplicate (left, right, type) edges should be pre-summed by the caller
    (or the heaviest wins the slot ranking — matching the reference's
    aggregate-then-truncate order requires pre-aggregation).
    """
    B = left.shape[0]
    # composite sort key: (right, type) ascending, weight descending
    group = right * num_types + edge_type
    g_s, negw_s, left_s = jax.lax.sort(
        (group, -weight, left), num_keys=2
    )
    w_s = -negw_s

    idx = jnp.arange(B)
    prev = jnp.concatenate([jnp.full((1,), -1, g_s.dtype), g_s[:-1]])
    is_start = g_s != prev
    run_start = jax.lax.cummax(jnp.where(is_start, idx, 0), axis=0)
    rank = idx - run_start

    ok = (rank < top_k) & (g_s >= 0) & (g_s < num_right * num_types)
    out_r = jnp.where(ok, g_s // num_types, num_right)
    out_e = jnp.where(ok, g_s % num_types, num_types)
    out_k = jnp.where(ok, rank, top_k)

    left_table = jnp.full((num_right, num_types, top_k), PAD_ID, jnp.int32)
    w_table = jnp.zeros((num_right, num_types, top_k), jnp.float32)
    left_table = left_table.at[out_r, out_e, out_k].set(left_s, mode="drop")
    w_table = w_table.at[out_r, out_e, out_k].set(w_s, mode="drop")
    return MultiTypeGraph(left_table, w_table)


def truncated_similarity(
    graph: MultiTypeGraph, a: jnp.ndarray, b: jnp.ndarray
) -> jnp.ndarray:
    """Weighted overlap of two right nodes' truncated neighbor sets, summed
    over edge types (the multi-type similarity used downstream)."""
    la = graph.left_ids[a]  # [E, K]
    lb = graph.left_ids[b]
    wa = graph.weights[a]
    wb = graph.weights[b]
    eq = (la[:, :, None] == lb[:, None, :]) & (la[:, :, None] != PAD_ID)
    return jnp.sum(eq * wa[:, :, None] * wb[:, None, :])
