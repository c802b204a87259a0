"""Producer-producer similarity graph: follower-cosine over the follow matrix.

Reference: ``src/scala/com/twitter/simclusters_v2/scalding/TopUsersSimilarityGraph.scala``
(``topUsers:42``, ``makeGraph:188``, ``run:500``) — top-20M producers by
follower count, pairwise cosine similarity of follower columns, top-D
neighbors per node, symmetrized, optional self-loops.

TPU re-design: the follower matrix F [U_followers × P] lives as a fixed-width
follow adjacency; sim(p,q) = |followers(p) ∩ followers(q)| / (√deg(p)·√deg(q))
is computed blockwise as Fᵀ·F on the MXU (one [P_block × P] panel at a time,
so the P×P product never materializes), then per-row top-D + symmetrization.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from the_algorithm_tpu.ops.sparse import PAD_ID
from the_algorithm_tpu.simclusters.known_for import Graph


def follow_matrix_from_adjacency(
    producer_ids: jnp.ndarray,  # [U, D] int32 follow edges, PAD_ID padded
    num_producers: int,
) -> jnp.ndarray:
    """Dense binary [U, P] follow matrix (for modest P; blocks for big P)."""
    valid = producer_ids != PAD_ID
    safe = jnp.where(valid, producer_ids, 0)
    onehot = jax.nn.one_hot(safe, num_producers, dtype=jnp.float32)
    return jnp.where(valid[..., None], onehot, 0.0).sum(axis=1)


def cosine_similarity_graph(
    follow: jnp.ndarray,  # [U, P] (dense or blockwise caller)
    *,
    top_k: int,
    min_similarity: float = 0.0,
    include_self_loops: bool = True,
    block_size: int = 512,
) -> Graph:
    """Top-K follower-cosine neighbors per producer.

    Self-loops (sim=1) are included by default — ``TopUsersSimilarityGraph``
    adds them so KnownFor sees the node's own membership.
    """
    P = follow.shape[1]
    deg = jnp.sum(follow, axis=0)  # [P]
    inv_norm = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-30)), 0.0)

    n_blocks = (P + block_size - 1) // block_size
    pad_p = n_blocks * block_size
    if pad_p != P:
        follow = jnp.pad(follow, ((0, 0), (0, pad_p - P)))
        inv_norm = jnp.pad(inv_norm, (0, pad_p - P))

    def block(i):
        cols = jax.lax.dynamic_slice_in_dim(follow, i * block_size, block_size, axis=1)
        co = jnp.einsum("up,uq->pq", cols, follow, preferred_element_type=jnp.float32)
        inv_b = jax.lax.dynamic_slice_in_dim(inv_norm, i * block_size, block_size)
        sim = co * inv_b[:, None] * inv_norm[None, :]
        if not include_self_loops:
            row_ids = i * block_size + jnp.arange(block_size)
            sim = sim.at[jnp.arange(block_size), row_ids].set(0.0)
        sim = jnp.where(sim >= min_similarity, sim, 0.0)
        scores, ids = jax.lax.top_k(sim, top_k)
        ids = jnp.where((scores > 0) & (ids < P), ids.astype(jnp.int32), PAD_ID)
        scores = jnp.where(ids != PAD_ID, scores, 0.0)
        return ids, scores

    ids_blocks, score_blocks = jax.lax.map(block, jnp.arange(n_blocks))
    ids = ids_blocks.reshape(pad_p, top_k)[:P]
    scores = score_blocks.reshape(pad_p, top_k)[:P]
    return Graph(ids, scores)


def symmetrize(graph: Graph) -> Graph:
    """Make the top-K graph symmetric: if p lists q, ensure q lists p.

    Union via dense max for modest P (the Scalding job symmetrizes by a
    flatMap+groupBy union); keeps the larger of the two directed weights.
    """
    P, D = graph.nbr_ids.shape
    valid = graph.nbr_ids != PAD_ID
    safe = jnp.where(valid, graph.nbr_ids, 0)
    rows = jnp.broadcast_to(jnp.arange(P)[:, None], (P, D))
    w = jnp.where(valid, graph.nbr_weights, 0.0)
    dense = jnp.zeros((P, P), jnp.float32)
    dense = dense.at[rows.reshape(-1), safe.reshape(-1)].max(w.reshape(-1))
    dense = jnp.maximum(dense, dense.T)
    scores, ids = jax.lax.top_k(dense, D)
    ids = jnp.where(scores > 0, ids.astype(jnp.int32), PAD_ID)
    scores = jnp.where(ids != PAD_ID, scores, 0.0)
    return Graph(ids, scores)
