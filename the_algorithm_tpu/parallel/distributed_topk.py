"""Distributed top-K: per-shard scan + cross-shard merge.

≡ Earlybird's partition scatter-gather (``src/java/com/twitter/search/
earlybird_root/`` fan-out, per-partition scoring, root merge — SURVEY.md
§2.3): every shard computes a local top-K over the rows it owns, the K
winners are all-gathered over the ``model`` axis, and a final top-K picks
the global winners. Correct because the global top-K is always contained in
the union of per-shard top-Ks.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from the_algorithm_tpu.core.mesh import MODEL_AXIS


def _local_then_merge(scores, payload, k: int):
    """Inside shard_map over 'model': local top-k, all_gather, global top-k."""
    local_scores, local_idx = jax.lax.top_k(scores, k)
    local_payload = jnp.take_along_axis(payload, local_idx, axis=-1)
    all_scores = jax.lax.all_gather(local_scores, MODEL_AXIS, axis=-1, tiled=True)
    all_payload = jax.lax.all_gather(local_payload, MODEL_AXIS, axis=-1, tiled=True)
    top_scores, top_idx = jax.lax.top_k(all_scores, k)
    top_payload = jnp.take_along_axis(all_payload, top_idx, axis=-1)
    return top_scores, top_payload


def sharded_topk(
    mesh: Mesh,
    scores: jnp.ndarray,  # [..., N] sharded P(..., 'model') on last axis
    payload: jnp.ndarray,  # [..., N] ids aligned with scores
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Global top-k of a model-sharded score axis. Returns replicated [..., k].

    ``scores``' last axis is sharded over 'model'; batch axes (if any) ride
    'data'. Payload is typically candidate ids.
    """
    ndim = scores.ndim
    in_spec = P(*([None] * (ndim - 1) + [MODEL_AXIS]))
    out_spec = P()
    fn = jax.shard_map(
        lambda s, p: _local_then_merge(s, p, k),
        mesh=mesh,
        in_specs=(in_spec, in_spec),
        out_specs=(out_spec, out_spec),
        check_vma=False,  # all_gather output IS replicated over 'model'; VMA can't infer it
    )
    return fn(scores, payload)


def sharded_argtopk_batched(
    mesh: Mesh,
    score_fn: Callable[[jnp.ndarray], jnp.ndarray],
    items: jnp.ndarray,  # [N, ...] model-sharded item table
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Score a sharded item table with ``score_fn`` then merge global top-k.

    The brute-force-ANN building block: each shard scores only its rows.
    """
    n = items.shape[0]

    def local(items_shard):
        scores = score_fn(items_shard)  # [n_local]
        idx = jnp.arange(items_shard.shape[0])
        shard = jax.lax.axis_index(MODEL_AXIS)
        global_idx = idx + shard * items_shard.shape[0]
        ls, li = jax.lax.top_k(scores, k)
        lp = global_idx[li]
        all_s = jax.lax.all_gather(ls, MODEL_AXIS, axis=0, tiled=True)
        all_p = jax.lax.all_gather(lp, MODEL_AXIS, axis=0, tiled=True)
        ts, ti = jax.lax.top_k(all_s, k)
        return ts, all_p[ti]

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(MODEL_AXIS),),
        out_specs=(P(), P()),
        check_vma=False,  # all_gather output IS replicated over 'model'; VMA can't infer it
    )
    return fn(items)
