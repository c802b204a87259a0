"""TwHIN-style two-tower embeddings with in-batch negatives.

The reference's TwHIN embeddings (user/tweet dense vectors) are trained in
the external the-algorithm-ml repo and consumed everywhere (tweet-mixer
TwHIN-ANN candidate sources, home-mixer TwHIN feature hydrators —
``tweet-mixer/.../candidate_source/twhin_ann/TwHINANNCandidateSource.scala``).
BASELINE config #3 requires: two-tower training with in-batch negatives over
**sharded entity tables** + retrieval.

TPU design: user/item id-embedding tables are row-sharded P('model', None);
towers are small MLPs over the looked-up embeddings (+ optional dense
features); the loss is in-batch sampled-softmax (each example's positive
item is every other example's negative), computed as one [B, B] MXU matmul.
Retrieval = dense top-K against the item table (brute force on-chip —
exact, and at these table sizes faster than HNSW's capability target,
SURVEY.md §2.2 note).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class TwoTowerConfig:
    num_users: int
    num_items: int
    embed_dim: int = 128
    tower_hidden: Tuple[int, ...] = (128,)
    temperature: float = 0.05
    dtype: str = "float32"
    # explicit all-to-all row exchange for the table gathers (see
    # parallel/sharded_table.lookup_collective); batch % devices == 0.
    explicit_lookup: bool = False


class Tower(nn.Module):
    hidden: Tuple[int, ...]
    out_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, width in enumerate(self.hidden):
            x = nn.Dense(width, name=f"dense_{i}")(x)
            x = nn.relu(x)
        x = nn.Dense(self.out_dim, name="out")(x)
        # l2-normalized output → dot product is cosine. rsqrt(Σx²+ε) instead
        # of linalg.norm: norm's gradient is NaN at exactly-zero rows (dead
        # relu + zero bias produces them at init)
        return x * jax.lax.rsqrt(
            jnp.sum(x * x, axis=-1, keepdims=True) + 1e-12
        )


class TwoTower(nn.Module):
    """User/item towers over row-sharded id-embedding tables."""

    config: TwoTowerConfig

    @nn.compact
    def __call__(
        self, user_ids: jnp.ndarray, item_ids: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        user_table = self.param(
            "user_table",
            nn.initializers.normal(0.02),
            (cfg.num_users, cfg.embed_dim),
        )
        item_table = self.param(
            "item_table",
            nn.initializers.normal(0.02),
            (cfg.num_items, cfg.embed_dim),
        )
        if cfg.explicit_lookup:
            from the_algorithm_tpu.core.mesh import get_mesh
            from the_algorithm_tpu.parallel.sharded_table import lookup_collective

            mesh = get_mesh()
            u_rows = lookup_collective(user_table, user_ids, mesh)
            v_rows = lookup_collective(item_table, item_ids, mesh)
        else:
            u_rows = user_table[user_ids]
            v_rows = item_table[item_ids]
        u = Tower(cfg.tower_hidden, cfg.embed_dim, name="user_tower")(u_rows)
        v = Tower(cfg.tower_hidden, cfg.embed_dim, name="item_tower")(v_rows)
        return u, v

    def item_embeddings(self, item_ids: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        item_table = self.variables["params"]["item_table"]
        return Tower(cfg.tower_hidden, cfg.embed_dim, name="item_tower")(
            item_table[item_ids]
        )


def in_batch_softmax_loss(
    u: jnp.ndarray,  # [B, D] user embeddings
    v: jnp.ndarray,  # [B, D] positive item embeddings
    temperature: float,
    item_ids: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Sampled softmax where the batch is the negative pool.

    logits[i, j] = ⟨u_i, v_j⟩/τ ; label = diagonal. Duplicate positive items
    in the batch are masked out of each other's negatives (accidental-hit
    masking) when ``item_ids`` is given.
    """
    logits = jnp.einsum(
        "bd,cd->bc", u, v, preferred_element_type=jnp.float32
    ) / temperature
    B = logits.shape[0]
    if item_ids is not None:
        dup = item_ids[:, None] == item_ids[None, :]
        off_diag_dup = dup & ~jnp.eye(B, dtype=bool)
        # large finite negative, not -inf: -inf poisons the softmax gradient
        logits = jnp.where(off_diag_dup, -1e9, logits)
    labels = jnp.arange(B)
    return jnp.mean(
        -jax.nn.log_softmax(logits, axis=-1)[jnp.arange(B), labels]
    )


def retrieve_top_k(
    query: jnp.ndarray,  # [Q, D]
    items: jnp.ndarray,  # [N, D] all item embeddings
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact brute-force cosine top-K — the VecDB/HNSW capability on-chip."""
    scores = jnp.einsum(
        "qd,nd->qn", query, items, preferred_element_type=jnp.float32
    )
    top_scores, top_ids = jax.lax.top_k(scores, k)
    return top_ids, top_scores


PARTITION_RULES = [
    (r"user_table", P("model", None)),
    (r"item_table", P("model", None)),
    (r".*", P()),
]
