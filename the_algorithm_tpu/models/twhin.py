"""TwHIN: heterogeneous-network knowledge-graph embeddings.

The reference consumes TwHIN user/tweet embeddings everywhere (hydrators in
``home-mixer/.../TwhinUserNegativeFeatureHydrator``, tweet-mixer TwHIN-ANN
sources); training lives in the external the-algorithm-ml repo (SURVEY.md
§2.1 "External-but-referenced"). TwHIN (el-Kishky et al. 2022,
arXiv:2202.05387) is a TransE-style model over a multi-relation engagement
graph: score(u, r, v) = ⟨e_u + t_r, e_v⟩ with per-relation translation
vectors, trained with in-batch negatives.

TPU design: entity tables row-sharded P('model', None) (the tables are the
big memory: 100M+ entities in prod); the translation table is tiny and
replicated. The loss computes all B×B in-batch logits as one MXU matmul.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

RELATIONS = (
    "follows", "favorites", "replies", "retweets", "mentions", "clicks",
)


@dataclasses.dataclass(frozen=True)
class TwhinConfig:
    num_users: int
    num_items: int  # tweets/entities on the right side
    embed_dim: int = 128
    num_relations: int = len(RELATIONS)
    temperature: float = 1.0
    # explicit all-to-all row exchange for the big-table gathers (the
    # PS-multiget analog; requires batch % mesh devices == 0 and table rows
    # % model shards == 0). Default lets XLA pick the gather strategy.
    explicit_lookup: bool = False


class Twhin(nn.Module):
    config: TwhinConfig

    @nn.compact
    def __call__(
        self,
        user_ids: jnp.ndarray,  # [B]
        relation_ids: jnp.ndarray,  # [B]
        item_ids: jnp.ndarray,  # [B]
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (translated user embs [B, D], item embs [B, D])."""
        cfg = self.config
        user_table = self.param(
            "user_table", nn.initializers.normal(0.02),
            (cfg.num_users, cfg.embed_dim),
        )
        item_table = self.param(
            "item_table", nn.initializers.normal(0.02),
            (cfg.num_items, cfg.embed_dim),
        )
        rel_table = self.param(
            "relation_table", nn.initializers.normal(0.02),
            (cfg.num_relations, cfg.embed_dim),
        )
        if cfg.explicit_lookup:
            from the_algorithm_tpu.core.mesh import get_mesh
            from the_algorithm_tpu.parallel.sharded_table import lookup_collective

            mesh = get_mesh()
            u = lookup_collective(user_table, user_ids, mesh)
            v = lookup_collective(item_table, item_ids, mesh)
        else:
            u = user_table[user_ids]
            v = item_table[item_ids]
        u = u + rel_table[relation_ids]  # e_u + t_r
        return u, v


def twhin_loss(
    u_translated: jnp.ndarray,  # [B, D]
    v: jnp.ndarray,  # [B, D]
    item_ids: jnp.ndarray,  # [B] for accidental-hit masking
    temperature: float = 1.0,
) -> jnp.ndarray:
    """In-batch sampled softmax over ⟨e_u + t_r, e_v⟩ logits."""
    logits = jnp.einsum(
        "bd,cd->bc", u_translated, v, preferred_element_type=jnp.float32
    ) / temperature
    B = logits.shape[0]
    dup = (item_ids[:, None] == item_ids[None, :]) & ~jnp.eye(B, dtype=bool)
    logits = jnp.where(dup, -1e9, logits)
    labels = jnp.arange(B)
    return jnp.mean(-jax.nn.log_softmax(logits, axis=-1)[labels, labels])


def entity_embeddings(params, table: str = "item_table") -> jnp.ndarray:
    """Export a table for ANN serving (consumed by TwHINANNEngine)."""
    return params["params"][table]


PARTITION_RULES = [
    (r"user_table", P("model", None)),
    (r"item_table", P("model", None)),
    (r".*", P()),  # relation table is tiny → replicated
]
