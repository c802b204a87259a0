"""Partition-rule registry: regex → PartitionSpec over parameter pytrees.

Replaces the reference's per-variable partitioners
(``tf.min_max_variable_partitioner`` in ``twml/twml/layers/full_sparse.py:124-135``)
with declarative regex rules applied to flattened parameter paths, the
standard JAX-ecosystem pattern.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

PartitionRules = Sequence[Tuple[str, P]]


def tree_path_names(tree: Any) -> Any:
    """Pytree of '/'-joined key-path names with the same structure as ``tree``."""

    def name_of(path) -> str:
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "name"):
                parts.append(str(p.name))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
            else:
                parts.append(str(p))
        return "/".join(parts)

    paths_and_leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    names = [name_of(path) for path, _ in paths_and_leaves]
    treedef = jax.tree_util.tree_structure(tree)
    return jax.tree_util.tree_unflatten(treedef, names)


def match_partition_rules(rules: PartitionRules, tree: Any) -> Any:
    """Return a pytree of PartitionSpec matching regex ``rules`` to leaf paths.

    Scalars and size-1 leaves are never partitioned. Falls back to replicated
    (P()) when no rule matches and a rule ('.*', P()) is present; otherwise
    raises, so missing rules are caught early.
    """

    names = tree_path_names(tree)

    def spec_for(name: str, leaf: Any) -> P:
        shape = np.shape(leaf)
        if len(shape) == 0 or int(np.prod(shape)) == 1:
            return P()
        for pattern, spec in rules:
            if re.search(pattern, name):
                return spec
        raise ValueError(f"no partition rule matched param '{name}'")

    return jax.tree_util.tree_map(spec_for, names, tree)


def named_sharding(mesh: Mesh, spec: P) -> NamedSharding:
    return NamedSharding(mesh, spec)


def tree_shardings(mesh: Mesh, spec_tree: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s),
        spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )


def with_sharding_constraint(x: Any, spec: P, mesh: Optional[Mesh] = None):
    """Sharding-constrain ``x`` inside jit; no-op outside a mesh context."""
    if mesh is not None:
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
    return jax.lax.with_sharding_constraint(x, spec)


def shard_tree(tree: Any, mesh: Mesh, spec_tree: Any) -> Any:
    """Device-put a host pytree onto the mesh with the given spec pytree."""
    shardings = tree_shardings(mesh, spec_tree)
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)
