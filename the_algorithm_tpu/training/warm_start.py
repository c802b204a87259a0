"""Warm-start checkpoint surgery: adapt old params to a new model shape.

≡ ``pushservice/src/main/python/models/heavy_ranking/
update_warm_start_checkpoint.py`` + ``libs/warm_start_utils.py`` (SURVEY.md
§5.4): when the feature set or head set of a running model changes, don't
retrain from scratch — load the previous checkpoint, copy every variable
that still matches, and *surgically* adapt the ones whose shapes changed
(grow/shrink feature rows, remap multi-task heads by name), then train from
the stitched state.

JAX re-design: params are pytrees, so surgery is a pure tree merge — no
graph-name matching games. Overlapping slices copy; new rows/columns keep
their fresh initialization (preserving init statistics for new capacity,
which the reference does by leaving new variables to their initializer).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}/{k}" if prefix else str(k)))
    else:
        out[prefix] = np.asarray(tree)
    return out


def _overlap_copy(new: np.ndarray, old: np.ndarray) -> np.ndarray:
    """Copy the overlapping hyper-rectangle of ``old`` into ``new``."""
    if new.shape == old.shape:
        return old.astype(new.dtype)
    out = np.array(new)
    slices = tuple(
        slice(0, min(n, o)) for n, o in zip(new.shape, old.shape)
    )
    out[slices] = old[slices].astype(new.dtype)
    return out


def warm_start(
    new_params: Any,
    old_params: Any,
    *,
    rename: Optional[Dict[str, str]] = None,
    skip: Sequence[str] = (),
    head_map: Optional[Tuple[str, Sequence[int]]] = None,
) -> Tuple[Any, Dict[str, str]]:
    """Stitch ``old_params`` into the structure/shapes of ``new_params``.

    - exact path+shape match → copied
    - path match, shape mismatch → overlapping slice copied, rest keeps the
      new initialization (feature-row growth, wider layers)
    - ``rename``: old-path → new-path aliases (layer renames)
    - ``skip``: new paths to leave at fresh init (e.g. replaced heads)
    - ``head_map``: (path_prefix, old_head_indices) — reorder/select the
      trailing head axis of matching variables: new head j takes old head
      ``old_head_indices[j]`` (−1 = fresh init), the multi-task head remap
      of ``update_warm_start_checkpoint.py``

    Returns (stitched_params, report) where report maps each new path to
    'copied' | 'sliced' | 'head_mapped' | 'fresh'.
    """
    rename = rename or {}
    old_flat = _flatten(old_params)
    for old_name, new_name in rename.items():
        if old_name in old_flat:
            old_flat[new_name] = old_flat.pop(old_name)

    report: Dict[str, str] = {}
    paths_leaves = jax.tree_util.tree_flatten_with_path(new_params)
    flat, treedef = paths_leaves

    def path_str(path) -> str:
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
        return "/".join(parts)

    new_leaves = []
    for path, leaf in flat:
        name = path_str(path)
        leaf_np = np.asarray(leaf)
        if name in skip or name not in old_flat:
            report[name] = "fresh"
            new_leaves.append(leaf)
            continue
        old = old_flat[name]
        if head_map is not None and name.startswith(head_map[0]):
            idx = np.asarray(head_map[1])
            picked = np.array(leaf_np)
            # trailing axis = heads
            valid = idx >= 0
            src = np.clip(idx, 0, old.shape[-1] - 1)
            sel = old[..., src]
            picked[..., valid] = sel[..., valid].astype(leaf_np.dtype)
            new_leaves.append(picked)
            report[name] = "head_mapped"
            continue
        if old.shape == leaf_np.shape:
            new_leaves.append(old.astype(leaf_np.dtype))
            report[name] = "copied"
        elif old.ndim == leaf_np.ndim:
            new_leaves.append(_overlap_copy(leaf_np, old))
            report[name] = "sliced"
        else:
            report[name] = "fresh"
            new_leaves.append(leaf)

    stitched = jax.tree_util.tree_unflatten(
        treedef, [l for l in new_leaves]
    )
    return stitched, report
