"""Hashed sparse logistic-regression compute.

≡ libtwml's ``BinarySparseTensorDenseMatMul``
(``twml/libtwml/src/ops/binary_sparse_dense_matmul.cpp``) + twml's
``FullSparse`` layer (``twml/twml/layers/full_sparse.py:214-275``): examples
arrive as (hashed-index, value) pairs; the logit is a sparse dot against a
2**bits weight vector.

TPU-native: examples are **padded fixed-width** — ``indices [B, W] int32``
(pad = 0 with mask), ``values [B, W] f32`` — and the sparse matmul is an
embedding gather + masked contraction, fully differentiable (the gather's
transpose is a scatter-add, which XLA emits for the backward pass; the
reference codes the same adjoint by hand in C++).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class SparseBatch(NamedTuple):
    """Padded fixed-width hashed sparse features for one batch."""

    indices: jnp.ndarray  # [B, W] int32 in [0, num_buckets)
    values: jnp.ndarray  # [B, W] float32
    mask: jnp.ndarray  # [B, W] bool — False in padding


def sparse_logits(
    batch: SparseBatch,
    weights: jnp.ndarray,  # [num_buckets, O] or [num_buckets]
    bias: Optional[jnp.ndarray] = None,  # [O] or scalar
) -> jnp.ndarray:
    """logits[b, o] = Σ_w mask·value·weights[index, o]  (+ bias)."""
    squeeze = weights.ndim == 1
    w = weights[:, None] if squeeze else weights  # [N, O]
    gathered = w[batch.indices]  # [B, W, O]
    vals = jnp.where(batch.mask, batch.values, 0.0)
    logits = jnp.einsum("bw,bwo->bo", vals, gathered)
    if bias is not None:
        logits = logits + bias
    return logits[..., 0] if squeeze else logits


def binary_sparse_logits(
    indices: jnp.ndarray,  # [B, W] int32
    mask: jnp.ndarray,  # [B, W] bool
    weights: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Binary-feature fast path (values ≡ 1), the op the C++ kernel special-cases."""
    batch = SparseBatch(indices, jnp.ones(indices.shape, jnp.float32), mask)
    return sparse_logits(batch, weights, bias)
