"""WALS (weighted alternating least squares) collaborative filtering.

≡ cr-mixer's ``similarity_engine/ConsumerBasedWalsSimilarityEngine.scala``
(SURVEY.md §2.1): an implicit-feedback matrix factorization over user↔tweet
engagements; at serve time the consumer embedding is *solved on the fly*
from the user's recent engaged tweets against the fixed item factors (one
small ridge solve), then similar tweets come from a dense top-K against the
item-factor table.

TPU design: ALS is MXU-shaped — each alternating update is a batch of d×d
normal-equation solves (``jnp.linalg.solve`` vmapped over users/items), and
the confidence-weighted terms are one matmul per side (Hu-Koren-Volinsky
implicit ALS). Factor tables shard row-wise over 'model' like every other
embedding table; the serve-time solve is d×d regardless of corpus size.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class WalsConfig:
    dim: int = 32
    reg: float = 0.1  # λ ridge
    alpha: float = 10.0  # implicit confidence: c = 1 + α·r
    iterations: int = 10


class WalsModel(NamedTuple):
    user_factors: jnp.ndarray  # [U, d]
    item_factors: jnp.ndarray  # [T, d]


def _solve_side(
    fixed: jnp.ndarray,  # [N, d] the side being held fixed
    ratings: jnp.ndarray,  # [M, N] engagement strengths (0 = no edge)
    reg: float,
    alpha: float,
) -> jnp.ndarray:
    """One ALS half-step: for every row m solve
    (FᵀF + Fᵀ(C_m−I)F + λI) x = Fᵀ C_m p_m  (implicit ALS normal equations).
    """
    d = fixed.shape[1]
    gram = fixed.T @ fixed  # [d, d] shared across rows (the big matmul)

    def one(r):  # r: [N]
        c_minus_1 = alpha * r
        p = (r > 0).astype(fixed.dtype)
        a = gram + (fixed.T * c_minus_1) @ fixed + reg * jnp.eye(d, dtype=fixed.dtype)
        b = fixed.T @ ((1.0 + c_minus_1) * p)
        return jnp.linalg.solve(a, b)

    return jax.vmap(one)(ratings)


def train_wals(
    ratings: jnp.ndarray,  # [U, T] engagement strengths
    config: WalsConfig,
    key=None,
) -> WalsModel:
    """Full alternating optimization (offline job; jittable end-to-end)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    ku, ki = jax.random.split(key)
    U, T = ratings.shape
    x = jax.random.normal(ku, (U, config.dim)) * 0.1
    y = jax.random.normal(ki, (T, config.dim)) * 0.1

    def step(carry, _):
        x, y = carry
        x = _solve_side(y, ratings, config.reg, config.alpha)
        y = _solve_side(x, ratings.T, config.reg, config.alpha)
        return (x, y), None

    (x, y), _ = jax.lax.scan(step, (x, y), None, length=config.iterations)
    # final user half-step so user_factors are exactly the solve against the
    # *returned* item_factors (serve-time consumer_embedding then reproduces
    # a training user's vector bit-for-bit)
    x = _solve_side(y, ratings, config.reg, config.alpha)
    return WalsModel(x, y)


def item_gram(item_factors: jnp.ndarray) -> jnp.ndarray:
    """YᵀY over the full corpus — precompute once per factor refresh."""
    return item_factors.T @ item_factors


def consumer_embedding(
    item_factors: jnp.ndarray,  # [T, d]
    engaged_items: jnp.ndarray,  # [H] int32 (history, may be padded < 0)
    engagement_weights: jnp.ndarray,  # [H]
    reg: float = 0.1,
    alpha: float = 10.0,
    gram: jnp.ndarray = None,  # [d, d] item_gram(item_factors)
) -> jnp.ndarray:
    """Serve-time consumer vector from history (the on-the-fly WALS solve —
    what the reference computes against its saved model).

    With ``gram`` (YᵀY over the whole corpus) the solve is *identical* to a
    training half-step for that user — implicit ALS's normal equations
    include every item at confidence 1 / preference 0. Without it the
    history-only gram is a cheaper approximation (fine for large alpha).
    """
    d = item_factors.shape[1]
    valid = engaged_items >= 0
    safe = jnp.where(valid, engaged_items, 0)
    f = item_factors[safe] * valid[:, None]  # [H, d]
    r = jnp.where(valid, engagement_weights, 0.0)
    c_minus_1 = alpha * r
    base = gram if gram is not None else f.T @ f
    a = base + (f.T * c_minus_1) @ f + reg * jnp.eye(d, dtype=f.dtype)
    b = f.T @ ((1.0 + c_minus_1) * (r > 0))
    return jnp.linalg.solve(a, b)


def similar_items(
    consumer_vec: jnp.ndarray,  # [d]
    item_factors: jnp.ndarray,  # [T, d]
    k: int,
    exclude: jnp.ndarray = None,  # [H] engaged items to drop
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense top-K against the factor table (one MXU matvec)."""
    scores = item_factors @ consumer_vec
    if exclude is not None:
        hits = (jnp.arange(scores.shape[0])[:, None] == exclude[None, :]).any(-1)
        scores = jnp.where(hits, -jnp.inf, scores)
    top, idx = jax.lax.top_k(scores, k)
    return idx, top
