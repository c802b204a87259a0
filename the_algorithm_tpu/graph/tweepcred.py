"""Tweepcred: weighted PageRank → user reputation [0, 100].

≡ ``src/scala/com/twitter/graph/batch/job/tweepcred/``:
``WeightedPageRank.doPageRank:163`` (power iteration, damping via reset
probability, convergence threshold 0.001), ``UserMass.scala`` (prior mass
heuristics), ``Reputation.scaledReputation`` (log-linear map to 0-100) and
``Reputation.adjustReputationsPostCalculation`` (follower/following
post-adjustment).

TPU re-design: the Scalding iteration is a jitted ``lax.while_loop`` power
iteration over a fixed-width weighted out-edge adjacency — each step one
segment-scatter (the shuffle) — data-shardable over the node axis.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from the_algorithm_tpu.ops.sparse import PAD_ID


@dataclasses.dataclass(frozen=True)
class PageRankParams:
    """≡ WeightedPageRank args (defaults from the job)."""

    reset_prob: float = 0.15  # RESET_PROB default
    threshold: float = 0.001  # convergence: total L1 diff
    max_iterations: int = 20


class OutEdges(NamedTuple):
    """Weighted out-adjacency [N, D] (PAD_ID padded), weights ≥ 0."""

    dst: jnp.ndarray  # int32
    weight: jnp.ndarray  # float32


def weighted_pagerank(
    edges: OutEdges,
    prior_mass: jnp.ndarray,  # [N] user-mass prior (uniform if None-like)
    params: PageRankParams = PageRankParams(),
) -> jnp.ndarray:
    """Power iteration: pr ← reset·prior + (1-reset)·WT·pr (+ dangling mass).

    Out-edge weights are row-normalized; dangling nodes redistribute via the
    prior (the reference folds them into reset mass).
    """
    N = edges.dst.shape[0]
    valid = edges.dst != PAD_ID
    w = jnp.where(valid, edges.weight, 0.0)
    row_sum = jnp.sum(w, axis=1)
    w_norm = w / jnp.maximum(row_sum[:, None], 1e-30)
    dangling = row_sum <= 0

    prior = prior_mass / jnp.maximum(jnp.sum(prior_mass), 1e-30)
    safe_dst = jnp.where(valid, edges.dst, 0)

    def body(carry):
        pr, _, it = carry
        contrib = pr[:, None] * w_norm  # [N, D]
        new = jnp.zeros((N,), jnp.float32).at[safe_dst.reshape(-1)].add(
            jnp.where(valid, contrib, 0.0).reshape(-1)
        )
        dangling_mass = jnp.sum(jnp.where(dangling, pr, 0.0))
        new = (
            params.reset_prob * prior
            + (1 - params.reset_prob) * (new + dangling_mass * prior)
        )
        diff = jnp.sum(jnp.abs(new - pr))
        return new, diff, it + 1

    def cond(carry):
        _, diff, it = carry
        return (diff > params.threshold) & (it < params.max_iterations)

    pr0 = prior
    pr, _, _ = jax.lax.while_loop(
        cond, body, (pr0, jnp.float32(jnp.inf), jnp.int32(0))
    )
    return pr


def scaled_reputation(pagerank: jnp.ndarray) -> jnp.ndarray:
    """≡ ``Reputation.scaledReputation``: 130 + 5.21·ln(pr), clipped [0,100]."""
    raw = jnp.where(pagerank < 1e-20, 1e-20, pagerank)
    e = 130.0 + 5.21 * jnp.log(raw)
    e = jnp.round(e)
    e = jnp.clip(e, 0.0, 100.0)
    return jnp.where(pagerank < 1e-20, 0.0, e)


def adjust_post_calculation(
    mass: jnp.ndarray,  # [N] pagerank mass
    num_followers: jnp.ndarray,  # [N] int
    num_followings: jnp.ndarray,  # [N] int
) -> jnp.ndarray:
    """≡ ``Reputation.adjustReputationsPostCalculation``: downweight
    low-follower/high-following accounts (follow-spam heuristic)."""
    thresh_friends = 2500
    ratio_thresh = 0.6
    c = 3.0
    max_div = 50.0
    ratio = (1.0 + num_followings) / (1.0 + num_followers)
    loglog = jnp.log(jnp.log(jnp.maximum(num_followings.astype(jnp.float32), 3.0)))
    div = jnp.exp(c * (ratio - ratio_thresh) * loglog)
    div = jnp.clip(div, 1.0, max_div)
    return jnp.where(num_followings > thresh_friends, mass / div, mass)


def user_mass_prior(
    is_suspended: jnp.ndarray,
    is_verified: jnp.ndarray,
    account_age_days: jnp.ndarray,
    has_valid_device: jnp.ndarray,
    is_restricted: jnp.ndarray,
) -> jnp.ndarray:
    """≡ ``UserMass.getUserMass`` heuristics (device/age weights, restricted
    multiplier, suspended → 0, verified → full mass)."""
    device_w = 0.5
    age_w = 0.2
    restricted_mult = 0.1
    age_factor = jnp.clip(account_age_days.astype(jnp.float32) / 365.0, 0.0, 1.0)
    mass = (
        1.0
        + device_w * has_valid_device.astype(jnp.float32)
        + age_w * age_factor
    )
    mass = jnp.where(is_verified, 100.0, mass)
    mass = jnp.where(is_restricted, mass * restricted_mult, mass)
    mass = jnp.where(is_suspended, 0.0, mass)
    return mass
