"""MaskNet multi-task heavy ranker — the recap ranking model.

The reference serves "MaskNet" (Wang et al. 2021, arXiv:2102.07619) from
the-algorithm-ml through navi, scoring ~6000 features per candidate into
~15-20 engagement heads (``home-mixer/server/.../model/PredictedScoreFeature.scala:62-290``),
combined by a weighted sum with negative-head handling
(``product/scored_tweets/scorer/NaviModelScorer.scala:143-177``).

Architecture (parallel MaskNet): shared bottom of N instance-guided
MaskBlocks — ``mask = W2·relu(W1·x)`` applied multiplicatively to a
layer-normed projection of the (same) input — concatenated and fed to a
per-task MLP head stack. Everything is MXU-shaped dense matmuls in bfloat16
with float32 accumulations; batch rides the 'data' mesh axis, wide hidden
layers may shard over 'model'.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MaskNetConfig:
    num_features: int = 6000  # home-mixer/README.md:22-24
    num_heads: int = 15  # PredictedScoreFeature.scala head registry
    mask_blocks: int = 4
    block_dim: int = 512
    aggregation_dim: int = 128  # bottleneck inside the instance-guided mask
    head_hidden: Tuple[int, ...] = (256, 128)
    dtype: str = "bfloat16"

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


class MaskNet(nn.Module):
    """Parallel MaskNet with multi-task sigmoid heads.

    The G parallel instance-guided mask blocks (MaskNet paper §3.2,
    block-on-input) are **fused**: the per-block input projections — G×
    Dense(F→A) for the mask aggregations and G× Dense(F→D, no bias) for the
    hidden branches — become two wide matmuls F→G·A and F→G·D, so the MXU
    sees two large GEMMs and the 6000-wide input is read from HBM once per
    branch instead of once per block. The tiny per-block A→D mask
    projections stay block-diagonal as one batched einsum over the G axis.
    """

    config: MaskNetConfig

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        """features [B, F] float32 → logits [B, H]."""
        cfg = self.config
        dt = cfg.compute_dtype
        G, D, A = cfg.mask_blocks, cfg.block_dim, cfg.aggregation_dim
        x = nn.LayerNorm(dtype=jnp.float32, name="input_ln")(features)
        x = x.astype(dt)

        # instance-guided masks, all blocks at once: F→G·A, relu, then the
        # block-diagonal A→D projection as a G-batched matmul
        agg = nn.relu(nn.Dense(G * A, dtype=dt, name="mask_agg")(x))
        agg = agg.reshape(-1, G, A)
        # fan_in must stay A per block (G is a batch axis, not receptive
        # field) so the init matches the per-block Dense(A→D) this fuses
        mask_proj = self.param(
            "mask_proj",
            nn.initializers.variance_scaling(
                1.0, "fan_in", "truncated_normal",
                in_axis=-2, out_axis=-1, batch_axis=0,
            ),
            (G, A, D), jnp.float32,
        )
        mask_bias = self.param("mask_proj_bias", nn.initializers.zeros, (G, D))
        mask = (
            jnp.einsum(
                "bga,gad->bgd", agg, mask_proj.astype(dt),
                preferred_element_type=jnp.float32,
            ).astype(dt)
            + mask_bias.astype(dt)
        )

        # hidden branches, all blocks at once: F→G·D (bias-free), per-block
        # layernorm: normalization reduces over each D chunk, and the (G, D)
        # feature_axes give every block its own scale/bias (matching the
        # reference's independent per-block LayerNorm params)
        hidden = nn.Dense(G * D, use_bias=False, dtype=dt, name="hidden")(x)
        hidden = nn.LayerNorm(
            dtype=dt, reduction_axes=-1, feature_axes=(-2, -1), name="hidden_ln"
        )(hidden.reshape(-1, G, D))
        out = nn.LayerNorm(
            dtype=dt, reduction_axes=-1, feature_axes=(-2, -1), name="out_ln"
        )(mask * hidden)
        h = nn.relu(out).reshape(-1, G * D)

        for j, width in enumerate(cfg.head_hidden):
            h = nn.Dense(width, dtype=dt, name=f"trunk_{j}")(h)
            h = nn.relu(h)
        logits = nn.Dense(
            cfg.num_heads, dtype=jnp.float32, name="heads"
        )(h.astype(jnp.float32))
        return logits


# -- weighted multi-head score (NaviModelScorer.computeWeightedModelScore) ---

EPSILON = 1e-6


def weighted_model_score(
    probs: jnp.ndarray,  # [..., H] per-head predicted probabilities
    weights: jnp.ndarray,  # [H] model weights (negative for bad outcomes)
) -> jnp.ndarray:
    """≡ ``NaviModelScorer.computeWeightedModelScore:143-177``.

    combined = Σ w_h·p_h ; negative combined scores are shifted/rescaled into
    (0, ε] so they rank below every positive score but keep their order.
    """
    combined = jnp.sum(probs * weights, axis=-1)
    pos_sum = jnp.sum(jnp.where(weights > 0, weights, 0.0))
    neg_sum = jnp.abs(jnp.sum(jnp.where(weights < 0, weights, 0.0)))
    total = pos_sum + neg_sum
    rescaled_neg = (combined + neg_sum) / jnp.maximum(total, 1e-30) * EPSILON
    return jnp.where(
        total == 0,
        jnp.maximum(combined, 0.0),
        jnp.where(combined < 0, rescaled_neg, combined + EPSILON),
    )


# default head weights shaped like HomeGlobalParams.Scoring.ModelWeights —
# fav/reply/retweet positive, negative-feedback/report negative
DEFAULT_HEAD_NAMES: Sequence[str] = (
    "fav", "reply", "retweet", "reply_engaged_by_author",
    "good_click_convo", "good_click_profile", "good_profile_click",
    "video_quality_view", "bookmark", "share", "dwell",
    "open_link", "screenshot", "negative_feedback_v2", "report",
)
DEFAULT_HEAD_WEIGHTS = jnp.asarray(
    [1.0, 13.5, 1.0, 75.0, 12.0, 12.0, 10.0, 0.005, 0.3, 1.0, 0.005,
     0.1, 1.0, -74.0, -369.0],
    jnp.float32,
)


def multi_task_loss(
    logits: jnp.ndarray, labels: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Mean per-head sigmoid cross-entropy (the standard multi-task recap loss)."""
    losses = optax_sigmoid_ce(logits, labels)
    if mask is not None:
        losses = losses * mask
        return jnp.sum(losses) / jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.mean(losses)


def optax_sigmoid_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    # local impl to keep models dependency-light
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -labels * log_p - (1.0 - labels) * log_not_p


PARTITION_RULES = [
    # wide fused kernels shard over 'model' on the output dim; patterns are
    # anchored so future modules whose paths merely contain these names
    # don't accidentally match
    (r"(^|/)hidden/kernel$", P(None, "model")),
    (r"(^|/)mask_agg/kernel$", P(None, "model")),
    (r"(^|/)trunk_0/kernel$", P(None, "model")),
    (r".*", P()),
]
