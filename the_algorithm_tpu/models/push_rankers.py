"""Pushservice ranking models: light-ranking MLP and ClemNet heavy ranker.

≡ ``pushservice/src/main/python/models/``:
  - light ranker MLP over continuous + binary features
    (``light_ranking/model_pools_mlp.py:18-32``)
  - heavy ranker "ClemNet": residual blocks of channel-wise dense +
    conv1d + batch-norm + activation over a [B, F, C] feature tensor,
    multi-task heads (``heavy_ranking/lib/layers.py:9-121``,
    ``lib/model.py:13-64``; train loop ``heavy_ranking/graph.py:24-94``).

TPU notes: channel-wise dense is an einsum over per-channel kernels (batched
MXU matmuls); conv1d over the feature axis maps to XLA convolution; batch
norm uses flax's BatchNorm with the reference's 0.9999 momentum.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class LightRankingMLP(nn.Module):
    """≡ model_pools_mlp.py: BN → dense stack → sigmoid head."""

    hidden: Tuple[int, ...] = (200, 100)
    num_heads: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9999, name="input_bn"
        )(x)
        for i, w in enumerate(self.hidden):
            x = nn.Dense(w, name=f"dense_{i}")(x)
            x = nn.relu(x)
        return nn.Dense(self.num_heads, name="head")(x)


class ChannelWiseDense(nn.Module):
    """Per-channel dense: [B, F, C] → [B, O, C] with a [C, F, O] kernel
    (≡ layers.py ChannelWiseDense — cheaper than flattening channels)."""

    output_size: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, F, C = x.shape
        kernel = self.param(
            "kernel", nn.initializers.glorot_uniform(), (C, F, self.output_size)
        )
        out = jnp.einsum(
            "bfc,cfo->boc", x, kernel, preferred_element_type=jnp.float32
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.output_size, C)
            )
            out = out + bias[None, :, :]
        return out


@dataclasses.dataclass(frozen=True)
class ClemNetBlockParams:
    """≡ BlockParams: optional dense/conv/residual stages."""

    dense_size: Optional[int] = None
    conv_filters: Optional[int] = None
    conv_kernel: int = 3
    residual: bool = False
    activation: str = "relu"


class ClemNetBlock(nn.Module):
    """≡ lib/model.py Block2: Optional(ChannelWiseDense+BN+act) →
    Optional(Conv1D+BN+act) → Optional(residual)."""

    params: ClemNetBlockParams

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        act = getattr(nn, self.params.activation)
        inputs = x
        if self.params.dense_size:
            x = ChannelWiseDense(self.params.dense_size, name="cw_dense")(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9999, axis=1,
                name="dense_bn",
            )(x)
            x = act(x)
        if self.params.conv_filters:
            # conv over the feature axis; channels = last dim
            x = nn.Conv(
                features=self.params.conv_filters,
                kernel_size=(self.params.conv_kernel,),
                padding="SAME",
                name="conv",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9999, axis=1,
                name="conv_bn",
            )(x)
            x = act(x)
        if self.params.residual and inputs.shape == x.shape:
            x = x + inputs
        return x


class ClemNet(nn.Module):
    """Residual block stack + flatten + multi-task heads."""

    blocks: Tuple[ClemNetBlockParams, ...] = (
        ClemNetBlockParams(dense_size=128, conv_filters=4),
        ClemNetBlockParams(dense_size=64, conv_filters=4, residual=True),
    )
    num_heads: int = 3  # push heavy ranker multi-task heads

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x [B, F] or [B, F, C] → logits [B, H]."""
        if x.ndim == 2:
            x = x[:, :, None]
        for i, bp in enumerate(self.blocks):
            x = ClemNetBlock(bp, name=f"block_{i}")(x, train=train)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.num_heads, name="heads")(x)
