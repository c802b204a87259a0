"""Trust & Safety classifiers: pToxicity / pNSFW-text / pNSFW-media / pAbuse.

≡ ``trust_and_safety_models/`` — the toxicity model is a BERTweet-based text
classifier with k-fold training, LR schedules, and in-training rescoring
(``toxicity/train.py:39-355``); ``nsfw/nsfw_media.py`` is a small keras CNN
over media bytes; ``nsfw_text.py``/``abusive/abusive_model.py`` are text
models over shared encoders.

TPU design: one compact text encoder (token-embedding + transformer blocks,
MXU-shaped, bf16-friendly) shared by toxicity / nsfw-text / abuse heads, and
a small conv net for media. A pretrained-HF-encoder drop-in is possible (the
``transformers`` package is available) but the framework ships its own
encoder so the stack is self-contained and jit-compiled end to end.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class TextEncoderConfig:
    vocab_size: int = 32768  # hashed-token vocabulary
    max_len: int = 128
    dim: int = 128
    heads: int = 4
    layers: int = 2
    mlp_ratio: int = 4


class TransformerBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        h = nn.LayerNorm(name="ln1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, name="attn"
        )(h, h, mask=mask[:, None, None, :])
        x = x + h
        h = nn.LayerNorm(name="ln2")(x)
        h = nn.Dense(self.dim * self.mlp_ratio, name="mlp_up")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, name="mlp_down")(h)
        return x + h


class TextEncoder(nn.Module):
    """Token ids [B, L] (+ mask) → pooled [B, D] (mean over valid tokens)."""

    config: TextEncoderConfig

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        emb = nn.Embed(cfg.vocab_size, cfg.dim, name="token_emb")(tokens)
        pos = self.param(
            "pos_emb", nn.initializers.normal(0.02), (cfg.max_len, cfg.dim)
        )
        x = emb + pos[None, : tokens.shape[1]]
        for i in range(cfg.layers):
            x = TransformerBlock(
                cfg.dim, cfg.heads, cfg.mlp_ratio, name=f"block_{i}"
            )(x, mask)
        x = nn.LayerNorm(name="final_ln")(x)
        denom = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
        return jnp.sum(x * mask[:, :, None], axis=1) / denom


class TextSafetyModel(nn.Module):
    """Shared encoder + named binary heads (toxicity, nsfw, abuse)."""

    config: TextEncoderConfig = TextEncoderConfig()
    heads: Tuple[str, ...] = ("toxicity", "nsfw", "abuse")

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        pooled = TextEncoder(self.config, name="encoder")(tokens, mask)
        return nn.Dense(len(self.heads), name="cls")(pooled)


class MediaSafetyModel(nn.Module):
    """Small conv net over [B, H, W, 3] media (≡ nsfw_media.py keras CNN)."""

    widths: Tuple[int, ...] = (16, 32, 64)
    num_heads: int = 1

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        x = images
        for i, w in enumerate(self.widths):
            x = nn.Conv(w, (3, 3), strides=(2, 2), name=f"conv_{i}")(x)
            x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_heads, name="head")(x)


def tokenize_text(text: str, config: TextEncoderConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hash-token text → (ids [L], mask [L]) using the framework tokenizer."""
    from the_algorithm_tpu.search.earlybird import tokenize

    toks = tokenize(text, config.max_len)
    from the_algorithm_tpu.ops.sparse import PAD_ID

    import numpy as np

    valid = toks != int(PAD_ID)
    ids = np.where(valid, toks % config.vocab_size, 0).astype(np.int32)
    return jnp.asarray(ids), jnp.asarray(valid.astype(np.float32))
