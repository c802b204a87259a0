"""TPU-lean optimizer transforms.

``scale_by_adam_bf16`` stores BOTH Adam moments in bfloat16 — halves the
optimizer-state HBM traffic of the update phase (the train step's update
reads+writes 2 moment tensors per parameter; at MaskNet-6000 shapes that
is ~0.4 ms of a 1.39 ms step on v5e — see ``MFU_NOTES.md``). bf16 keeps
f32's exponent range, so the second moment's tiny magnitudes (grad², down
to ~1e-12) stay representable; only mantissa precision drops, which Adam's
sqrt+eps normalization is insensitive to (the standard low-memory-Adam
recipe — e.g. the T5/PaLM training configs' bf16 accumulators).

All arithmetic runs in f32 (moments cast up, new moments cast back), so
the math matches ``optax.scale_by_adam`` to bf16 rounding.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import optax


class ScaleByAdamBf16State(NamedTuple):
    count: chex.Array  # []
    mu: optax.Updates  # bf16 pytree
    nu: optax.Updates  # bf16 pytree


def scale_by_adam_bf16(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    eps_root: float = 0.0,
) -> optax.GradientTransformation:
    """Adam scaling with bf16 moment storage (f32 math)."""

    def init_fn(params):
        mu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=jnp.bfloat16), params)
        nu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=jnp.bfloat16), params)
        return ScaleByAdamBf16State(
            count=jnp.zeros([], jnp.int32), mu=mu, nu=nu)

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1

        def upd(g, m, v):
            g32 = g.astype(jnp.float32)
            m32 = b1 * m.astype(jnp.float32) + (1 - b1) * g32
            v32 = b2 * v.astype(jnp.float32) + (1 - b2) * g32 * g32
            c1 = 1 - b1 ** count.astype(jnp.float32)
            c2 = 1 - b2 ** count.astype(jnp.float32)
            out = (m32 / c1) / (
                jnp.sqrt(v32 / c2 + eps_root) + eps)
            return out.astype(g.dtype), m32.astype(jnp.bfloat16), \
                v32.astype(jnp.bfloat16)

        flat = jax.tree_util.tree_map(upd, updates, state.mu, state.nu)
        out = jax.tree_util.tree_map(lambda t: t[0], flat,
                                     is_leaf=lambda t: isinstance(t, tuple))
        mu = jax.tree_util.tree_map(lambda t: t[1], flat,
                                    is_leaf=lambda t: isinstance(t, tuple))
        nu = jax.tree_util.tree_map(lambda t: t[2], flat,
                                    is_leaf=lambda t: isinstance(t, tuple))
        return out, ScaleByAdamBf16State(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def adam_bf16(
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: Optional[float] = None,
) -> optax.GradientTransformation:
    """Adam(W) with bf16 moment storage — drop-in for ``optax.adam``."""
    parts = [scale_by_adam_bf16(b1=b1, b2=b2, eps=eps)]
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale(-learning_rate))
    return optax.chain(*parts)
