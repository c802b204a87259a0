"""adam_bf16 vs optax.adam: same trajectory to bf16 rounding, bf16 state."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from the_algorithm_tpu.training import optimizers as opt


def test_matches_optax_adam_to_bf16_rounding():
    params = {"w": jnp.asarray(np.linspace(-1, 1, 64, dtype=np.float32)),
              "b": jnp.zeros((4,), jnp.float32)}
    tx_ref = optax.adam(1e-2)
    tx_lo = opt.adam_bf16(1e-2)
    s_ref = tx_ref.init(params)
    s_lo = tx_lo.init(params)
    p_ref = params
    p_lo = jax.tree_util.tree_map(jnp.array, params)
    rng = np.random.default_rng(0)
    for _ in range(20):
        g = {"w": jnp.asarray(rng.normal(size=64).astype(np.float32)),
             "b": jnp.asarray(rng.normal(size=4).astype(np.float32))}
        u_ref, s_ref = tx_ref.update(g, s_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, u_ref)
        u_lo, s_lo = tx_lo.update(g, s_lo, p_lo)
        p_lo = optax.apply_updates(p_lo, u_lo)
    np.testing.assert_allclose(
        np.asarray(p_lo["w"]), np.asarray(p_ref["w"]), atol=3e-2, rtol=3e-2)
    # state stored in bf16
    assert s_lo[0].mu["w"].dtype == jnp.bfloat16
    assert s_lo[0].nu["w"].dtype == jnp.bfloat16


def test_converges_on_quadratic():
    target = jnp.asarray(np.linspace(0.5, 2.0, 16, dtype=np.float32))
    p = {"x": jnp.zeros((16,), jnp.float32)}
    tx = opt.adam_bf16(5e-2)
    s = tx.init(p)

    @jax.jit
    def step(p, s):
        g = jax.grad(lambda q: jnp.sum((q["x"] - target) ** 2))(p)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s

    for _ in range(300):
        p, s = step(p, s)
    np.testing.assert_allclose(np.asarray(p["x"]), np.asarray(target),
                               atol=5e-2)
