"""Trainer input prefetch: the overlapped feed must be numerically
identical to synchronous feeding and surface feeder errors."""

import jax.numpy as jnp
import numpy as np
import pytest

from the_algorithm_tpu.core.mesh import MeshSpec, make_mesh
from the_algorithm_tpu.training.trainer import Trainer, TrainerConfig


def _make_trainer():
    mesh = make_mesh(MeshSpec(data=8, model=1))
    params = {"w": jnp.zeros((4,), jnp.float32)}

    def loss_fn(p, batch):
        pred = batch["x"] @ p["w"]
        loss = jnp.mean((pred - batch["y"]) ** 2)
        return loss, {}

    return Trainer(
        loss_fn, params, mesh, [(r".*", None)],
        config=TrainerConfig(learning_rate=0.1, log_every=1000),
    )


def _batches(n, seed=0):
    rng = np.random.default_rng(seed)
    for _ in range(n):
        yield {"x": rng.normal(size=(16, 4)).astype(np.float32),
               "y": rng.normal(size=(16,)).astype(np.float32)}


def test_prefetch_matches_synchronous():
    t_sync = _make_trainer()
    t_sync.fit(_batches(6), 6, prefetch=0)
    t_pre = _make_trainer()
    t_pre.fit(_batches(6), 6, prefetch=2)
    np.testing.assert_allclose(
        np.asarray(t_sync.params["w"]), np.asarray(t_pre.params["w"]),
        rtol=1e-6)


def test_prefetch_surfaces_feeder_errors():
    t = _make_trainer()

    def boom():
        yield from _batches(2)
        raise RuntimeError("corrupt shard")

    with pytest.raises(RuntimeError, match="corrupt shard"):
        t.fit(boom(), 10, prefetch=2)
