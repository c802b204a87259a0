"""Model-axis-sharded serve engine vs the single-device scorer — parity.

The sharded engine (``mixers/sharded_serve.py``) partitions every
DeviceWideTables leaf P('model', …) and resolves remote rows with the
all-to-all multiget; its scores must match the single-device
DeviceHydrationScorer bit-for-tolerance on every mesh shape.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from the_algorithm_tpu.core import mesh as mesh_mod
from the_algorithm_tpu.mixers import device_hydration as dh
from the_algorithm_tpu.mixers import home_mixer
from the_algorithm_tpu.mixers import feature_schema as fsch
from the_algorithm_tpu.mixers import sharded_serve as ss
from the_algorithm_tpu.mixers import wide_hydrators as wh
from the_algorithm_tpu.models import masknet

from test_device_hydration import make_candidates, A, NOW


@pytest.fixture(scope="module")
def serve_world():
    world = wh.synthetic_world(
        seed=3, num_users=32, num_authors=A, num_tweets=1 << 12,
        engagement_width=8, now=NOW, include_device_spec=True,
    )
    spec = world.pop("device_spec")
    tables, fns, resolvers = dh.build_from_world(world, spec)

    F = fsch.total_width(fsch.WIDE_SCHEMA)
    cfg = masknet.MaskNetConfig(
        num_features=F, num_heads=4, mask_blocks=1, block_dim=32,
        aggregation_dim=16, head_hidden=(16,), dtype="float32",
    )
    model = masknet.MaskNet(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, F)))
    weights = jnp.asarray([1.0, 0.5, 0.25, 0.125])
    return tables, fns, resolvers, model, params, weights


def _batch(n_req=4):
    batch = []
    for u in range(1, n_req + 1):
        q = home_mixer.ForYouQuery(
            user_id=u, followed_authors=[int(a) for a in range(0, A, 5)],
            max_results=50, now=NOW)
        batch.append((q, make_candidates(20 + u)))
    return batch


def _single_device_scores(serve_world, batch, pad_b):
    tables, fns, resolvers, model, params, weights = serve_world
    scorer = dh.DeviceHydrationScorer(
        tables, fns, resolvers, model, params, weights,
        pad_b=pad_b, compute_dtype=jnp.float32,
    )
    return scorer.score_requests(batch)


@pytest.mark.parametrize("shape", [(1, 2), (2, 2), (1, 4), (2, 4)])
def test_sharded_parity_vs_single_device(serve_world, shape):
    tables, fns, resolvers, model, params, weights = serve_world
    dd, E = shape
    n_dev = dd * E
    if n_dev > len(jax.devices()):
        pytest.skip("not enough devices")
    mesh = mesh_mod.make_mesh(
        mesh_mod.MeshSpec(data=dd, model=E), jax.devices()[:n_dev])

    PB = 128
    batch = _batch(4)
    want = _single_device_scores(serve_world, batch, PB)

    eng = ss.ShardedServeEngine(
        tables, fns, resolvers, model, params, weights, mesh,
        pad_b=PB, compute_dtype=jnp.float32,
    )
    got = eng.score_requests(batch)
    assert len(got) == len(want)
    for (gp, gc), (wp, wc) in zip(got, want):
        np.testing.assert_allclose(gp, wp, atol=2e-4, rtol=2e-4)
        np.testing.assert_allclose(gc, wc, atol=2e-4, rtol=2e-4)


def test_sharded_select_columnar_parity(serve_world):
    """Device-side diversity top-K through the sharded engine matches the
    single-device scorer's selection."""
    tables, fns, resolvers, model, params, weights = serve_world
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    mesh = mesh_mod.make_mesh(
        mesh_mod.MeshSpec(data=2, model=2), jax.devices()[:4])

    PB = 128
    K = 8
    rng = np.random.default_rng(11)
    batch = []
    for u in range(1, 5):
        q = home_mixer.ForYouQuery(
            user_id=u, followed_authors=[1, 2, 3], max_results=K, now=NOW)
        n = 30
        cols = {
            "ids": rng.integers(1, 1 << 20, n),
            "author_id": rng.integers(0, A, n),
            "retrieval_score": rng.random(n).astype(np.float32),
        }
        batch.append((q, cols, n))

    single = dh.DeviceHydrationScorer(
        tables, fns, resolvers, model, params, weights,
        pad_b=PB, compute_dtype=jnp.float32, select_top_k=K,
    )
    want = single.select_columnar(batch)

    eng = ss.ShardedServeEngine(
        tables, fns, resolvers, model, params, weights, mesh,
        pad_b=PB, compute_dtype=jnp.float32, select_top_k=K,
    )
    got = eng.select_columnar(batch)
    for (gi, gs, gp), (wi, ws, wp) in zip(got, want):
        np.testing.assert_array_equal(gi, wi)
        np.testing.assert_allclose(gs, ws, atol=2e-4, rtol=2e-4)
        np.testing.assert_allclose(gp, wp, atol=2e-4, rtol=2e-4)


def test_sharded_tables_are_partitioned(serve_world):
    """HBM-capacity claim: each device holds rows/E of the sharded leaves."""
    tables, fns, resolvers, model, params, weights = serve_world
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    mesh = mesh_mod.make_mesh(
        mesh_mod.MeshSpec(data=1, model=4), jax.devices()[:4])
    placed, _ = ss.place_tables(tables, mesh)
    doc = placed.doc_table
    rows = doc.shape[0]
    for s in doc.addressable_shards:
        assert s.data.shape[0] == rows // 4
    gfs = placed.gfs_neighbors
    for s in gfs.addressable_shards:
        assert s.data.shape[1] == gfs.shape[1] // 4
