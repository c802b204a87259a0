"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 devices (the pattern recommended in SURVEY.md §4 — the
reference has no distributed-test story; this fills that gap).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# jax may already be imported by a sitecustomize hook with another platform
# baked into its config; force CPU before any backend is initialized.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from the_algorithm_tpu.core.mesh import MeshSpec, make_mesh

    return make_mesh(MeshSpec(data=2, model=4))


@pytest.fixture(scope="session")
def mesh_dp8():
    from the_algorithm_tpu.core.mesh import MeshSpec, make_mesh

    return make_mesh(MeshSpec(data=8, model=1))


# -- test-speed tiers ----------------------------------------------------------
# The sharded/pallas/native-server/multihost suites dominate wall time with
# XLA compiles. Auto-mark them `slow` so the inner loop can run
# `pytest -m "not slow"` (~3x faster); CI runs everything.

_SLOW_MODULES = {
    "test_multihost", "test_native_front", "test_parallel",
    "test_tweet_embeddings_ann", "test_seg_scan", "test_gather",
    "test_data_record_trainer", "test_models_training", "test_twhin",
    "test_search_persistence", "test_scaling_efficiency",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: XLA-compile-heavy (sharded/pallas/native) tests"
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _SLOW_MODULES or "sharded" in item.name:
            item.add_marker(pytest.mark.slow)
