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
