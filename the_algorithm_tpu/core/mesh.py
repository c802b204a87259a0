"""Device-mesh / topology management.

The whole framework runs over a single logical 2-D mesh with axes:

  - ``data``  — data parallelism: batches of requests / training examples are
    sharded here; gradients and metrics psum over it.
  - ``model`` — table/row sharding: embedding tables (SimClusters cluster
    rows, TwHIN entity rows, cluster→tweet retrieval index) are row-sharded
    here; lookups exchange rows via all-to-all over this axis.

This replaces the reference's service-level sharding: TF-v1 parameter-server
variable partitioning (``twml/twml/trainers/trainer.py:488-530``,
``twml/twml/layers/full_sparse.py:124-135``), Earlybird index partitions +
root fan-out (``src/java/com/twitter/search/earlybird_root/``), and GFS
server→worker sharded adjacency lists — all expressed as one jax.sharding.Mesh
with XLA collectives riding ICI (and DCN across slices via jax.distributed).
"""

from __future__ import annotations

import dataclasses
import os
from contextlib import contextmanager
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Shape of the logical mesh. ``data * model`` must equal #devices used."""

    data: int = -1  # -1: infer = n_devices // model
    model: int = 1

    def resolve(self, n_devices: int) -> "MeshSpec":
        model = self.model if self.model > 0 else 1
        data = self.data
        if data < 0:
            if n_devices % model != 0:
                raise ValueError(
                    f"{n_devices} devices not divisible by model={model}"
                )
            data = n_devices // model
        if data * model != n_devices:
            raise ValueError(
                f"mesh {data}x{model} != {n_devices} devices"
            )
        return MeshSpec(data=data, model=model)


_GLOBAL_MESH: Optional[Mesh] = None


def make_mesh(
    spec: MeshSpec = MeshSpec(),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build the (data, model) mesh over the given (default: all) devices.

    Multi-host: call jax.distributed.initialize() first; jax.devices() then
    spans the full slice and the mesh rides ICI within a slice, DCN across.
    """
    devices = list(devices if devices is not None else jax.devices())
    spec = spec.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(spec.data, spec.model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def set_mesh(mesh: Mesh) -> None:
    global _GLOBAL_MESH
    _GLOBAL_MESH = mesh


def get_mesh() -> Mesh:
    """Current global mesh; creates an all-data-parallel one on first use."""
    global _GLOBAL_MESH
    if _GLOBAL_MESH is None:
        _GLOBAL_MESH = make_mesh()
    return _GLOBAL_MESH


@contextmanager
def local_mesh(mesh: Mesh):
    """Temporarily override the global mesh (tests, dry runs)."""
    global _GLOBAL_MESH
    prev = _GLOBAL_MESH
    _GLOBAL_MESH = mesh
    try:
        yield mesh
    finally:
        _GLOBAL_MESH = prev


def host_device_count() -> int:
    return jax.local_device_count()


def force_host_devices(n: int) -> None:
    """Test helper: request ``n`` virtual CPU devices. Must run before JAX init."""
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n}"
    )
