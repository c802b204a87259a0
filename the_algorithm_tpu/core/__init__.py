"""Core runtime: mesh/topology, partition rules, config, hashing, metrics."""

from the_algorithm_tpu.core.mesh import (  # noqa: F401
    MeshSpec,
    make_mesh,
    get_mesh,
    set_mesh,
    local_mesh,
)
from the_algorithm_tpu.core.partition import (  # noqa: F401
    match_partition_rules,
    with_sharding_constraint,
    named_sharding,
)
from the_algorithm_tpu.core.config import Param, Params, param_scope  # noqa: F401
from the_algorithm_tpu.core.metrics import StatsReceiver, NullStats  # noqa: F401
