"""Device mesh + sharding rules (data / fsdp / tensor axes) and the
multi-host bootstrap (jax.distributed, hybrid ICI/DCN meshes)."""

from .mesh import (make_mesh, shard_params, param_sharding_rules, replicate,
                   replicate_scalars)
from . import context, distributed

__all__ = [
    "make_mesh",
    "shard_params",
    "param_sharding_rules",
    "replicate",
    "replicate_scalars",
    "context",
    "distributed",
]
