"""Device mesh + sharding rules (data / fsdp / tensor axes)."""

from .mesh import make_mesh, shard_params, param_sharding_rules, replicate

__all__ = ["make_mesh", "shard_params", "param_sharding_rules", "replicate"]
