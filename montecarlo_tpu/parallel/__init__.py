from .mesh import CHAIN_AXIS, make_mesh, replicate, shard_device_state

__all__ = ["CHAIN_AXIS", "make_mesh", "replicate", "shard_device_state"]
