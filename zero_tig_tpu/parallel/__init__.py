from .mesh import (
    carry_sharding,
    flag_sharding,
    frame_sharding,
    make_mesh,
    replicated,
    shard_frames,
    shard_params,
)

__all__ = [
    "carry_sharding",
    "flag_sharding",
    "frame_sharding",
    "make_mesh",
    "replicated",
    "shard_frames",
    "shard_params",
]
