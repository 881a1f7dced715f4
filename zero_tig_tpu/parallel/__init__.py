from .spmd_predict import predict_scenes_spmd
from .spmd_train import batched_records, scene_streams, train_scenes_spmd
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
    "batched_records",
    "carry_sharding",
    "flag_sharding",
    "frame_sharding",
    "make_mesh",
    "replicated",
    "shard_frames",
    "shard_params",
    "predict_scenes_spmd",
    "scene_streams",
    "train_scenes_spmd",
]
