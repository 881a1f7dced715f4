from .augmentor import FlowAugmentor, SparseFlowAugmentor
from .datasets import (
    DIDDataset,
    FrameDataset,
    FrameRecord,
    GenericDataset,
    RLVDataset,
    SDSDDataset,
    create_dataset,
    gt_path_for,
    sequential_judgment,
    sort_files_by_name,
)
from .prefetch import (
    ChunkRecord,
    DeviceRecord,
    chunk_prefetch,
    chunk_records,
    device_prefetch,
)
from .synthetic import make_rlv_fixture

__all__ = [
    "ChunkRecord",
    "DIDDataset",
    "FlowAugmentor",
    "SparseFlowAugmentor",
    "DeviceRecord",
    "chunk_prefetch",
    "chunk_records",
    "FrameDataset",
    "FrameRecord",
    "GenericDataset",
    "RLVDataset",
    "SDSDDataset",
    "create_dataset",
    "device_prefetch",
    "gt_path_for",
    "make_rlv_fixture",
    "sequential_judgment",
    "sort_files_by_name",
]
