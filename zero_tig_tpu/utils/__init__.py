from .flow_io import (
    read_flo,
    read_flow_kitti,
    read_gen,
    read_pfm,
    write_flo,
    write_flow_kitti,
    write_pfm,
)
from .flow_viz import flow_to_image, make_colorwheel

__all__ = [
    "flow_to_image",
    "make_colorwheel",
    "read_flo",
    "read_flow_kitti",
    "read_gen",
    "read_pfm",
    "write_flo",
    "write_flow_kitti",
    "write_pfm",
]
