"""TPU-native image/array ops (the "kernel set" of SURVEY.md section 2.4)."""

from .convs import conv2d, depthwise_conv2d
from .equalize import equalize01, equalize_uint8
from .filters import (
    avg_pool2d,
    blur,
    calculate_local_variance,
    gauss_kernel,
    local_mean,
    local_stddev,
    pair_downsampler,
    texture_difference,
)
from .padding import InputPadder, pad8_amounts, pad8_replicate, unpad8
from .resize import resize_bilinear, upflow8
from .sampling import coords_grid, grid_sample, grid_sample_pixel
from .warp import warp_tensor

__all__ = [
    "avg_pool2d",
    "blur",
    "calculate_local_variance",
    "conv2d",
    "coords_grid",
    "depthwise_conv2d",
    "equalize01",
    "equalize_uint8",
    "gauss_kernel",
    "grid_sample",
    "grid_sample_pixel",
    "local_mean",
    "local_stddev",
    "InputPadder",
    "pad8_amounts",
    "pad8_replicate",
    "pair_downsampler",
    "resize_bilinear",
    "texture_difference",
    "unpad8",
    "upflow8",
    "warp_tensor",
]
