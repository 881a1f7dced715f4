"""Convolution helpers in NHWC/HWIO layout (TPU-native).

The reference dispatches every conv through ``torch.nn.functional.conv2d`` in
NCHW (e.g. model/model.py:15-44). On TPU, XLA tiles NHWC convs directly onto
the MXU, so the whole framework standardizes on NHWC activations and HWIO
weights; the checkpoint converter (core/checkpoint.py) transposes once at
load time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..core.precision import conv_precision


def conv2d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    stride: int | tuple[int, int] = 1,
    padding: int | tuple[int, int] | str = 0,
    groups: int = 1,
    dilation: int | tuple[int, int] = 1,
    preferred_dtype=jnp.float32,
) -> jax.Array:
    """2-D convolution, PyTorch ``F.conv2d`` semantics in NHWC/HWIO layout.

    Args:
      x: (B, H, W, Cin) input.
      w: (kh, kw, Cin // groups, Cout) kernel.
      b: optional (Cout,) bias.
      stride/padding/dilation: as in torch (symmetric zero padding).
      groups: feature group count (depthwise = Cin groups).
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    if isinstance(padding, str):
        pad = padding
    else:
        if isinstance(padding, int):
            padding = (padding, padding)
        pad = [(padding[0], padding[0]), (padding[1], padding[1])]
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=pad,
        rhs_dilation=dilation,
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred_dtype,
        precision=conv_precision(),
    )
    if b is not None:
        out = out + b
    return out.astype(x.dtype) if out.dtype != x.dtype else out


def depthwise_conv2d(
    x: jax.Array,
    kernel_hw: jax.Array,
    *,
    stride: int = 1,
    padding: int | str = 0,
) -> jax.Array:
    """Depthwise conv applying one (kh, kw) kernel to every channel."""
    c = x.shape[-1]
    w = jnp.broadcast_to(kernel_hw[:, :, None, None], (*kernel_hw.shape, 1, c))
    return conv2d(x, w, stride=stride, padding=padding, groups=c)
