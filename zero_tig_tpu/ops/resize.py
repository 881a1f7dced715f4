"""Bilinear resize with exact PyTorch ``F.interpolate`` semantics.

``jax.image.resize`` antialiases on downscale and uses half-pixel centers
only; the reference mixes ``align_corners=False`` (default, e.g.
model/model.py:226-227, utils/utils.py:217-218) and ``align_corners=True``
(flow upsample, utils/utils.py:308-310), neither antialiased. Both paths are
implemented here as two separable gather-interpolations, which XLA fuses into
cheap dynamic-slice/weighted-add on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _source_index(out_size: int, in_size: int, align_corners: bool, dtype):
    """Per-output-pixel source coordinate, floor index and lerp weight."""
    d = jnp.arange(out_size, dtype=dtype)
    if align_corners:
        if out_size == 1:
            src = jnp.zeros((out_size,), dtype)
        else:
            src = d * ((in_size - 1) / (out_size - 1))
    else:
        scale = in_size / out_size
        src = jnp.maximum(scale * (d + 0.5) - 0.5, 0.0)
    i0 = jnp.minimum(src.astype(jnp.int32), in_size - 1)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    w1 = src - i0.astype(dtype)
    return i0, i1, w1


def resize_bilinear(
    x: jax.Array,
    size: tuple[int, int],
    *,
    align_corners: bool = False,
) -> jax.Array:
    """Resize (..., H, W, C) to (..., size[0], size[1], C), torch-bilinear.

    Matches ``F.interpolate(x, size, mode='bilinear', align_corners=...)``
    bit-for-bit up to float associativity (no antialiasing on downscale).
    """
    out_h, out_w = size
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (out_h, out_w):
        return x
    dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    xf = x.astype(dtype)

    i0, i1, wh = _source_index(out_h, h, align_corners, dtype)
    wh = wh.reshape((out_h,) + (1,) * 2)
    xf = jnp.take(xf, i0, axis=-3) * (1.0 - wh) + jnp.take(xf, i1, axis=-3) * wh

    j0, j1, ww = _source_index(out_w, w, align_corners, dtype)
    ww = ww.reshape((out_w, 1))
    xf = jnp.take(xf, j0, axis=-2) * (1.0 - ww) + jnp.take(xf, j1, axis=-2) * ww
    return xf


def upflow8(flow: jax.Array) -> jax.Array:
    """x8 bilinear flow upsample, align_corners=True, values scaled by 8.

    Parity: utils/utils.py:308-310.  flow: (B, H, W, 2).
    """
    h, w = flow.shape[-3], flow.shape[-2]
    return 8.0 * resize_bilinear(flow, (8 * h, 8 * w), align_corners=True)
