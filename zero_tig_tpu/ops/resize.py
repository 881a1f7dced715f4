"""Bilinear resize with exact PyTorch ``F.interpolate`` semantics.

``jax.image.resize`` antialiases on downscale and uses half-pixel centers
only; the reference mixes ``align_corners=False`` (default, e.g.
model/model.py:226-227, utils/utils.py:217-218) and ``align_corners=True``
(flow upsample, utils/utils.py:308-310), neither antialiased. Both paths are
implemented here as two separable gather-interpolations, which XLA fuses into
cheap dynamic-slice/weighted-add on TPU.
"""

from __future__ import annotations

import math

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


def _slice_axis(x, start, stop, stride, axis):
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(start, stop, stride)
    return x[tuple(idx)]


def _down_int_axis(x: jax.Array, s: int, axis: int) -> jax.Array:
    """align_corners=False downscale by integer factor ``s`` along ``axis``.

    src(k) = s*(k+0.5)-0.5 = s*k + (s-1)/2 -- a FIXED phase, so the whole
    axis reduces to strided slices + one fixed-weight lerp (odd s: a pure
    stride-s slice). Identical arithmetic to the take-based path (the per-
    element formula x0*(1-w)+x1*w with the same w), no gather.
    """
    f = (s - 1) // 2
    x0 = _slice_axis(x, f, None, s, axis)
    if s % 2 == 1:
        return x0  # w == 0: src lands exactly on sample f
    x1 = _slice_axis(x, f + 1, None, s, axis)
    return x0 * 0.5 + x1 * 0.5


def _up_int_axis(x: jax.Array, s: int, axis: int) -> jax.Array:
    """align_corners=False upscale by integer factor ``s`` along ``axis``.

    Each output phase r in [0, s) reads src = k + (r+0.5)/s - 0.5: a fixed
    (offset, weight) pair -> s shifted-slice lerps + an interleave reshape.
    Boundary clamp parity: phases with negative offset replicate the first
    sample at k=0 exactly like the take path's index clamp (torch
    max(src, 0) makes w=0 there, i.e. out == in[0] bit-exactly).
    """
    a = axis % x.ndim
    n = x.shape[a]
    first = _slice_axis(x, 0, 1, 1, a)
    last = _slice_axis(x, n - 1, n, 1, a)
    xp = jnp.concatenate([first, x, last], axis=a)  # edge pad 1/1

    phases = []
    for r in range(s):
        src = (r + 0.5) / s - 0.5
        d = math.floor(src)
        wr = src - d
        sl0 = _slice_axis(xp, d + 1, d + 1 + n, 1, a)
        if wr == 0.0:
            ph = sl0
        else:
            sl1 = _slice_axis(xp, d + 2, d + 2 + n, 1, a)
            ph = sl0 * (1.0 - wr) + sl1 * wr
            if d < 0:
                # k=0: torch clamps src to 0 -> out == in[0] exactly
                ph = jnp.concatenate(
                    [first, _slice_axis(ph, 1, None, 1, a)], axis=a
                )
        phases.append(ph)

    out = jnp.stack(phases, axis=a + 1)  # (..., n, s, ...)
    shape = x.shape[:a] + (n * s,) + x.shape[a + 1 :]
    return out.reshape(shape)


def _resize_axis(
    xf: jax.Array, out_size: int, axis: int, align_corners: bool, dtype
) -> jax.Array:
    in_size = xf.shape[axis]
    if in_size == out_size:
        return xf
    if not align_corners:
        # integer-ratio fast paths: strided slices + fixed-weight lerps
        # instead of gathers (the pipeline's 1/of_scale downsample and the
        # x3 warp-map upsample hit these; measured ~10x on TPU)
        if in_size % out_size == 0:
            return _down_int_axis(xf, in_size // out_size, axis)
        if out_size % in_size == 0:
            return _up_int_axis(xf, out_size // in_size, axis)
    i0, i1, wv = _source_index(out_size, in_size, align_corners, dtype)
    shape = (out_size,) + (1,) * (xf.ndim - 1 - (axis % xf.ndim))
    wv = wv.reshape(shape)
    return (
        jnp.take(xf, i0, axis=axis) * (1.0 - wv)
        + jnp.take(xf, i1, axis=axis) * wv
    )


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
    xf = _resize_axis(xf, out_h, -3, align_corners, dtype)
    xf = _resize_axis(xf, out_w, -2, align_corners, dtype)
    return xf


def upflow8(flow: jax.Array) -> jax.Array:
    """x8 bilinear flow upsample, align_corners=True, values scaled by 8.

    Parity: utils/utils.py:308-310.  flow: (B, H, W, 2).
    """
    h, w = flow.shape[-3], flow.shape[-2]
    return 8.0 * resize_bilinear(flow, (8 * h, 8 * w), align_corners=True)
