"""uint8 per-channel histogram equalization inside the compiled graph.

Parity target: ``torchvision.transforms.functional.equalize`` (PIL
ImageOps.equalize algorithm), used by the reference on the current frame
before RAFT (model/model.py:234, :359). The LUT construction is:

    hist     = 256-bin histogram of the channel
    step     = sum(hist) - hist[last_nonzero_bin], floor-div 255
    if step == 0: channel unchanged
    lut[0]   = 0
    lut[i]   = (cumsum(hist)[i-1] + step // 2) // step     for i >= 1
    out      = clip(lut, 0, 255)[pixel]

Everything is static-shape (256 bins) so it jits cleanly; the histogram is a
scatter-add and the LUT application a gather -- both supported natively by
XLA-TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _equalize_channel(chan_u8: jax.Array) -> jax.Array:
    """Equalize one flattened uint8 channel (N,) -> (N,) uint8.

    Scatter/gather-free TPU formulation: the 256-bin histogram is a
    compare-and-reduce over a (N, 256) one-hot (fused by XLA, VPU-friendly)
    and the LUT application is a one-hot @ lut MXU matmul -- both avoid the
    serial scalar scatter/gather units.
    """
    x = chan_u8.astype(jnp.int32)
    bins = jnp.arange(256, dtype=jnp.int32)
    # bf16 one-hot is EXACT here (values 0/1 and LUT integers <= 255 are
    # exactly representable; accumulation is f32) and halves the dominant
    # (N, 256) HBM traffic
    onehot = (x[:, None] == bins[None, :]).astype(jnp.bfloat16)  # (N, 256)
    hist = jnp.sum(onehot, axis=0, dtype=jnp.float32).astype(jnp.int32)

    nonzero = hist > 0
    # index of the last nonzero bin (there is always at least one)
    last_nz = jnp.max(jnp.where(nonzero, bins, -1))
    total = x.shape[0]
    step = (total - hist[last_nz]) // 255

    cum = jnp.cumsum(hist)
    safe_step = jnp.maximum(step, 1)
    lut = (cum + step // 2) // safe_step
    lut = jnp.concatenate([jnp.zeros((1,), lut.dtype), lut[:-1]])
    lut = jnp.clip(lut, 0, 255)

    out = jnp.dot(
        onehot, lut.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    out = jnp.where(step == 0, x, out)
    return out.astype(jnp.uint8)


def equalize_uint8(img: jax.Array) -> jax.Array:
    """Per-image, per-channel histogram equalization of uint8 (B, H, W, C)."""
    b, h, w, c = img.shape
    flat = img.transpose(0, 3, 1, 2).reshape(b * c, h * w)
    out = jax.vmap(_equalize_channel)(flat)
    return out.reshape(b, c, h, w).transpose(0, 2, 3, 1)


def equalize01(x: jax.Array) -> jax.Array:
    """Equalize a [0, 1] float image; returns float in [0, 255].

    Parity with the reference's ``equalize((x * 255).to(torch.uint8))``
    followed by ``.to(torch.float32)`` (model/model.py:234-235): the uint8
    cast truncates toward zero.
    """
    u8 = jnp.clip(x * 255.0, 0.0, 255.0).astype(jnp.uint8)
    return equalize_uint8(u8).astype(jnp.float32)
