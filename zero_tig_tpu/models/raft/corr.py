"""All-pairs correlation volume and pyramid lookup.

Parity: ``CorrBlock`` (model/RAFT/corr.py:12-60). The volume build is one
large MXU matmul (fmap1 @ fmap2^T / sqrt(dim)); the 4-level pyramid average-
pools over the *second* image's spatial dims; the per-iteration lookup
bilinearly samples a (2r+1)^2 window around each flow-displaced coordinate at
every level.

Reference layout quirk preserved (required for raft-sintel.pth weight
compatibility): the window offset grid is built as meshgrid(dy, dx) and added
to (x, y) coordinates (corr.py:37-43), so window position (i, j) samples
pixel (x + L[i], y + L[j]) -- the transpose of the "natural" order. Upstream
RAFT trains with this layout, so the motion-encoder weights expect it.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...ops.filters import avg_pool2d
from ...ops.sampling import grid_sample_pixel


class CorrPyramid(NamedTuple):
    """Correlation pyramid: level i has shape (B*H1*W1, H2/2^i, W2/2^i, 1)."""

    levels: tuple[jax.Array, ...]
    batch: int
    h1: int
    w1: int


def build_corr_pyramid(
    fmap1: jax.Array, fmap2: jax.Array, num_levels: int = 4
) -> CorrPyramid:
    """fmap1, fmap2: (B, H, W, D) -> pyramid of all-pairs correlations."""
    b, h, w, d = fmap1.shape
    f1 = fmap1.reshape(b, h * w, d)
    f2 = fmap2.reshape(b, h * w, d)
    corr = jnp.einsum(
        "bqd,bkd->bqk",
        f1,
        f2,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) / math.sqrt(d)
    corr = corr.reshape(b * h * w, h, w, 1)
    levels = [corr]
    for _ in range(num_levels - 1):
        corr = avg_pool2d(corr, 2, 2)
        levels.append(corr)
    return CorrPyramid(tuple(levels), b, h, w)


def lookup_corr(pyramid: CorrPyramid, coords: jax.Array, radius: int = 4) -> jax.Array:
    """Sample (2r+1)^2 windows at every level around `coords`.

    coords: (B, H1, W1, 2) pixel coordinates (x, y) at 1/8 resolution.
    Returns (B, H1, W1, num_levels*(2r+1)^2) cost features, level-major,
    window flattened (i, j)-major per the reference layout.
    """
    b, h1, w1, _ = coords.shape
    q = b * h1 * w1
    r = radius
    n = 2 * r + 1
    offsets = jnp.linspace(-r, r, n, dtype=coords.dtype)

    cx = coords[..., 0].reshape(q)
    cy = coords[..., 1].reshape(q)

    out = []
    for i, corr_l in enumerate(pyramid.levels):
        scale = 1.0 / (2**i)
        # window position (i, j) samples (x + L[i], y + L[j])  [ref quirk]
        x = cx[:, None, None] * scale + offsets[None, :, None]
        y = cy[:, None, None] * scale + offsets[None, None, :]
        x = jnp.broadcast_to(x, (q, n, n))
        y = jnp.broadcast_to(y, (q, n, n))
        sampled = grid_sample_pixel(corr_l, x, y)  # (q, n, n, 1)
        out.append(sampled.reshape(b, h1, w1, n * n))
    return jnp.concatenate(out, axis=-1)
