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

from ...core.precision import conv_precision
from ...ops.filters import avg_pool2d


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
        precision=conv_precision(),
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

    TPU formulation: the window offsets are INTEGERS, so every one of the
    (2r+1)^2 bilinear samples of a query shares the query's single
    fractional offset (fx, fy). The whole window is therefore one
    (2r+2)x(2r+2) contiguous patch per query (a vmapped dynamic_slice --
    lowered to a block gather, not (2r+1)^2*4 scalar gathers) combined with
    four shifted weighted adds on the VPU. Zero padding of width
    pad = 2r+2 around each level reproduces grid_sample's zeros
    padding_mode exactly, including arbitrarily far out-of-range coords
    (the clamped slice then lands fully inside the zero band).
    """
    b, h1, w1, _ = coords.shape
    q = b * h1 * w1
    r = radius
    n = 2 * r + 1
    pad = n + 1  # zero band wide enough that clamped far-OOB slices read 0

    cx = coords[..., 0].reshape(q)
    cy = coords[..., 1].reshape(q)

    out = []
    for i, corr_l in enumerate(pyramid.levels):
        h2, w2 = corr_l.shape[1], corr_l.shape[2]
        field = jnp.pad(
            corr_l[..., 0], ((0, 0), (pad, pad), (pad, pad))
        )  # (q, h2+2p, w2+2p)
        scale = 1.0 / (2**i)
        x = cx * scale
        y = cy * scale
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0)[:, None, None]
        fy = (y - y0)[:, None, None]
        # valid start range [0, dim + 2*pad - (n+1)]; queries with any
        # in-range corner are never clamped (pad > r + 2), far-OOB clamps
        # land fully inside the zero band
        sx = jnp.clip(x0.astype(jnp.int32) - r + pad, 0, w2 + 2 * pad - (n + 1))
        sy = jnp.clip(y0.astype(jnp.int32) - r + pad, 0, h2 + 2 * pad - (n + 1))

        patch = jax.vmap(
            lambda f, ys, xs: jax.lax.dynamic_slice(f, (ys, xs), (n + 1, n + 1))
        )(field, sy, sx)  # (q, n+1, n+1) = rows y, cols x

        s = (
            (1 - fy) * (1 - fx) * patch[:, :n, :n]
            + (1 - fy) * fx * patch[:, :n, 1:]
            + fy * (1 - fx) * patch[:, 1:, :n]
            + fy * fx * patch[:, 1:, 1:]
        )  # s[q, y_off, x_off]
        # reference layout: window position (i, j) samples (x+L[i], y+L[j])
        # -> channel (i, j) = s[j_y, i_x] = transpose of the (y, x) slab
        win = s.transpose(0, 2, 1)  # (q, x_off, y_off) = (q, i, j)
        out.append(win.reshape(b, h1, w1, n * n))
    return jnp.concatenate(out, axis=-1)
