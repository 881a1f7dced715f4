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

from ...core.precision import conv_precision, get_mode


class CorrPyramid(NamedTuple):
    """Correlation pyramid: level i has shape (B*H1*W1, H2/2^i, W2/2^i).

    Rank-3 on purpose: a trailing singleton channel would lane-pad 1->128
    on TPU (the level-0 volume at the 1080p operating point would occupy
    ~3.3 GB physical instead of ~26 MB and be re-read every refinement
    iteration).
    """

    levels: tuple[jax.Array, ...]
    batch: int
    h1: int
    w1: int


def _avg_pool2(x: jax.Array) -> jax.Array:
    """2x2/stride-2 average over the last two dims of (Q, H, W); odd edge
    rows/cols dropped (torch F.avg_pool2d floor semantics, corr.py:25)."""
    he = (x.shape[1] // 2) * 2
    we = (x.shape[2] // 2) * 2
    x = x[:, :he, :we]
    return 0.25 * (
        x[:, 0::2, 0::2] + x[:, 1::2, 0::2]
        + x[:, 0::2, 1::2] + x[:, 1::2, 1::2]
    )


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
    corr = corr.reshape(b * h * w, h, w)
    if get_mode() == "fast":
        # bf16 volume halves the lookup read traffic (the level-0 volume is
        # re-read by every refinement iteration); accumulation stays f32
        corr = corr.astype(jnp.bfloat16)
    levels = [corr]
    for _ in range(num_levels - 1):
        corr = _avg_pool2(corr)
        levels.append(corr)
    return CorrPyramid(tuple(levels), b, h, w)


def lookup_corr(pyramid: CorrPyramid, coords: jax.Array, radius: int = 4) -> jax.Array:
    """Sample (2r+1)^2 windows at every level around `coords`.

    coords: (B, H1, W1, 2) pixel coordinates (x, y) at 1/8 resolution.
    Returns (B, H1, W1, num_levels*(2r+1)^2) cost features, level-major,
    window flattened (i, j)-major per the reference layout.

    TPU formulation -- NO gathers: bilinear interpolation is separable, so
    the whole (2r+1)^2 window sample of a query factorizes into two small
    batched matmuls against "hat function" weight matrices,

        wx[q, a, x] = max(0, 1 - |x - (x_q*scale + L[a])|)      (q, n, W2)
        T[q, y, a]  = sum_x corr[q, y, x] * wx[q, a, x]         (MXU)
        S[q, b, a]  = sum_y wy[q, b, y]   * T[q, y, a]          (MXU)

    The hat function is nonzero at exactly the two adjacent integer
    positions with the bilinear weights, and positions outside [0, size-1]
    simply don't exist in the contraction -- which IS grid_sample's zeros
    padding_mode. ~260 MFLOP/level at the 1080p operating point: trivial
    for the MXU, compiles in seconds (vs minutes for gather formulations),
    and runs entirely on the matrix unit instead of the scalar gather unit.
    """
    b, h1, w1, _ = coords.shape
    q = b * h1 * w1
    r = radius
    n = 2 * r + 1
    offs = jnp.arange(-r, r + 1, dtype=jnp.float32)

    cx = coords[..., 0].reshape(q).astype(jnp.float32)
    cy = coords[..., 1].reshape(q).astype(jnp.float32)

    out = []
    for i, corr_l in enumerate(pyramid.levels):
        h2, w2 = corr_l.shape[1], corr_l.shape[2]
        field = corr_l  # (q, h2, w2)
        scale = 1.0 / (2**i)
        # sample positions (q, n)
        sx = cx[:, None] * scale + offs[None, :]
        sy = cy[:, None] * scale + offs[None, :]
        xs = jnp.arange(w2, dtype=jnp.float32)
        ys = jnp.arange(h2, dtype=jnp.float32)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(xs[None, None, :] - sx[:, :, None]))
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(ys[None, None, :] - sy[:, :, None]))
        wx = wx.astype(field.dtype)
        wy = wy.astype(field.dtype)

        t = jnp.einsum(
            "qyx,qax->qya", field, wx,
            preferred_element_type=jnp.float32,
            precision=conv_precision(),
        )
        s = jnp.einsum(
            "qby,qya->qba", wy, t,
            preferred_element_type=jnp.float32,
            precision=conv_precision(),
        )
        # reference layout: window position (i, j) samples (x+L[i], y+L[j])
        # -> channel (i, j) = S[b=j, a=i] = transpose of the (y, x) slab
        win = s.transpose(0, 2, 1)  # (q, a_x, b_y) = (q, i, j)
        out.append(win.reshape(b, h1, w1, n * n))
    return jnp.concatenate(out, axis=-1)
