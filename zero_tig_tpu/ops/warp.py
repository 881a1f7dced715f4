"""Backward warping of the previous frame's output by RAFT flow.

Parity: ``warp_tensor`` (utils/utils.py:203-230), including the reference's
scale-swap quirk: ``map_x`` is multiplied by h_scale and ``map_y`` by w_scale
(utils/utils.py:215-216). This is harmless at the default operating point
(1080p frames, of_scale=3: both scales are 3.0) but is preserved so outputs
match the reference on every input shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.precision import get_mode
from .resize import resize_bilinear
from .sampling import grid_sample


def warp_tensor(
    flow: jax.Array,
    img1: jax.Array,
    img2: jax.Array | None = None,
    *,
    emit: str = "nhwc",
) -> tuple[jax.Array, jax.Array | None]:
    """Backward-warp `img1` to the current frame using flow at flow-res.

    flow: (B, Hf, Wf, 2) optical flow last->current at (possibly padded)
      flow resolution, (x, y) channel order.
    img1: (B, H, W, C) previous output to warp (full resolution).
    img2: (B, H, W, C) current frame, only used for the 0.5/0.5 overlap;
      pass None to skip the overlap (returned as None).
    emit: "nhwc" (default) or "packed" -- the latter returns the warped
      tensor in the packed-pair layout (B, H, W/2, 2C) straight from the
      fast block gather (no NHWC round trip, H-only block-operand repeat;
      ops/sampling.grid_sample_pixel_block_packed). Only valid in fast
      mode on the block path (even H/W, C <= 8) with img2 None.

    Returns (warped, overlap).
    """
    hf, wf = flow.shape[-3], flow.shape[-2]
    h_dst, w_dst = img1.shape[-3], img1.shape[-2]
    h_scale = float(h_dst) / float(hf)
    w_scale = float(w_dst) / float(wf)

    dtype = img1.dtype
    gy, gx = jnp.meshgrid(
        jnp.arange(hf, dtype=dtype), jnp.arange(wf, dtype=dtype), indexing="ij"
    )
    # Reference quirk (utils/utils.py:215-216): h_scale on x, w_scale on y.
    map_x = (gx[None] - flow[..., 0]) * h_scale
    map_y = (gy[None] - flow[..., 1]) * w_scale

    maps = jnp.stack([map_x, map_y], axis=-1)  # (B, Hf, Wf, 2)
    maps = resize_bilinear(maps, (h_dst, w_dst), align_corners=False)

    grid = jnp.stack(
        [
            maps[..., 0] / ((w_dst - 1) / 2.0) - 1.0,
            maps[..., 1] / ((h_dst - 1) / 2.0) - 1.0,
        ],
        axis=-1,
    )
    if get_mode() == "fast":
        # fast-mode warp, in order of preference (values bf16; coords,
        # weights and accumulation f32):
        #   1. block path: ONE 128-lane gather per 2x2 output block (the
        #      gather unit is row-rate-bound; 4x fewer rows than per-pixel
        #      quads). Exact vs the quad path on RAFT-smooth flows, clamps
        #      at >1 px/px flow discontinuities (see sampling doc).
        #   2. quad path: one gather of all 4 corners per pixel
        #      (bit-identical to the 4-gather reference formulation).
        from .sampling import (
            grid_sample_pixel_block,
            grid_sample_pixel_block_packed,
            grid_sample_pixel_quad,
        )

        px = ((grid[..., 0] + 1.0) * w_dst - 1.0) * 0.5
        py = ((grid[..., 1] + 1.0) * h_dst - 1.0) * 0.5
        c = img1.shape[-1]
        if emit == "packed":
            if not (h_dst % 2 == 0 and w_dst % 2 == 0 and c <= 8
                    and img2 is None):
                raise ValueError(
                    "emit='packed' requires the block path (even H/W, "
                    "C <= 8) and img2=None"
                )
            warped = grid_sample_pixel_block_packed(img1, px, py).astype(
                img1.dtype
            )
            return warped, None
        if h_dst % 2 == 0 and w_dst % 2 == 0 and c <= 8:
            warped = grid_sample_pixel_block(img1, px, py).astype(img1.dtype)
        else:
            warped = grid_sample_pixel_quad(
                img1.astype(jnp.bfloat16), px, py
            ).astype(img1.dtype)
    else:
        if emit == "packed":
            raise ValueError("emit='packed' is a fast-mode path")
        warped = grid_sample(img1, grid, align_corners=False)
    overlap = None if img2 is None else 0.5 * warped + 0.5 * img2
    return warped, overlap
