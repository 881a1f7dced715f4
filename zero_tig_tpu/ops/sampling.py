"""Bilinear grid sampling with exact PyTorch ``F.grid_sample`` semantics.

The reference uses grid_sample in BOTH alignment conventions:
  * ``align_corners=False`` + zeros padding for backward warping
    (utils/utils.py:225), and
  * ``align_corners=True`` + zeros padding for RAFT correlation lookup
    (utils/utils.py:285-299).

Both are implemented as four masked gathers over a flattened image; XLA
lowers these to TPU gather ops and fuses the lerp arithmetic. A
pixel-coordinate fast path (`grid_sample_pixel`) skips the [-1,1]
normalize/denormalize round-trip for the corr lookup hot loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_2d(img_flat: jax.Array, ix: jax.Array, iy: jax.Array, w: int):
    """Gather img_flat (B, H*W, C) at integer (iy, ix) -> (B, ..., C)."""
    idx = iy * w + ix
    b = img_flat.shape[0]
    flat_idx = idx.reshape(b, -1)
    out = jnp.take_along_axis(img_flat, flat_idx[..., None], axis=1)
    return out.reshape(*idx.shape, img_flat.shape[-1])


def grid_sample_pixel(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Bilinear sample `img` (B,H,W,C) at pixel coords (x, y), zeros padding.

    Equivalent to torch grid_sample(align_corners=True, padding_mode='zeros')
    when the grid was built from pixel coordinates as in the reference
    ``bilinear_sampler`` (utils/utils.py:285-299): a corner pixel outside
    [0, W-1] x [0, H-1] contributes zero.

    x, y: (B, ...) pixel coordinates. Returns (B, ..., C).
    """
    b, h, w, c = img.shape
    # coordinate/weight math stays f32 even for low-precision images
    # (bf16 cannot represent pixel indices above 256 exactly)
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def corner_weight(xi, yi, wxi, wyi):
        inb = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        return jnp.where(inb, wxi * wyi, 0.0)

    w00 = corner_weight(x0, y0, wx0, wy0)
    w01 = corner_weight(x1, y0, wx1, wy0)
    w10 = corner_weight(x0, y1, wx0, wy1)
    w11 = corner_weight(x1, y1, wx1, wy1)

    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x1.astype(jnp.int32), 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y1.astype(jnp.int32), 0, h - 1)

    flat = img.reshape(b, h * w, c)
    out = (
        _gather_2d(flat, x0i, y0i, w).astype(jnp.float32) * w00[..., None]
        + _gather_2d(flat, x1i, y0i, w).astype(jnp.float32) * w01[..., None]
        + _gather_2d(flat, x0i, y1i, w).astype(jnp.float32) * w10[..., None]
        + _gather_2d(flat, x1i, y1i, w).astype(jnp.float32) * w11[..., None]
    )
    return out


def grid_sample_pixel_quad(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Bilinear sample via ONE gather instead of four (bit-identical output).

    The TPU gather unit is row-rate-bound at this payload size: four corner
    gathers of C channels cost ~4x one gather of 4C channels (measured
    33 ms -> 9 ms/frame at 1080p/6ch). So we gather all four corners in one
    row from a shifted-copy concat over a zero-padded image:

        quad[yq, xq] = [imgp[yq,xq], imgp[yq,xq+1], imgp[yq+1,xq], imgp[yq+1,xq+1]]

    where imgp is img zero-padded by 1, i.e. quad position (yq, xq) holds the
    2x2 corner block whose top-left source pixel is (yq-1, xq-1). The zero
    padding makes near-boundary corners read literal zeros, matching the
    torch padding_mode='zeros' semantics the corner-weight mask enforces.

    x, y: (B, ...) pixel coordinates. Returns (B, ..., C) in float32.
    """
    b, h, w, c = img.shape
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def corner_weight(xi, yi, wxi, wyi):
        inb = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        return jnp.where(inb, wxi * wyi, 0.0)

    w00 = corner_weight(x0, y0, wx0, wy0)
    w01 = corner_weight(x0 + 1.0, y0, wx1, wy0)
    w10 = corner_weight(x0, y0 + 1.0, wx0, wy1)
    w11 = corner_weight(x0 + 1.0, y0 + 1.0, wx1, wy1)

    imgp = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)))
    quad = jnp.concatenate(
        [imgp[:, :-1, :-1], imgp[:, :-1, 1:], imgp[:, 1:, :-1], imgp[:, 1:, 1:]],
        axis=-1,
    )  # (B, H+1, W+1, 4C)
    yq = jnp.clip(y0.astype(jnp.int32) + 1, 0, h)
    xq = jnp.clip(x0.astype(jnp.int32) + 1, 0, w)

    flat = quad.reshape(b, (h + 1) * (w + 1), 4 * c)
    idx = (yq * (w + 1) + xq).reshape(b, -1)
    g = jnp.take_along_axis(flat, idx[..., None], axis=1)
    g = g.reshape(*yq.shape, 4, c).astype(jnp.float32)
    return (
        g[..., 0, :] * w00[..., None]
        + g[..., 1, :] * w01[..., None]
        + g[..., 2, :] * w10[..., None]
        + g[..., 3, :] * w11[..., None]
    )


def _patchify(img: jax.Array) -> jax.Array:
    """(B, H, W, C<=8) -> (B, H+2, W+2, 128) where output channel
    (r*4+cc)*8+ch holds input channel ch of spatial tap (r, cc) of the 4x4
    patch whose top-left source pixel is (u-1, v-1).

    Sixteen shifted slices of the zero-padded, channel-padded image,
    concatenated along lanes: XLA fuses this into ONE pass over the image.
    Round 2 built the same operand with a one-hot (4,4,C,128) conv on the
    theory that hand-built shifted concats relayout badly; round-3
    profiling showed the conv itself ran at 23.4 ms/frame at 1080p (the
    single largest op in the pipeline) while this concat measures ~2 ms.
    """
    b, h, w, c = img.shape
    impad = jnp.pad(
        img.astype(jnp.bfloat16), ((0, 0), (1, 4), (1, 4), (0, 8 - c))
    )
    parts = [
        impad[:, r : r + h + 2, cc : cc + w + 2, :]
        for r in range(4)
        for cc in range(4)
    ]
    return jnp.concatenate(parts, axis=-1)


def grid_sample_pixel_block(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Bilinear sample with ONE 128-lane gather per 2x2 output block.

    The TPU gather unit is row-rate-bound (~10 ns/row regardless of payload
    up to 128 lanes, measured), so the per-pixel quad gather's 2.07M rows at
    1080p dominate the warp. This path gathers a 4x4xC source patch per 2x2
    OUTPUT block (4x fewer rows) from an operand built by a one-hot
    "patchify" convolution, then recovers each pixel's bilinear sample with
    hat-function weights over the patch (f32 weights/accumulation, zero
    padding for out-of-image corners -- same semantics as the quad path).

    Exactness: identical to grid_sample_pixel_quad whenever each block's
    corner span fits the 4x4 footprint, i.e. the sampling-position spread
    within a 2x2 output block is <= 2 px (always true for warp maps whose
    local gradient is below ~1 px/px -- RAFT-upsampled flows qualify away
    from occlusion boundaries; measured max diff 1.2e-7 on smooth fields).
    Blocks that violate the bound clamp to the nearest in-window source.
    Used for the fast-precision warp only; 'highest' keeps the exact quad.

    Requires even H/W and C <= 8 (caller falls back to the quad path).
    x, y: (B, H, W) pixel coordinates. Returns (B, H, W, C) float32.
    """
    b, h, w, c = img.shape
    patches = _patchify(img)
    # (b, h+2, w+2, 128); [u, v] = 4x4 patch with top-left source (u-1, v-1)

    hb, wb = h // 2, w // 2
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    # floor is monotone: block-min BEFORE floor skips the full-res floors
    ymin = jnp.clip(
        jnp.floor(jnp.min(y.reshape(b, hb, 2, wb, 2), axis=(2, 4))),
        -1.0, h - 1.0,
    )
    xmin = jnp.clip(
        jnp.floor(jnp.min(x.reshape(b, hb, 2, wb, 2), axis=(2, 4))),
        -1.0, w - 1.0,
    )
    idx = (
        (ymin.astype(jnp.int32) + 1) * (w + 2) + xmin.astype(jnp.int32) + 1
    ).reshape(b, -1)
    G = jnp.take_along_axis(
        patches.reshape(b, (h + 2) * (w + 2), 128), idx[..., None], axis=1
    ).reshape(b, hb, wb, 128)

    # a blockwise (b,hb,2,wb,2,16)x(b,hb,wb,16,c) einsum was tried here and
    # REGRESSED ~10 ms/frame at 1080p (lowers to batched tiny dots); the
    # repeat + full-res elementwise-reduce formulation is the measured best
    G2x = jnp.repeat(jnp.repeat(G, 2, axis=1), 2, axis=2)
    ymin_px = jnp.repeat(jnp.repeat(ymin, 2, axis=1), 2, axis=2)
    xmin_px = jnp.repeat(jnp.repeat(xmin, 2, axis=1), 2, axis=2)
    # hat weights over the 4 patch rows/cols reproduce the bilinear corner
    # weights exactly; the 0..3 clip makes fully-out-of-image samples read
    # the operand's zero padding (grid_sample zeros semantics)
    ty = jnp.clip(y - ymin_px, 0.0, 3.0)
    tx = jnp.clip(x - xmin_px, 0.0, 3.0)
    r4 = jnp.arange(4, dtype=jnp.float32)
    hy = jnp.clip(1.0 - jnp.abs(ty[..., None] - r4), 0.0, 1.0)
    hx = jnp.clip(1.0 - jnp.abs(tx[..., None] - r4), 0.0, 1.0)
    # bf16 hat weights: skips the f32 materialization of the (B,H,W,128)
    # patch operand (~1 GB at 1080p); weight rounding is ~0.4% relative,
    # measured against reference warps by the fast-mode quality gate
    wgt = (hy[..., :, None] * hx[..., None, :]).reshape(b, h, w, 16)
    # CPU's dot thunk rejects BF16xBF16=F32; tests run the f32 operands
    wdt = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    return jnp.einsum(
        "bhwk,bhwkc->bhwc",
        wgt.astype(wdt),
        G2x.reshape(b, h, w, 16, 8)[..., :c].astype(wdt),
        preferred_element_type=jnp.float32,
    )


def grid_sample_pixel_block_packed(
    img: jax.Array, x: jax.Array, y: jax.Array
) -> jax.Array:
    """``grid_sample_pixel_block`` emitting the packed-pair layout directly.

    Identical block gather and hat-weight math, but the output is
    (B, H, W/2, 2C) -- ops.xpack.pack2 order: [pixel0 channels | pixel1
    channels] per W-pair -- computed per pair so the gathered block operand
    repeats along H ONLY (a 2x2 block holds exactly two W-pairs that share
    its 4x4 source patch). Halves the block-operand broadcast traffic
    (~265 MB instead of ~530 MB bf16 at 1080p/128 lanes) and removes the
    NHWC round trip at the packed consumers' seam (VERDICT r4 item 7).
    Same exactness envelope as the NHWC twin (clamping at >1 px/px flow
    discontinuities); values bitwise-equal to pack2(block NHWC output).
    """
    b, h, w, c = img.shape
    patches = _patchify(img)
    hb, wb = h // 2, w // 2
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    ymin = jnp.clip(
        jnp.floor(jnp.min(y.reshape(b, hb, 2, wb, 2), axis=(2, 4))),
        -1.0, h - 1.0,
    )
    xmin = jnp.clip(
        jnp.floor(jnp.min(x.reshape(b, hb, 2, wb, 2), axis=(2, 4))),
        -1.0, w - 1.0,
    )
    idx = (
        (ymin.astype(jnp.int32) + 1) * (w + 2) + xmin.astype(jnp.int32) + 1
    ).reshape(b, -1)
    G = jnp.take_along_axis(
        patches.reshape(b, (h + 2) * (w + 2), 128), idx[..., None], axis=1
    ).reshape(b, hb, wb, 128)

    G2h = jnp.repeat(G, 2, axis=1)  # (b, h, wb, 128): H-only repeat
    ymin_r = jnp.repeat(ymin, 2, axis=1)  # (b, h, wb)
    xmin_r = jnp.repeat(xmin, 2, axis=1)
    # per-pixel coords viewed as W-pairs: (b, h, wb, 2)
    xp = x.reshape(b, h, wb, 2)
    yp = y.reshape(b, h, wb, 2)
    ty = jnp.clip(yp - ymin_r[..., None], 0.0, 3.0)
    tx = jnp.clip(xp - xmin_r[..., None], 0.0, 3.0)
    r4 = jnp.arange(4, dtype=jnp.float32)
    hy = jnp.clip(1.0 - jnp.abs(ty[..., None] - r4), 0.0, 1.0)  # (b,h,wb,2,4)
    hx = jnp.clip(1.0 - jnp.abs(tx[..., None] - r4), 0.0, 1.0)
    wgt = (hy[..., :, None] * hx[..., None, :]).reshape(b, h, wb, 2, 16)
    wdt = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    out = jnp.einsum(
        "bhpjk,bhpkc->bhpjc",
        wgt.astype(wdt),
        G2h.reshape(b, h, wb, 16, 8)[..., :c].astype(wdt),
        preferred_element_type=jnp.float32,
    )  # (b, h, wb, 2, c)
    return out.reshape(b, h, wb, 2 * c)


def grid_sample(
    img: jax.Array,
    grid: jax.Array,
    *,
    align_corners: bool = False,
) -> jax.Array:
    """torch ``F.grid_sample`` (bilinear, padding_mode='zeros'), NHWC.

    img: (B, H, W, C); grid: (B, Hg, Wg, 2) with normalized (x, y) in [-1, 1].
    Returns (B, Hg, Wg, C).
    """
    h, w = img.shape[1], img.shape[2]
    gx = grid[..., 0].astype(img.dtype)
    gy = grid[..., 1].astype(img.dtype)
    if align_corners:
        x = (gx + 1.0) * 0.5 * (w - 1)
        y = (gy + 1.0) * 0.5 * (h - 1)
    else:
        x = ((gx + 1.0) * w - 1.0) * 0.5
        y = ((gy + 1.0) * h - 1.0) * 0.5
    return grid_sample_pixel(img, x, y)


def coords_grid(batch: int, ht: int, wd: int, dtype=jnp.float32) -> jax.Array:
    """(B, H, W, 2) grid of (x, y) pixel coordinates.

    Parity: utils/utils.py:302-305 (channel order x then y), NHWC layout.
    """
    ys, xs = jnp.meshgrid(
        jnp.arange(ht, dtype=dtype), jnp.arange(wd, dtype=dtype), indexing="ij"
    )
    grid = jnp.stack([xs, ys], axis=-1)
    return jnp.broadcast_to(grid[None], (batch, ht, wd, 2))
