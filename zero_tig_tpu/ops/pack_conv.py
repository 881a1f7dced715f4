"""Packed-pair Pallas 3x3 convolutions: the fast-mode conv engine.

Why XLA's conv is slow here (measured, NOTES_ROUND2/round 3): the pipeline's
conv stacks carry 48/64 channels, and every (…, C<128) operand pads its lane
dimension to 128 on TPU -- half (64ch) to two-thirds (48ch) of HBM traffic
and MXU lanes are wasted. At 1080p the stacks are bandwidth-bound, so XLA
runs them ~3x off the speed of light.

This module removes the padding waste by packing TWO horizontally adjacent
pixels into one 128-lane row:

    NHWC (1, H, W, C)  --pad ring-->  (1, hp, W+2, C)   [hp = H+2 rounded
                       --reshape-->   (hp*(W+2)/2, 2C)   up to 8 rows]

and lowering the 3x3 conv to NINE in-VMEM shifted dot_generals against
(2Cin, 2Cout) weight blocks built host-side: a tap at (dy, dx) for output
pixel parity q reads input parity q' of packed-row shift s with
dx = 2s + q' - q, so each (dy, s) pair collects its taps into one block and
the MXU contracts a full 128-wide (for C=64) operand. BatchNorm (eval),
bias, activation, residual-add and the pad-ring re-zeroing all fuse into
the same kernel, so chained layers stay in packed layout with zero relayout
traffic between them.

Geometry: H and W must be even. Wp = W+2 stays even, so pixel parity is
column parity in every row and a vertical shift is exactly dy*(Wp/2) packed
rows. Blocks are 8 image rows of pairs; halo rows come from the neighbor
blocks via clamped index_maps (edge garbage only ever flows into ring
outputs, which the mask zeroes).

Remote-Mosaic constraints baked in (probed, round 3): block sublane dims and
in-kernel sublane-concat segment sizes must be multiples of 8, and -- the
big round-3 discovery -- the bare HTTP 500s that parked round 2's kernels
are the DEFAULT VMEM LIMIT: any kernel whose block working set passes
~16 MB dies with no diagnostic unless
``compiler_params=pltpu.CompilerParams(vmem_limit_bytes=...)`` raises it.
The ring mask is kept STATIC (four precomputed variants -- first, middle,
last, single block -- selected by the index_map), which avoids both
in-kernel integer div/mod and a few MB of iota temporaries.

Used by the inference fast path only (no custom VJP); 'highest' precision
keeps the XLA convs. Parity targets: the conv stacks of model/model.py:15-81
(Denoise_1/2, Enhancer).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hp_pad(h: int) -> int:
    """Padded row count: >= h+2, multiple of 8 (Mosaic requires block
    sublane dims divisible by 8; blocks span whole packed rows)."""
    return ((h + 2 + 7) // 8) * 8


def pack(x: jax.Array) -> jax.Array:
    """(1, H, W, C) -> (hp*(W+2)/2, 2C) zero-ring padded, pair-packed."""
    b, h, w, c = x.shape
    assert b == 1 and h % 2 == 0 and w % 2 == 0, (b, h, w)
    xp = jnp.pad(x, ((0, 0), (1, _hp_pad(h) - h - 1), (1, 1), (0, 0)))
    return xp.reshape(_hp_pad(h) * (w + 2) // 2, 2 * c)


def unpack(xp: jax.Array, h: int, w: int) -> jax.Array:
    """Inverse of pack: (hp*(W+2)/2, 2C) -> (1, H, W, C)."""
    c2 = xp.shape[-1]
    x = xp.reshape(1, _hp_pad(h), w + 2, c2 // 2)
    return x[:, 1 : h + 1, 1:-1, :]


def build_weight_blocks(w_hwio: jax.Array) -> jax.Array:
    """(3, 3, Cin, Cout) -> (9*2Cin, 2Cout) stacked (dy, s) blocks, bf16.

    Block (dy, s) maps packed-row shift dy*(Wp/2)+s; its quadrant
    [q_in*Cin:(q_in+1)*Cin, q_out*Cout:(q_out+1)*Cout] holds tap
    w[dy+1, dx+1] where dx = 2s + q_in - q_out (zero if |dx| > 1).
    Traceable (params arrive as tracers inside the jitted step); the
    assembly is a handful of tiny static scatters XLA folds away.
    """
    _, _, cin, cout = w_hwio.shape
    w = w_hwio.astype(jnp.float32)
    blocks = jnp.zeros((9, 2 * cin, 2 * cout), jnp.float32)
    for dy in range(3):
        for si, s in enumerate((-1, 0, 1)):
            k = dy * 3 + si
            for q_in in range(2):
                for q_out in range(2):
                    dx = 2 * s + q_in - q_out
                    if abs(dx) <= 1:
                        blocks = blocks.at[
                            k,
                            q_in * cin : (q_in + 1) * cin,
                            q_out * cout : (q_out + 1) * cout,
                        ].set(w[dy, dx + 1])
    return blocks.reshape(9 * 2 * cin, 2 * cout).astype(jnp.bfloat16)


_MASK_CACHE: dict = {}


def _ring_masks(h: int, w: int, cout2: int) -> jax.Array:
    """(4, bh, cout2) bf16 {first, middle, last, single}-block ring masks.

    Row j of block i is the packed pixel pair (2(i*bh+j), 2(i*bh+j)+1);
    the mask zeroes the pad ring: image row y=0 (first block), rows beyond
    y=h (last block, including alignment tail), and columns x=0 / x=W+1
    (periodic with period wpp rows, identical in every block since
    bh = 8*wpp)."""
    key = (h, w, cout2)
    if key not in _MASK_CACHE:
        wp = w + 2
        wpp = wp // 2
        bh = 4 * wp
        grid = _hp_pad(h) * wpp // bh
        cout = cout2 // 2
        col = np.ones((bh, cout2), np.float32)
        for j in range(bh):
            c0 = (2 * j) % wp
            if c0 == 0:
                col[j, :cout] = 0.0
            if c0 + 2 == wp:  # pixel1 column == wp-1
                col[j, cout:] = 0.0
        first = col.copy()
        first[:wpp, :] = 0.0
        last = col.copy()
        lo = (h + 1) * wpp - (grid - 1) * bh
        last[max(lo, 0) :, :] = 0.0
        single = first.copy()
        single[max(lo, 0) :, :] = 0.0
        m = np.stack([first, col, last, single])
        _MASK_CACHE[key] = np.asarray(m, np.float32)
    return jnp.asarray(_MASK_CACHE[key], jnp.bfloat16)


def _kernel(
    xm1_ref, x0_ref, xp1_ref, wb_ref, sc_ref, sh_ref, mask_ref, o_ref,
    *, bh: int, hal: int, wpp: int,
    cin2: int, cout2: int, act: str, residual: bool,
):
    win = jnp.concatenate(
        [xm1_ref[bh - hal :, :], x0_ref[...], xp1_ref[:hal, :]], axis=0
    )
    acc = jnp.zeros((bh, cout2), jnp.float32)
    for dy in range(3):
        for si, s in enumerate((-1, 0, 1)):
            k = dy * 3 + si
            off = hal + (dy - 1) * wpp + s
            acc += jax.lax.dot_general(
                win[off : off + bh, :],
                wb_ref[k * cin2 : (k + 1) * cin2, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc = acc * sc_ref[...] + sh_ref[...]
    if act == "relu":
        acc = jnp.maximum(acc, 0.0)
    elif act == "leaky":
        acc = jnp.where(acc >= 0, acc, 0.2 * acc)
    elif act == "sigmoid_clip":
        acc = jnp.clip(jax.nn.sigmoid(acc), 0.0001, 1.0)
    if residual:
        acc = acc + x0_ref[...].astype(jnp.float32)
    o_ref[...] = (acc * mask_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def conv3x3_packed(
    xp: jax.Array,
    wblocks: jax.Array,
    scale: jax.Array,
    shift: jax.Array,
    *,
    h: int,
    w: int,
    act: str = "none",
    residual: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """One fused 3x3 conv layer on packed layout.

    xp: (hp*(W+2)/2, 2Cin) bf16 with a zeroed pad ring.
    wblocks: build_weight_blocks output (9*2Cin, 2Cout).
    scale/shift: (2Cout,) f32 -- fused eval-BN/bias: out = conv*scale+shift.
    act: none | relu | leaky | sigmoid_clip. residual: add xp (Cin==Cout).
    Returns (hp*(W+2)/2, 2Cout) bf16 with a zeroed ring.
    """
    hp, wp = _hp_pad(h), w + 2
    wpp = wp // 2
    n = hp * wpp
    bh = 4 * wp  # 8 image rows of pairs: divisible by 8, divides n, >= hal
    hal = ((wpp + 1 + 7) // 8) * 8  # 8-aligned halo (concat segment sizes)
    assert n % bh == 0 and bh % 8 == 0 and bh >= hal, (n, bh, hal)
    grid = n // bh
    cin2 = xp.shape[-1]
    cout2 = wblocks.shape[-1]
    masks = _ring_masks(h, w, cout2)

    if grid == 1:
        mask_index = lambda i: (3, 0, 0)
    else:
        mask_index = lambda i, g=grid: (
            jnp.where(i == 0, 0, jnp.where(i == g - 1, 2, 1)), 0, 0,
        )

    kern = functools.partial(
        _kernel, bh=bh, hal=hal, wpp=wpp,
        cin2=cin2, cout2=cout2, act=act, residual=residual,
    )
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((bh, cin2), lambda i: (jnp.maximum(i - 1, 0), 0)),
            pl.BlockSpec((bh, cin2), lambda i: (i, 0)),
            pl.BlockSpec(
                (bh, cin2), lambda i, g=grid: (jnp.minimum(i + 1, g - 1), 0)
            ),
            pl.BlockSpec((9 * cin2, cout2), lambda i: (0, 0)),
            pl.BlockSpec((1, cout2), lambda i: (0, 0)),
            pl.BlockSpec((1, cout2), lambda i: (0, 0)),
            pl.BlockSpec((1, bh, cout2), mask_index),
        ],
        out_specs=pl.BlockSpec((bh, cout2), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, cout2), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            # let XLA fuse pack's pad+reshape producers into the three
            # image-block reads instead of materializing them in HBM
            allow_input_fusion=[True, True, True, False, False, False, False],
        ),
        interpret=interpret,
    )(
        xb := xp.astype(jnp.bfloat16),
        xb,
        xb,
        wblocks,
        scale.astype(jnp.float32).reshape(1, cout2),
        shift.astype(jnp.float32).reshape(1, cout2),
        masks,
    )


def pair_params(v: jax.Array) -> jax.Array:
    """(C,) per-channel vector -> (2C,) packed-pair layout (tiled twice)."""
    return jnp.concatenate([v, v], axis=0)


def build_weight_blocks_multi(
    w_hwio: jax.Array, splits: tuple[int, ...]
) -> jax.Array:
    """Weight blocks for a MULTI-INPUT packed conv: the operand is the
    in-kernel lane concatenation of J separately packed inputs (input j
    contributing lanes [2*sum(splits[:j]), ...) as [parity0 c_j |
    parity1 c_j]), avoiding the HBM materialization of the channel
    concat that XLA glue would otherwise write (profiled 2-3 ms per
    (N, 2C<=24) operand at 1080p). w_hwio's input-channel dim is the
    SEMANTIC order = concat(splits). Returns (9*2Cin, 2Cout) bf16."""
    _, _, cin, cout = w_hwio.shape
    assert sum(splits) == cin, (splits, cin)
    w = w_hwio.astype(jnp.float32)
    blocks = jnp.zeros((9, 2 * cin, 2 * cout), jnp.float32)
    for dy in range(3):
        for si, s in enumerate((-1, 0, 1)):
            k = dy * 3 + si
            for q_in in range(2):
                for q_out in range(2):
                    dx = 2 * s + q_in - q_out
                    if abs(dx) > 1:
                        continue
                    base = 0
                    off = 0
                    for cj in splits:
                        blocks = blocks.at[
                            k,
                            base + q_in * cj : base + (q_in + 1) * cj,
                            q_out * cout : (q_out + 1) * cout,
                        ].set(w[dy, dx + 1, off : off + cj])
                        base += 2 * cj
                        off += cj
    return blocks.reshape(9 * 2 * cin, 2 * cout).astype(jnp.bfloat16)


def _kernel_multi(*refs, bh, hal, wpp, cin2s, cout2, act):
    # no residual variant: multi-input callers fuse their residual adds via
    # residual1x1_packed_multi instead (a `residual` kwarg here was never
    # implemented -- removed rather than left as a silent no-op)
    nin = len(cin2s)
    wb_ref = refs[3 * nin]
    sc_ref = refs[3 * nin + 1]
    sh_ref = refs[3 * nin + 2]
    mask_ref = refs[3 * nin + 3]
    o_ref = refs[3 * nin + 4]
    wins = []
    for j in range(nin):
        xm1, x0, xp1 = refs[3 * j : 3 * j + 3]
        wins.append(
            jnp.concatenate(
                [xm1[bh - hal :, :], x0[...], xp1[:hal, :]], axis=0
            )
        )
    cin2 = sum(cin2s)
    acc = jnp.zeros((bh, cout2), jnp.float32)
    for dy in range(3):
        for si, s in enumerate((-1, 0, 1)):
            k = dy * 3 + si
            off = hal + (dy - 1) * wpp + s
            operand = jnp.concatenate(
                [win[off : off + bh, :] for win in wins], axis=1
            )
            acc += jax.lax.dot_general(
                operand,
                wb_ref[k * cin2 : (k + 1) * cin2, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc = acc * sc_ref[...] + sh_ref[...]
    if act == "relu":
        acc = jnp.maximum(acc, 0.0)
    elif act == "leaky":
        acc = jnp.where(acc >= 0, acc, 0.2 * acc)
    elif act == "sigmoid_clip":
        acc = jnp.clip(jax.nn.sigmoid(acc), 0.0001, 1.0)
    o_ref[...] = (acc * mask_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def conv3x3_packed_multi(
    xps: list[jax.Array],
    wblocks: jax.Array,
    scale: jax.Array,
    shift: jax.Array,
    *,
    h: int,
    w: int,
    act: str = "none",
    interpret: bool = False,
) -> jax.Array:
    """Multi-input fused 3x3 conv: the channel concat of the packed inputs
    happens in VMEM (per-tap lane concat), never in HBM.

    xps: packed inputs [(N, 2c_j)...] with zeroed rings; wblocks from
    build_weight_blocks_multi with matching splits.
    """
    hp, wp = _hp_pad(h), w + 2
    wpp = wp // 2
    n = hp * wpp
    bh = 4 * wp
    hal = ((wpp + 1 + 7) // 8) * 8
    assert n % bh == 0 and bh % 8 == 0 and bh >= hal, (n, bh, hal)
    grid = n // bh
    cin2s = tuple(x.shape[-1] for x in xps)
    cout2 = wblocks.shape[-1]
    masks = _ring_masks(h, w, cout2)

    if grid == 1:
        mask_index = lambda i: (3, 0, 0)
    else:
        mask_index = lambda i, g=grid: (
            jnp.where(i == 0, 0, jnp.where(i == g - 1, 2, 1)), 0, 0,
        )

    kern = functools.partial(
        _kernel_multi, bh=bh, hal=hal, wpp=wpp,
        cin2s=cin2s, cout2=cout2, act=act,
    )
    in_specs = []
    args = []
    for x, c2 in zip(xps, cin2s):
        xb = x.astype(jnp.bfloat16)
        in_specs += [
            pl.BlockSpec((bh, c2), lambda i: (jnp.maximum(i - 1, 0), 0)),
            pl.BlockSpec((bh, c2), lambda i: (i, 0)),
            pl.BlockSpec(
                (bh, c2), lambda i, g=grid: (jnp.minimum(i + 1, g - 1), 0)
            ),
        ]
        args += [xb, xb, xb]
    in_specs += [
        pl.BlockSpec((wblocks.shape[0], cout2), lambda i: (0, 0)),
        pl.BlockSpec((1, cout2), lambda i: (0, 0)),
        pl.BlockSpec((1, cout2), lambda i: (0, 0)),
        pl.BlockSpec((1, bh, cout2), mask_index),
    ]
    args += [
        wblocks,
        scale.astype(jnp.float32).reshape(1, cout2),
        shift.astype(jnp.float32).reshape(1, cout2),
        masks,
    ]
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bh, cout2), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, cout2), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)


def _res1x1_kernel(
    x_ref, a_ref, wb_ref, b_ref, mask_ref, o_ref, *, lo: float, hi: float
):
    out = jax.lax.dot_general(
        x_ref[...], wb_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_ref[...]
    out = jnp.clip(a_ref[...].astype(jnp.float32) - out, lo, hi)
    o_ref[...] = (out * mask_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def _res1x1_multi_kernel(
    *refs, nanch: int, lo: float, hi: float
):
    x_ref = refs[0]
    anchors = refs[1 : 1 + nanch]
    wb_ref, b_ref, mask_ref, o_ref = refs[1 + nanch :]
    # anchor lane order [p0 (c_0..c_{J-1}) | p1 (...)]: interleave halves
    parts = [a[...][:, : a.shape[-1] // 2] for a in anchors] + [
        a[...][:, a.shape[-1] // 2 :] for a in anchors
    ]
    anchor = jnp.concatenate(parts, axis=1)
    out = jax.lax.dot_general(
        x_ref[...], wb_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_ref[...]
    out = jnp.clip(anchor.astype(jnp.float32) - out, lo, hi)
    o_ref[...] = (out * mask_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def residual1x1_packed_multi(
    xp: jax.Array,
    anchors: list[jax.Array],
    w: jax.Array,
    b: jax.Array,
    *,
    h: int,
    w_img: int,
    lo: float = 1e-4,
    hi: float = 1.0,
    interpret: bool = False,
) -> jax.Array:
    """residual1x1_packed with the anchor assembled IN VMEM from separately
    packed parts (semantic channel order = concat of the parts), skipping
    the HBM materialization of the anchor concat."""
    hp, wp = _hp_pad(h), w_img + 2
    n = hp * wp // 2
    bh = 4 * wp
    grid = n // bh
    cin2 = xp.shape[-1]
    cin = cin2 // 2
    cout = w.shape[-1]
    cout2 = 2 * cout
    assert sum(a.shape[-1] for a in anchors) == cout2, (cout2,)
    masks = _ring_masks(h, w_img, cout2)

    wb = jnp.zeros((2 * cin, cout2), jnp.bfloat16)
    wb = wb.at[:cin, :cout].set(w.astype(jnp.bfloat16))
    wb = wb.at[cin:, cout:].set(w.astype(jnp.bfloat16))

    if grid == 1:
        mask_index = lambda i: (3, 0, 0)
    else:
        mask_index = lambda i, g=grid: (
            jnp.where(i == 0, 0, jnp.where(i == g - 1, 2, 1)), 0, 0,
        )
    kern = functools.partial(
        _res1x1_multi_kernel, nanch=len(anchors), lo=lo, hi=hi
    )
    in_specs = [pl.BlockSpec((bh, cin2), lambda i: (i, 0))]
    args = [xp.astype(jnp.bfloat16)]
    for a in anchors:
        in_specs.append(pl.BlockSpec((bh, a.shape[-1]), lambda i: (i, 0)))
        args.append(a.astype(jnp.bfloat16))
    in_specs += [
        pl.BlockSpec((2 * cin, cout2), lambda i: (0, 0)),
        pl.BlockSpec((1, cout2), lambda i: (0, 0)),
        pl.BlockSpec((1, bh, cout2), mask_index),
    ]
    args += [
        wb,
        pair_params(b).astype(jnp.float32).reshape(1, cout2),
        masks,
    ]
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bh, cout2), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, cout2), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)


def residual1x1_packed(
    xp: jax.Array,
    anchor: jax.Array,
    w: jax.Array,
    b: jax.Array,
    *,
    h: int,
    w_img: int,
    lo: float = 1e-4,
    hi: float = 1.0,
    interpret: bool = False,
) -> jax.Array:
    """Fused ``clip(anchor - (conv1x1(x) + bias), lo, hi)`` with the pad
    ring re-zeroed -- the denoisers' final stage (residual prediction,
    model/model.py:24-28, :40-44 composed with the clamp at :152, :180, :335).

    The ring masking keeps the result chainable as conv zero-padding (an
    XLA matmul would put ``clip(0 - bias, ...)`` on the ring).

    xp: (N, 2Cin); anchor: (N, 2Cout); w: (Cin, Cout); b: (Cout,).
    """
    hp, wp = _hp_pad(h), w_img + 2
    n = hp * wp // 2
    bh = 4 * wp
    grid = n // bh
    cin2 = xp.shape[-1]
    cin = cin2 // 2
    cout = w.shape[-1]
    cout2 = 2 * cout
    masks = _ring_masks(h, w_img, cout2)

    wb = jnp.zeros((2 * cin, cout2), jnp.bfloat16)
    wb = wb.at[:cin, :cout].set(w.astype(jnp.bfloat16))
    wb = wb.at[cin:, cout:].set(w.astype(jnp.bfloat16))

    if grid == 1:
        mask_index = lambda i: (3, 0, 0)
    else:
        mask_index = lambda i, g=grid: (
            jnp.where(i == 0, 0, jnp.where(i == g - 1, 2, 1)), 0, 0,
        )
    kern = functools.partial(_res1x1_kernel, lo=lo, hi=hi)
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((bh, cin2), lambda i: (i, 0)),
            pl.BlockSpec((bh, cout2), lambda i: (i, 0)),
            pl.BlockSpec((2 * cin, cout2), lambda i: (0, 0)),
            pl.BlockSpec((1, cout2), lambda i: (0, 0)),
            pl.BlockSpec((1, bh, cout2), mask_index),
        ],
        out_specs=pl.BlockSpec((bh, cout2), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, cout2), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            allow_input_fusion=[True, True, False, False, False],
        ),
        interpret=interpret,
    )(
        xp.astype(jnp.bfloat16),
        anchor.astype(jnp.bfloat16),
        wb,
        pair_params(b).astype(jnp.float32).reshape(1, cout2),
        masks,
    )


def matmul1x1_packed(
    xp: jax.Array, w: jax.Array, b: jax.Array
) -> jax.Array:
    """1x1 conv on packed layout: block-diagonal matmul.

    xp: (N, 2Cin); w: (Cin, Cout) [HWIO (1,1,Cin,Cout) squeezed]; b: (Cout,).
    The bias lands on the pad ring too; harmless because 1x1 convs are the
    stacks' LAST layer and unpack's slice drops the ring.
    """
    cin = xp.shape[-1] // 2
    cout = w.shape[-1]
    wb = jnp.zeros((2 * cin, 2 * cout), jnp.bfloat16)
    wb = wb.at[:cin, :cout].set(w.astype(jnp.bfloat16))
    wb = wb.at[cin:, cout:].set(w.astype(jnp.bfloat16))
    out = jax.lax.dot_general(
        xp.astype(jnp.bfloat16), wb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (out + pair_params(b)).astype(jnp.bfloat16)
