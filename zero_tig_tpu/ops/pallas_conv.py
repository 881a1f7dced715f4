"""Pallas TPU kernel: 3x3 stride-1 same-pad conv, bf16, f32 accumulation.

Why: XLA's conv emitter runs the pipeline's 1080p conv stacks (Denoise
3/48ch, Enhancer 9/64ch -- model/model.py:15-81) at <10% MXU utilization
(measured 8.4 ms for the 76-GMAC 64->64 3x3 at 1080p on one v5e, ~9% of
peak). This kernel reformulates the conv as row-wise im2col matmuls with
taps packed along the contraction dim so each dot contracts
K = group*Cin <= 128 lanes (full systolic fill for Cin >= 48; one dot for
the small-Cin stems), accumulating in f32.

Platform constraints shaped the data flow: this image's remote Mosaic
compiler rejects make_async_copy, pltpu.roll, and sublane slices at
unaligned offsets, so the kernel only ever reads full aligned rows. XLA
therefore stages THREE horizontally pre-shifted strip tensors (dx=0,1,2);
vertical taps come from the strip's row overlap, horizontal taps from
picking the dx-shifted input. The Pallas grid pipeline streams the strip
blocks through VMEM (W is tiled to fit with double buffering).

NOT WIRED into any model path (like ops/pallas_equalize.py): the
aligned-only staging variant measured slower than XLA's conv in round 2,
and round 3's packed-pair engine (ops/pack_conv.py) superseded this
row-im2col design -- kept as a correctness-tested record of the
aligned-slice formulation. Numerics: identical bf16 products, f32
accumulation in a different association order than XLA's conv.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TH = 8  # output rows per grid step


def _tap_groups(cin: int) -> tuple:
    """Group the 9 taps so each group's K = len*cin <= 128."""
    per = max(1, min(9, 128 // cin))
    taps = [(dy, dx) for dy in range(3) for dx in range(3)]
    return tuple(tuple(taps[i : i + per]) for i in range(0, 9, per))


def _conv_kernel(x0_ref, x1_ref, x2_ref, w_ref, b_ref, out_ref, *, tw, cin,
                 cout, groups):
    xs = (x0_ref, x1_ref, x2_ref)

    def row_body(r, _):
        acc = jnp.zeros((tw, cout), jnp.float32)
        for g, taps in enumerate(groups):
            parts = [xs[dx][0, r + dy, :, :] for (dy, dx) in taps]
            a = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
            acc = acc + jax.lax.dot_general(
                a, w_ref[g, 0 : len(taps) * cin, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        out_ref[0, r, :, :] = (acc + b_ref[0][None, :]).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, _TH, row_body, 0)


def _pick_tw(wdt: int) -> int:
    for tw in (512, 480, 384, 256, 128):
        if wdt % tw == 0:
            return tw
    return wdt


def conv3x3_bf16(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """y = conv3x3(x, w) + b; stride 1, same padding, NHWC/HWIO, bf16 MXU.

    x: (B, H, W, Cin); w: (3, 3, Cin, Cout); b: (Cout,) or None.
    Returns (B, H, W, Cout) in out_dtype. W must be a multiple of 8.
    """
    bsz, h, wdt, cin = x.shape
    cout = w.shape[-1]
    groups = _tap_groups(cin)
    tw = _pick_tw(wdt)

    h_pad = (-h) % _TH
    xp = jnp.pad(
        x.astype(jnp.bfloat16), ((0, 0), (1, 1 + h_pad), (1, 1), (0, 0))
    )
    ns = (h + h_pad) // _TH
    # three horizontally pre-shifted strip stacks; strip i covers input rows
    # [i*TH, i*TH + TH + 2) -- the grid pipeline double-buffers the blocks
    shifted = [
        jnp.stack(
            [xp[:, i * _TH : i * _TH + _TH + 2, dx : dx + wdt] for i in range(ns)],
            1,
        )
        for dx in range(3)
    ]  # each (B, NS, TH+2, W, cin)

    wb = w.astype(jnp.bfloat16)
    wg = [
        jnp.concatenate([wb[dy, dx] for (dy, dx) in taps], axis=0)
        for taps in groups
    ]
    kmax = max(g.shape[0] for g in wg)
    wgs = jnp.stack(
        [jnp.pad(g, ((0, kmax - g.shape[0]), (0, 0))) for g in wg]
    )  # (n_groups, kmax, cout); zero K-padding is exact
    bf = (
        jnp.zeros((cout,), jnp.float32) if b is None else b.astype(jnp.float32)
    )[None, :]

    in_block = pl.BlockSpec(
        (1, _TH + 2, tw, cin), lambda i, j: (i, 0, j, 0),
        memory_space=pltpu.VMEM,
    )

    def run_one(s0, s1, s2):
        return pl.pallas_call(
            functools.partial(
                _conv_kernel, tw=tw, cin=cin, cout=cout, groups=groups
            ),
            grid=(ns, wdt // tw),
            in_specs=[
                in_block, in_block, in_block,
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, _TH, tw, cout), lambda i, j: (i, 0, j, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((ns, _TH, wdt, cout), out_dtype),
            interpret=interpret,
        )(s0, s1, s2, wgs, bf)

    out = jax.vmap(run_one)(*shifted)  # (B, NS, TH, W, cout)
    return out.reshape(bsz, h + h_pad, wdt, cout)[:, :h]
