"""Packed-pair convolutions as PLAIN XLA convs: the fast-mode conv layout.

Same idea as the Pallas engine (ops/pack_conv.py) -- two horizontally
adjacent pixels share one 128-lane row so the 48/64-channel stacks stop
wasting half to two-thirds of their HBM traffic on lane padding -- but
lowered as a single ``lax.conv_general_dilated`` on the packed layout, so
it composes with XLA's fusion like any other conv: no custom-call
boundaries, no scan buffer copies, gradients for free.

Layout:  (B, H, W, C) --reshape--> (B, H, W/2, 2C), lanes = [pixel0 C |
pixel1 C].  A 3x3 conv becomes a 3x3 conv over the packed grid with
(2Cin, 2Cout) channel blocks per tap: output parity q_out at packed column
xp reads input parity q_in of packed column xp+s where the original
horizontal offset is dx = 2s + q_in - q_out; taps with |dx| > 1 are zero.
SAME padding on the packed width reproduces zero-padded conv semantics
exactly (the pad column supplies both border pixels), so unlike the Pallas
engine there is no pad ring and no mask bookkeeping.

The packed conv spends 2x the MACs of the unpacked one (the zero quadrants
multiply anyway) but at 1080p the stacks are HBM-bound, not MXU-bound:
measured on one v5e, 2.38 -> 1.73 ms per 64-channel 3x3 layer (conv fusion
time; the padded-lane traffic halves).  Elementwise glue between layers
(clips, divisions, residual adds, channel concats) runs on packed operands
and halves the same way.

Weight packing (blocks3x3 / blocks1x1 / pairc) is cheap -- static concats
of the (3,3,C,C) kernels -- and XLA hoists it out of scan bodies fine
(hoisting it manually changed nothing, measured). The chunked pipelines
still precompute packed weights ONCE per program before the scan
(models/xla_fastpath.precompute) so the conv entry points below take
already-packed operands: it keeps the scan body small and the packing
explicit rather than trusting loop-invariant code motion.

Used by the fast inference path (models/network._forward_inference_xpack).
Parity targets: the conv stacks of model/model.py:15-81.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.precision import conv_precision


def pack2(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H, W//2, 2C); lanes = [pixel0 C | pixel1 C]."""
    b, h, w, c = x.shape
    assert w % 2 == 0, w
    return x.reshape(b, h, w // 2, 2 * c)


def unpack2(xp: jax.Array) -> jax.Array:
    """Inverse of pack2: (B, H, Wp, 2C) -> (B, H, 2*Wp, C)."""
    b, h, wp, c2 = xp.shape
    return xp.reshape(b, h, 2 * wp, c2 // 2)


def cat_packed(parts: list[jax.Array]) -> jax.Array:
    """Semantic channel concat of packed tensors: [p0(all parts) | p1(...)].

    Equivalent to pack2(concat([unpack2(p) for p in parts], -1)) as one
    lane shuffle XLA folds into the consumer.
    """
    half = [p[..., : p.shape[-1] // 2] for p in parts]
    return jnp.concatenate(
        half + [p[..., p.shape[-1] // 2 :] for p in parts], axis=-1
    )


def blocks3x3(w_hwio: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """(3, 3, Cin, Cout) -> (3, 3, 2Cin, 2Cout) packed-pair conv kernel.

    Tap (dy, s) quadrant [q_in*Cin:(q_in+1)*Cin, q_out*Cout:...] holds the
    original tap w[dy, dx+1] with dx = 2s + q_in - q_out (zero if |dx| > 1).
    Built from static concats (cheap HLO); precompute OUTSIDE scan bodies
    (see module docstring).
    """
    _, _, cin, cout = w_hwio.shape
    w = w_hwio.astype(jnp.float32)
    z = jnp.zeros((cin, cout), jnp.float32)

    def quad(dy: int, s: int, q_in: int, q_out: int) -> jax.Array:
        dx = 2 * s + q_in - q_out
        return w[dy, dx + 1] if abs(dx) <= 1 else z

    taps = []
    for dy in range(3):
        row = []
        for s in (-1, 0, 1):
            blk = jnp.concatenate(
                [
                    jnp.concatenate([quad(dy, s, 0, 0), quad(dy, s, 0, 1)], 1),
                    jnp.concatenate([quad(dy, s, 1, 0), quad(dy, s, 1, 1)], 1),
                ],
                0,
            )
            row.append(blk)
        taps.append(jnp.stack(row))
    return jnp.stack(taps).astype(dtype)


def blocks1x1(w: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """(Cin, Cout) 1x1 kernel -> (1, 1, 2Cin, 2Cout) block-diagonal packed."""
    cin, cout = w.shape
    wf = w.astype(jnp.float32)
    z = jnp.zeros((cin, cout), jnp.float32)
    wb = jnp.concatenate(
        [jnp.concatenate([wf, z], 1), jnp.concatenate([z, wf], 1)], 0
    )
    return wb.astype(dtype).reshape(1, 1, 2 * cin, 2 * cout)


def pairc(v: jax.Array) -> jax.Array:
    """(C,) per-channel vector -> (2C,) packed-pair layout (tiled twice)."""
    return jnp.concatenate([v, v], axis=0)


def conv3x3p(
    xp: jax.Array,
    wp: jax.Array,
    bias2: jax.Array | None = None,
    *,
    scale2: jax.Array | None = None,
    shift2: jax.Array | None = None,
    act: str = "none",
    residual: bool = False,
) -> jax.Array:
    """Fused 3x3 conv layer on the packed layout (all ops XLA-fusible).

    xp: (B, H, Wp, 2Cin).  wp: PACKED (3, 3, 2Cin, 2Cout) kernel
    (blocks3x3).  Either ``bias2`` (packed conv bias, (2Cout,) = pairc) or
    folded eval-BN ``scale2``/``shift2`` ((2Cout,) each: out = conv*scale +
    shift).  act: none | relu | leaky | sigmoid_clip.  residual: add xp
    (Cin==Cout), AFTER the activation (the Enhancer's shared-block
    structure, model/model.py:60-67).
    """
    dt = xp.dtype
    out = jax.lax.conv_general_dilated(
        xp,
        wp.astype(dt),
        window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=conv_precision(),
    )
    if scale2 is not None:
        out = (
            out.astype(jnp.float32) * scale2.astype(jnp.float32)
            + shift2.astype(jnp.float32)
        ).astype(dt)
    elif bias2 is not None:
        out = out + bias2.astype(dt)
    if act == "relu":
        out = jnp.maximum(out, 0)
    elif act == "leaky":
        out = jnp.where(out >= 0, out, jnp.asarray(0.2, dt) * out)
    elif act == "sigmoid_clip":
        out = jnp.clip(jax.nn.sigmoid(out), 0.0001, 1.0)
    if residual:
        out = out + xp
    return out


def conv1x1p(xp: jax.Array, wp: jax.Array, bias2: jax.Array) -> jax.Array:
    """1x1 conv on the packed layout.

    wp: PACKED block-diagonal (1, 1, 2Cin, 2Cout) kernel (blocks1x1);
    bias2: (2Cout,) packed bias (pairc).
    """
    dt = xp.dtype
    out = jax.lax.conv_general_dilated(
        xp,
        wp.astype(dt),
        window_strides=(1, 1),
        padding=[(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=conv_precision(),
    )
    return out + bias2.astype(dt)
