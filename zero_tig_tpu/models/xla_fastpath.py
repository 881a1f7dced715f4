"""Fast-mode conv stacks on the XLA packed-pair layout (ops/xpack.py);
stack selection via precision.set_xpack (default: all three stacks, with
Denoise_1's packed IO zero-padded to 8 lanes -- see that docstring for
the lane-alignment constraint the padding satisfies).

The whole inference conv chain -- Denoise_1, Enhancer, Denoise_2 and the
elementwise glue between them -- runs on (B, H, W/2, 2C) operands, halving
the lane-padded HBM traffic of every conv and every materialized
intermediate while staying inside XLA's fusion (unlike the Pallas engine in
ops/pack_conv.py, which wins per-kernel but pays custom-call boundaries).

Weight packing is done ONCE per dispatched program by ``precompute``; the
chunked pipelines call it before their scan and thread the packed pytree
through forward_inference (structural hygiene -- XLA's loop-invariant
code motion handles inline packing too, measured identical).

Numerics: identical products to the fast-mode XLA convs (models/layers.Conv)
-- the extra packed-kernel quadrants multiply exact zeros -- with bf16
rounding differences only from accumulation order; gated like every
fast-mode change by tools/quality_gate.py.

Parity: Denoise_1 (model/model.py:15-28), Denoise_2 (:31-44), Enhancer
(:47-81) including the shared conv+BN block applied 3x with eval-mode
(running-stats) BatchNorm folded into a per-channel scale/shift.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.xpack import blocks1x1, blocks3x3, conv1x1p, conv3x3p, pairc

_BN_EPS = 1e-5


def folded_bn(params: dict, batch_stats: dict) -> tuple[jax.Array, jax.Array]:
    """Fold the shared block's conv bias + eval BatchNorm into (scale, shift):
    relu(bn(conv(x) + b)) == relu(conv_nobias(x) * scale + shift)."""
    bn = params["block"]["bn"]
    stats = batch_stats["block"]["bn"]
    inv = jax.lax.rsqrt(stats["var"].astype(jnp.float32) + _BN_EPS)
    scale = bn["scale"].astype(jnp.float32) * inv
    shift = (
        bn["bias"].astype(jnp.float32)
        + (
            params["block"]["conv"]["bias"].astype(jnp.float32)
            - stats["mean"].astype(jnp.float32)
        )
        * scale
    )
    return scale, shift


def _pad_ch(w: jax.Array, cin_pad: int, cout_pad: int) -> jax.Array:
    """Zero-pad a (kh, kw, cin, cout) kernel's channel dims."""
    return jnp.pad(w, ((0, 0), (0, 0), (0, cin_pad), (0, cout_pad)))


def _pack_denoise(params: dict, cin_pad: int = 0, cout_pad: int = 0) -> dict:
    """Pack a denoiser; optionally zero-pad its packed-layout IO channels.

    Denoise_1's natural packed IO is 6 lanes (2x3 ch) -- NOT a multiple of
    the 8-sublane tile, and at 1080p that tips XLA's global layout
    assignment into a catastrophic channel-major layout for the warp's
    patchify gather table downstream (~31 ms/frame of zero-fill loop +
    relayout; see precision.set_xpack). Padding its in/out to 4 ch/pixel
    (8 packed lanes) removes the trigger: the pad input channel is zeros
    (kernel rows zero -> identical products) and the pad output channel is
    sliced away by the caller, so the math is exactly unchanged.
    """
    return {
        "k1": blocks3x3(_pad_ch(params["conv1"]["kernel"], cin_pad, 0)),
        "b1": pairc(params["conv1"]["bias"]),
        "k2": blocks3x3(params["conv2"]["kernel"]),
        "b2": pairc(params["conv2"]["bias"]),
        "k3": blocks1x1(
            _pad_ch(params["conv3"]["kernel"], 0, cout_pad)[0, 0]
        ),
        "b3": pairc(jnp.pad(params["conv3"]["bias"], (0, cout_pad))),
    }


def precompute(params: dict, batch_stats: dict, parts=None) -> dict:
    """Pack the selected stacks' conv weights into the packed-pair layout.

    parts: subset of {"d1", "enh", "d2"} (None = all three). Returns the
    pytree the *_xp stack functions consume. Called per dispatched program
    -- outside scan bodies -- so the packing concats amortize over the
    chunk instead of re-running per frame.
    """
    pre = {}
    if parts is None or "d1" in parts:
        # 3->4 ch/pixel padding: keeps every packed tensor a multiple of
        # 8 lanes (see _pack_denoise docstring)
        pre["d1"] = _pack_denoise(params["denoise_1"], cin_pad=1, cout_pad=1)
    if parts is None or "d2" in parts:
        pre["d2"] = _pack_denoise(params["denoise_2"])
    if parts is None or "enh" in parts:
        enh = params["enhance"]
        scale, shift = folded_bn(enh, batch_stats["enhance"])
        pre["enh"] = {
            "in_k": blocks3x3(enh["in_conv"]["kernel"]),
            "in_b": pairc(enh["in_conv"]["bias"]),
            "shared_k": blocks3x3(enh["block"]["conv"]["kernel"]),
            "scale2": pairc(scale),
            "shift2": pairc(shift),
            "out_k": blocks3x3(enh["out_conv"]["kernel"]),
            "out_b": pairc(enh["out_conv"]["bias"]),
        }
    return pre


def _denoise_xp(pre: dict, xp: jax.Array) -> jax.Array:
    p = conv3x3p(xp, pre["k1"], pre["b1"], act="leaky")
    p = conv3x3p(p, pre["k2"], pre["b2"], act="leaky")
    return conv1x1p(p, pre["k3"], pre["b3"])


def denoise1_xp(pre: dict, xp: jax.Array) -> jax.Array:
    """Denoise_1 on packed 8-lane-padded input: (.., 2*4) -> (.., 2*4)
    residual (input channel 4 must be zeros; output channel 4 is junk --
    the caller slices it away after unpacking)."""
    return _denoise_xp(pre["d1"], xp)


def denoise2_xp(pre: dict, xp: jax.Array) -> jax.Array:
    """Denoise_2 on packed input: (.., 2*12) -> (.., 2*6) residual."""
    return _denoise_xp(pre["d2"], xp)


def enhancer_xp(pre: dict, xp: jax.Array) -> jax.Array:
    """Enhancer (eval BN) on packed input: (.., 2*9) -> (.., 2*3) s2.

    in_conv 9->64 relu; shared conv+BN+relu applied residually 3x (ONE
    weight set, model/model.py:60-67); out_conv 64->3 sigmoid, clip
    [1e-4, 1] (folded into the conv's activation).
    """
    e = pre["enh"]
    p = conv3x3p(xp, e["in_k"], e["in_b"], act="relu")
    for _ in range(3):
        p = conv3x3p(
            p, e["shared_k"], scale2=e["scale2"], shift2=e["shift2"],
            act="relu", residual=True,
        )
    return conv3x3p(p, e["out_k"], e["out_b"], act="sigmoid_clip")
