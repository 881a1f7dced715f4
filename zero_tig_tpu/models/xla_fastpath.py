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


def precompute_train(params: dict) -> dict:
    """Differentiable packed-weight pytree for the TRAIN fast path.

    Unlike ``precompute`` this never folds BatchNorm (train-mode BN needs
    live batch statistics) and is called INSIDE the loss function, so
    gradients flow back through the packing concats to the original
    parameters (the zero quadrants are constants and absorb nothing).
    """
    return {
        "d1": _pack_denoise(params["denoise_1"], cin_pad=1, cout_pad=1),
        "d2": _pack_denoise(params["denoise_2"]),
    }


def enhancer_xp_train(
    enh_params: dict, enh_stats: dict, xp: jax.Array, *, bn_train: bool
) -> tuple[jax.Array, dict]:
    """Enhancer on the packed-pair layout with the TRAINING BatchNorm
    schedule. Returns (packed s2, new enhancer batch_stats subtree).

    Parity: Enhancer (model/model.py:47-81) with the shared conv+BN+ReLU
    block applied 3x (one weight set; running stats updated 3x per forward
    when bn_train). Packed-pair batch statistics: lanes [c] and [C+c] hold
    the SAME original channel for the even/odd pixel of a pair, and both
    lane groups cover equally many pixels, so the per-channel batch mean is
    the average of the two lane-group means; variance uses the fast-mode
    one-pass E[x^2] - mean^2 form (cf. layers.instance_norm). Stats and
    normalization arithmetic are f32 like TorchBatchNorm; momentum 0.1 and
    the unbiased-variance running update match layers.TorchBatchNorm.
    """
    C = enh_params["block"]["bn"]["scale"].shape[0]
    in_k = blocks3x3(enh_params["in_conv"]["kernel"])
    in_b = pairc(enh_params["in_conv"]["bias"])
    sh_k = blocks3x3(enh_params["block"]["conv"]["kernel"])
    out_k = blocks3x3(enh_params["out_conv"]["kernel"])
    out_b = pairc(enh_params["out_conv"]["bias"])
    r_mean = enh_stats["block"]["bn"]["mean"]
    r_var = enh_stats["block"]["bn"]["var"]

    p = conv3x3p(xp, in_k, in_b, act="relu")
    if not bn_train:
        # epochs >= 1 (the reference's frozen-BN schedule): running stats
        # are step constants, so fold conv bias + BN into a per-channel
        # scale/shift exactly like the inference path (the fold is
        # differentiable wrt bn scale/bias and the conv bias). Measured
        # one v5e, 1080p train step: normalize-the-f32-upcast variant
        # 453.7 ms/frame, this folded form 371.7 (plain unpacked 524.0).
        scale, shift = folded_bn(enh_params, enh_stats)
        scale2, shift2 = pairc(scale), pairc(shift)
        for _ in range(3):
            p = conv3x3p(
                p, sh_k, scale2=scale2, shift2=shift2,
                act="relu", residual=True,
            )
        out = conv3x3p(p, out_k, out_b, act="sigmoid_clip")
        return out, {"block": {"bn": {"mean": r_mean, "var": r_var}}}

    sh_b = pairc(enh_params["block"]["conv"]["bias"])
    scale = enh_params["block"]["bn"]["scale"].astype(jnp.float32)
    bias = enh_params["block"]["bn"]["bias"].astype(jnp.float32)
    b, h, wp, _ = xp.shape
    n = b * h * (2 * wp)
    for _ in range(3):
        y = conv3x3p(p, sh_k, sh_b)
        yf = y.astype(jnp.float32)
        m2 = jnp.mean(yf, axis=(0, 1, 2))
        e2 = jnp.mean(yf * yf, axis=(0, 1, 2))
        mean_c = 0.5 * (m2[:C] + m2[C:])
        ex2_c = 0.5 * (e2[:C] + e2[C:])
        var_c = jnp.maximum(ex2_c - mean_c * mean_c, 0.0)
        unbiased = var_c * (n / max(n - 1, 1))
        r_mean = 0.9 * r_mean + 0.1 * mean_c
        r_var = 0.9 * r_var + 0.1 * unbiased
        inv = jax.lax.rsqrt(var_c + _BN_EPS) * scale
        yn = (yf - pairc(mean_c)) * pairc(inv) + pairc(bias)
        p = p + jnp.maximum(yn, 0.0).astype(p.dtype)
    out = conv3x3p(p, out_k, out_b, act="sigmoid_clip")
    return out, {"block": {"bn": {"mean": r_mean, "var": r_var}}}


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
