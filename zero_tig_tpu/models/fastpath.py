"""Fast-mode fused conv stacks: Denoise_1/2 and the Enhancer as packed-pair
Pallas pipelines (ops/pack_conv.py).

Numerically these compute the same bf16-multiply / f32-accumulate math as
the fast-mode XLA convs (models/layers.Conv), reorganized so the 48/64
channel activations travel HBM without 128-lane padding waste: measured
1.38 ms vs 8.3 ms per 64ch 3x3 layer at 1080p. Eval-BatchNorm folds into
the conv scale/shift; activations, residual adds and the pad-ring zeroing
fuse into the kernels, so each stack is pack -> K kernels -> unpack.

Inference only (the kernels define no VJP); used by forward_inference when
``precision.get_mode() == 'fast'`` and ``precision.get_pack_conv()`` and
the frame dims are even. On CPU (tests) the kernels run in interpret mode.

Parity: Denoise_1 (model/model.py:15-28), Denoise_2 (:31-44),
Enhancer (:47-81) -- including the shared conv+BN block applied 3x.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.pack_conv import (
    build_weight_blocks,
    build_weight_blocks_multi,
    conv3x3_packed,
    conv3x3_packed_multi,
    matmul1x1_packed,
    pack,
    pair_params,
    residual1x1_packed,
    residual1x1_packed_multi,
    unpack,
)

_BN_EPS = 1e-5


def _interp() -> bool:
    return jax.default_backend() == "cpu"


def _ones(c: int) -> jax.Array:
    return pair_params(jnp.ones((c,), jnp.float32))


# ---------------------------------------------------------------- packed API
# All-packed stack functions: operands and results stay in the packed-pair
# layout so chained stacks never materialize small-C NHWC intermediates
# (measured ~25 ms/frame of pad/slice/reshape relayouts at 1080p when each
# stack round-trips through NHWC). Ring invariant: every result has a
# ZEROED pad ring, so it chains as the next conv's zero padding.


def _two_convs(params: dict, p: jax.Array, h: int, w: int) -> jax.Array:
    it = _interp()
    p = conv3x3_packed(
        p, build_weight_blocks(params["conv1"]["kernel"]),
        _ones(48), pair_params(params["conv1"]["bias"]),
        h=h, w=w, act="leaky", interpret=it,
    )
    return conv3x3_packed(
        p, build_weight_blocks(params["conv2"]["kernel"]),
        _ones(48), pair_params(params["conv2"]["bias"]),
        h=h, w=w, act="leaky", interpret=it,
    )


def denoise1_L2_packed(params: dict, inp_p: jax.Array, h: int, w: int) -> jax.Array:
    """clip(inp - Denoise_1(inp), eps, 1) fully packed: (N, 6) -> (N, 6).

    Parity: model/model.py:315-316 (L2 = clamp(input - denoise_1(input)))."""
    p = _two_convs(params, inp_p, h, w)
    return residual1x1_packed(
        p, inp_p, params["conv3"]["kernel"][0, 0], params["conv3"]["bias"],
        h=h, w_img=w, interpret=_interp(),
    )


def denoise2_H5_packed(
    params: dict, d2_in_p: jax.Array, anchor_p: jax.Array, h: int, w: int
) -> jax.Array:
    """clip(anchor - Denoise_2(d2_in), eps, 1) fully packed: (N, 24) -> (N, 12).

    Parity: model/model.py:334-335."""
    p = _two_convs(params, d2_in_p, h, w)
    return residual1x1_packed(
        p, anchor_p, params["conv3"]["kernel"][0, 0], params["conv3"]["bias"],
        h=h, w_img=w, interpret=_interp(),
    )


def denoise2_H5_packed_multi(
    params: dict,
    parts: list[jax.Array],
    anchor_parts: list[jax.Array],
    h: int,
    w: int,
) -> jax.Array:
    """denoise2_H5_packed with the 12-channel input concat AND the (H2, s2)
    anchor concat assembled in VMEM (multi-input kernels) instead of HBM.

    parts: [w2_p (N,12), H2_p (N,6), s2_p (N,6)] in reference channel order
    (model/model.py:334); anchor_parts: [H2_p, s2_p]."""
    it = _interp()
    splits = tuple(x.shape[-1] // 2 for x in parts)
    p = conv3x3_packed_multi(
        parts,
        build_weight_blocks_multi(params["conv1"]["kernel"], splits),
        _ones(48), pair_params(params["conv1"]["bias"]),
        h=h, w=w, act="leaky", interpret=it,
    )
    p = conv3x3_packed(
        p, build_weight_blocks(params["conv2"]["kernel"]),
        _ones(48), pair_params(params["conv2"]["bias"]),
        h=h, w=w, act="leaky", interpret=it,
    )
    return residual1x1_packed_multi(
        p, anchor_parts,
        params["conv3"]["kernel"][0, 0], params["conv3"]["bias"],
        h=h, w_img=w, interpret=it,
    )


def enhancer_packed_multi(
    params: dict,
    batch_stats: dict,
    parts: list[jax.Array],
    h: int,
    w: int,
) -> jax.Array:
    """enhancer_packed with the 9-channel input concat assembled in VMEM.

    parts: [w_p (N,12), L2_p (N,6)] in reference channel order
    (model/model.py:326)."""
    splits = tuple(x.shape[-1] // 2 for x in parts)
    p = conv3x3_packed_multi(
        parts,
        build_weight_blocks_multi(params["in_conv"]["kernel"], splits),
        _ones(64), pair_params(params["in_conv"]["bias"]),
        h=h, w=w, act="relu", interpret=_interp(),
    )
    return _enhancer_tail(params, batch_stats, p, h, w)


def _enhancer_tail(
    params: dict, batch_stats: dict, p: jax.Array, h: int, w: int
) -> jax.Array:
    it = _interp()
    bn = params["block"]["bn"]
    stats = batch_stats["block"]["bn"]
    inv = jax.lax.rsqrt(stats["var"].astype(jnp.float32) + _BN_EPS)
    bn_scale = bn["scale"].astype(jnp.float32) * inv
    bn_shift = (
        bn["bias"].astype(jnp.float32)
        + (params["block"]["conv"]["bias"].astype(jnp.float32)
           - stats["mean"].astype(jnp.float32)) * bn_scale
    )
    shared_wb = build_weight_blocks(params["block"]["conv"]["kernel"])
    shared_sc = pair_params(bn_scale)
    shared_sh = pair_params(bn_shift)
    for _ in range(3):
        p = conv3x3_packed(
            p, shared_wb, shared_sc, shared_sh,
            h=h, w=w, act="relu", residual=True, interpret=it,
        )
    return conv3x3_packed(
        p, build_weight_blocks(params["out_conv"]["kernel"]),
        _ones(3), pair_params(params["out_conv"]["bias"]),
        h=h, w=w, act="sigmoid_clip", interpret=it,
    )


def enhancer_packed(
    params: dict, batch_stats: dict, enh_in_p: jax.Array, h: int, w: int
) -> jax.Array:
    """Enhancer (eval BN) fully packed: (N, 18) -> (N, 6) illumination s2."""
    it = _interp()
    bn = params["block"]["bn"]
    stats = batch_stats["block"]["bn"]
    inv = jax.lax.rsqrt(stats["var"].astype(jnp.float32) + _BN_EPS)
    bn_scale = bn["scale"].astype(jnp.float32) * inv
    bn_shift = (
        bn["bias"].astype(jnp.float32)
        + (params["block"]["conv"]["bias"].astype(jnp.float32)
           - stats["mean"].astype(jnp.float32)) * bn_scale
    )
    shared_wb = build_weight_blocks(params["block"]["conv"]["kernel"])
    shared_sc = pair_params(bn_scale)
    shared_sh = pair_params(bn_shift)

    p = conv3x3_packed(
        enh_in_p, build_weight_blocks(params["in_conv"]["kernel"]),
        _ones(64), pair_params(params["in_conv"]["bias"]),
        h=h, w=w, act="relu", interpret=it,
    )
    for _ in range(3):
        p = conv3x3_packed(
            p, shared_wb, shared_sc, shared_sh,
            h=h, w=w, act="relu", residual=True, interpret=it,
        )
    return conv3x3_packed(
        p, build_weight_blocks(params["out_conv"]["kernel"]),
        _ones(3), pair_params(params["out_conv"]["bias"]),
        h=h, w=w, act="sigmoid_clip", interpret=it,
    )


def denoise1_fast(params: dict, x: jax.Array) -> jax.Array:
    """Denoise_1: 3 ->48 ->48 ->3(1x1), LeakyReLU(0.2). x: (1,H,W,3)."""
    h, w = x.shape[1], x.shape[2]
    it = _interp()
    p = pack(x)
    p = conv3x3_packed(
        p, build_weight_blocks(params["conv1"]["kernel"]),
        _ones(48), pair_params(params["conv1"]["bias"]),
        h=h, w=w, act="leaky", interpret=it,
    )
    p = conv3x3_packed(
        p, build_weight_blocks(params["conv2"]["kernel"]),
        _ones(48), pair_params(params["conv2"]["bias"]),
        h=h, w=w, act="leaky", interpret=it,
    )
    p = matmul1x1_packed(
        p, params["conv3"]["kernel"][0, 0], params["conv3"]["bias"]
    )
    return unpack(p, h, w).astype(x.dtype)


def denoise2_fast(params: dict, x: jax.Array) -> jax.Array:
    """Denoise_2: 12 ->48 ->48 ->6(1x1), LeakyReLU(0.2). x: (1,H,W,12)."""
    h, w = x.shape[1], x.shape[2]
    it = _interp()
    p = pack(x)
    p = conv3x3_packed(
        p, build_weight_blocks(params["conv1"]["kernel"]),
        _ones(48), pair_params(params["conv1"]["bias"]),
        h=h, w=w, act="leaky", interpret=it,
    )
    p = conv3x3_packed(
        p, build_weight_blocks(params["conv2"]["kernel"]),
        _ones(48), pair_params(params["conv2"]["bias"]),
        h=h, w=w, act="leaky", interpret=it,
    )
    p = matmul1x1_packed(
        p, params["conv3"]["kernel"][0, 0], params["conv3"]["bias"]
    )
    return unpack(p, h, w).astype(x.dtype)


def enhancer_fast(params: dict, batch_stats: dict, x: jax.Array) -> jax.Array:
    """Enhancer (eval BN): in_conv 9->64 relu; shared conv+BN+relu residual
    x3 (one weight set, model/model.py:60-67); out_conv 64->3 sigmoid,
    clip [1e-4, 1]. x: (1,H,W,9)."""
    h, w = x.shape[1], x.shape[2]
    it = _interp()

    bn = params["block"]["bn"]
    stats = batch_stats["block"]["bn"]
    inv = jax.lax.rsqrt(stats["var"].astype(jnp.float32) + _BN_EPS)
    bn_scale = bn["scale"].astype(jnp.float32) * inv
    bn_shift = (
        bn["bias"].astype(jnp.float32)
        + (params["block"]["conv"]["bias"].astype(jnp.float32)
           - stats["mean"].astype(jnp.float32)) * bn_scale
    )
    shared_wb = build_weight_blocks(params["block"]["conv"]["kernel"])
    shared_sc = pair_params(bn_scale)
    shared_sh = pair_params(bn_shift)

    p = pack(x)
    p = conv3x3_packed(
        p, build_weight_blocks(params["in_conv"]["kernel"]),
        _ones(64), pair_params(params["in_conv"]["bias"]),
        h=h, w=w, act="relu", interpret=it,
    )
    for _ in range(3):
        p = conv3x3_packed(
            p, shared_wb, shared_sc, shared_sh,
            h=h, w=w, act="relu", residual=True, interpret=it,
        )
    p = conv3x3_packed(
        p, build_weight_blocks(params["out_conv"]["kernel"]),
        _ones(3), pair_params(params["out_conv"]["bias"]),
        h=h, w=w, act="sigmoid_clip", interpret=it,
    )
    return unpack(p, h, w).astype(x.dtype)
