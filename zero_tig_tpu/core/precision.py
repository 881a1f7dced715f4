"""Global matmul/conv precision policy.

TPU MXU natively multiplies in bfloat16; float32 inputs at
``Precision.HIGHEST`` run multi-pass (~6x slower) but match the reference's
f32 CUDA numerics. Two modes:

  * "highest" (default): f32-faithful, for parity-critical runs/tests.
  * "fast": single-pass bf16 multiplies with f32 accumulation -- the
    TPU-native operating point. Quality impact is measured (not assumed):
    tools/precision_delta.py reports the output PSNR between modes.

The mode is read at TRACE time: call ``set_precision`` before the first
jitted call (or clear caches) when switching.
"""

from __future__ import annotations

from jax import lax

_MODE = "highest"
_REMAT = True
_PACK_CONV = False
_XPACK = frozenset({"enh", "d2"})


def set_precision(mode: str) -> None:
    global _MODE
    if mode not in ("highest", "fast"):
        raise ValueError(f"unknown precision mode {mode!r}")
    _MODE = mode


def set_remat(enabled: bool) -> None:
    """Rematerialization of the conv stacks in the train step. Required for
    f32-faithful 1080p training (activations exceed HBM); with bf16
    activations smaller operating points can disable it to trade memory
    for backward-pass speed. Read at trace time."""
    global _REMAT
    _REMAT = bool(enabled)


def get_remat() -> bool:
    return _REMAT


def get_mode() -> str:
    return _MODE


def set_pack_conv(enabled: bool) -> None:
    """EXPERIMENTAL: packed-pair Pallas conv stacks on the fast inference
    path (ops/pack_conv.py). The kernels themselves are ~6x XLA's conv
    layer rate at 1080p (1.38 vs 8.3 ms/layer, measured), but end-to-end
    the path currently LOSES (93-130 vs 72 ms/frame): every kernel
    boundary materializes a lane-padded (N, 2C<=24) operand that XLA's
    fused conv graph never writes to HBM. Default OFF until the glue is
    fused into the kernels (multi-input conv kernels). Read at trace time;
    only consulted when the mode is 'fast'."""
    global _PACK_CONV
    _PACK_CONV = bool(enabled)


def get_pack_conv() -> bool:
    return _PACK_CONV


def set_xpack(parts) -> None:
    """Packed-pair conv LAYOUT on the fast inference path (ops/xpack.py):
    selected conv stacks and their glue run on (B, H, W/2, 2C) operands as
    plain XLA convs, halving lane-padded HBM traffic (measured 1.73 vs
    2.38 ms per 64ch 3x3 layer at 1080p, one v5e). Pure-XLA -- composes
    with fusion, works on any backend.

    parts: which stacks to pack --
      * True  -> {"enh", "d2"} (the measured-best default: 65.7 -> 54.1
        ms/frame, 15.2 -> 18.5 fps, 1080p chunk-32 on one v5e)
      * False -> disabled
      * an iterable over {"d1", "enh", "d2"} for explicit control.

    Packing DENOISE_1 is a measured LOSS despite its per-conv win: d1
    feeds the warp branch, and its small packed channel counts (6-lane
    output) there tip XLA's global layout assignment into materializing
    the warp's 532 MB patchify gather table through a 128-step zero-fill
    loop + relayout copy (~31 ms/frame). Measured 1080p chunk-32 sweep:
    off 65.7, {enh} 58.0, {enh,d2} 54.1, {enh,d1} 85.0, all 81.0 -- and
    the zero-fill loop is present in the HLO exactly when d1 is packed
    (NOTES_ROUND3.md). Read at trace time; only consulted when the mode
    is 'fast'."""
    global _XPACK
    if parts is True:
        _XPACK = frozenset({"enh", "d2"})
    elif not parts:
        _XPACK = frozenset()
    else:
        parts = frozenset(parts)
        unknown = parts - {"d1", "enh", "d2"}
        if unknown:
            raise ValueError(f"unknown xpack parts {sorted(unknown)}")
        _XPACK = parts


def get_xpack() -> frozenset:
    return _XPACK


def conv_precision() -> lax.Precision:
    return lax.Precision.HIGHEST if _MODE == "highest" else lax.Precision.DEFAULT
