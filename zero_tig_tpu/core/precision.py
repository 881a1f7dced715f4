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


def conv_precision() -> lax.Precision:
    return lax.Precision.HIGHEST if _MODE == "highest" else lax.Precision.DEFAULT
