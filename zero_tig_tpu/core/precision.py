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
_REMAT: bool | None = None
_PACK_CONV = False
_XPACK = frozenset({"d1", "enh", "d2"})


def set_precision(mode: str) -> None:
    global _MODE
    if mode not in ("highest", "fast"):
        raise ValueError(f"unknown precision mode {mode!r}")
    _MODE = mode


def set_remat(enabled: bool | None) -> None:
    """Rematerialization of the conv stacks in the train step. Required for
    f32-faithful 1080p training (activations exceed HBM); fast mode's bf16
    activations fit without it, and skipping the backward recompute is
    measured 30 ms/frame faster at 1080p (562 -> 532 ms, one v5e, round 4).
    Default (None) follows the mode at trace time: remat in 'highest', no
    remat in 'fast'. Pass True/False to override either way."""
    global _REMAT
    _REMAT = None if enabled is None else bool(enabled)


def get_remat() -> bool:
    if _REMAT is None:
        return _MODE != "fast"
    return _REMAT


def get_mode() -> str:
    return _MODE


def set_pack_conv(enabled: bool) -> None:
    """RETIRED EXPERIMENT (kept for study): packed-pair Pallas conv stacks
    on the fast inference path (ops/pack_conv.py). The kernels are fast
    (1.38 ms per 64ch 3x3 layer at 1080p vs 8.3 unpacked XLA) but the
    line is retired by round-4 measurement: (a) the shipped xpack LAYOUT
    (plain XLA convs on the packed layout, set_xpack) already runs 1.73
    ms/layer, capping the kernels' best-possible end-to-end margin at
    ~1-3 ms/frame even with ZERO boundary glue; (b) measured glue is +66
    ms/frame (multi-input kernels included); and (c) the cheapest possible
    custom-call boundary -- the single RAFT update kernel with
    input_output_aliases on its dead input -- still LOSES 0.5 ms/frame to
    the pure-XLA graph (round 4, one v5e). The scan-boundary buffer/layout
    tax on Pallas results exceeds any packed-kernel margin at this
    operating point. Default OFF; read at trace time; only consulted when
    the mode is 'fast'."""
    global _PACK_CONV
    _PACK_CONV = bool(enabled)


def get_pack_conv() -> bool:
    return _PACK_CONV


_RAFT_FUSED = False


def set_raft_fused(enabled: bool) -> None:
    """EXPERIMENTAL: raw-param update-block apply with the GRU z/r gate
    convs fused into one conv per direction (models/raft/update.py
    update_block_apply_fast) in the fast-mode refinement scan. Bit-exact
    vs the module path (tested); OFF by default until the end-to-end TPU
    number lands -- the round-3 lesson is that mathematically identical
    reformulations routinely shift XLA's global layout assignment. Read
    at trace time."""
    global _RAFT_FUSED
    _RAFT_FUSED = bool(enabled)


def get_raft_fused() -> bool:
    return _RAFT_FUSED


_RAFT_KERNEL = False


def set_raft_kernel(enabled: bool) -> None:
    """EXPERIMENTAL: fuse the RAFT update-block core (motion encoder cor
    path + z/r-fused GRU + flow head) into ONE Pallas kernel per
    refinement iteration (models/raft/update_kernel.py). The 45x80 loop
    is per-HLO-op-overhead-bound (~25 tiny ops/iteration); the kernel
    runs them as in-VMEM shifted dot_generals. Measured round 4 (one
    v5e): 13% faster standalone per iteration (0.702 vs 0.808 ms) but
    +0.5 ms/frame END-TO-END at 1080p even with net-buffer aliasing --
    the custom-call boundary tax inside the scan exceeds the win, so it
    stays opt-in. Read at trace time; only consulted when the mode is
    'fast' and B == 1."""
    global _RAFT_KERNEL
    _RAFT_KERNEL = bool(enabled)


def get_raft_kernel() -> bool:
    return _RAFT_KERNEL


def set_xpack(parts) -> None:
    """Packed-pair conv LAYOUT on the fast inference path (ops/xpack.py):
    selected conv stacks and their glue run on (B, H, W/2, 2C) operands as
    plain XLA convs, halving lane-padded HBM traffic (measured 1.73 vs
    2.38 ms per 64ch 3x3 layer at 1080p, one v5e). Pure-XLA -- composes
    with fusion, works on any backend.

    parts: which stacks to pack --
      * True  -> {"d1", "enh", "d2"} (the measured-best default: 65.7 ->
        50.9 ms/frame, 15.2 -> 19.7 fps, 1080p chunk-32 on one v5e)
      * False -> disabled
      * an iterable over {"d1", "enh", "d2"} for explicit control.

    Lane-alignment constraint (learned the hard way): every packed
    tensor's channel count must be a multiple of 8 lanes. Denoise_1's
    natural packed IO is 6 lanes, and at 1080p that tipped XLA's global
    layout assignment into materializing the warp's 532 MB patchify
    gather table through a channel-major 128-step zero-fill loop +
    relayout copy (~31 ms/frame: {enh,d1} measured 85.0 vs {enh} 58.0,
    with the loop present in the HLO exactly when d1 was packed).
    xla_fastpath zero-pads d1's packed IO to 8 lanes -- exactly equal
    math -- which removes the trigger: all-packed drops to 50.9 ms/frame
    (sweep: off 65.7, {enh} 58.0, {enh,d2} 54.1, all+pad 50.9;
    NOTES_ROUND3.md). Read at trace time; only consulted when the mode
    is 'fast'."""
    global _XPACK
    if parts is True:
        _XPACK = frozenset({"d1", "enh", "d2"})
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


_XPACK_TRAIN: bool | None = None


def set_xpack_train(enabled: bool | None) -> None:
    """Packed-pair conv LAYOUT on the fast TRAINING forward
    (models/network._forward_train_xpack): all three conv stacks and their
    glue run in bf16 with the stacks on (B, H, W/2, 2C) packed operands
    inside the value_and_grad graph (weights packed differentiably per
    step; train-mode BatchNorm statistics computed on the packed layout --
    see xla_fastpath.enhancer_xp_train).  Measured one v5e, 1080p/of3/12it
    fast train_step (round 4): 526.4 -> 369.8 ms/frame bn_train=True,
    524.0 -> 371.7 bn_train=False (folded eval-BN form), loss parity
    ~0.16%.  Default (None) = ON whenever the mode is 'fast' and set_xpack
    is non-empty; the dispatch additionally requires W % 4 == 0 (the
    half-res stacks re-pack at W/2) and H % 2 == 0 (pair_downsampler).
    A frame failing either gate SILENTLY falls back to the unpacked
    train forward -- same math, round-4 pre-xpack speed.  Read at trace
    time."""
    global _XPACK_TRAIN
    _XPACK_TRAIN = None if enabled is None else bool(enabled)


def get_xpack_train() -> bool:
    if _XPACK_TRAIN is None:
        return bool(_XPACK)
    return _XPACK_TRAIN


_WARP_PACKED: bool | None = None


def set_warp_packed(enabled: bool | None) -> None:
    """Emit the fast inference warp in packed-pair layout (B, H, W/2, 2C)
    straight from the block gather (ops/sampling.
    grid_sample_pixel_block_packed): the block operand repeats along H
    only (half the broadcast traffic) and the warped tensor feeds the
    packed enhancer/denoise_2 stacks through cat_packed lane shuffles with
    no NHWC round trip (VERDICT r4 item 7). Requires xpack {enh, d2} and
    even H/W; silently inactive otherwise. Default (None) = OFF: measured
    e2e REGRESSION on one v5e -- 56.19 vs 49.36/49.34 ms/frame (1080p
    chunk-32, control runs sandwiching the variant in the same session).
    Post-mortem: the pair-shaped hat-weight contraction
    (b,h,wb,2,16)x(b,h,wb,16,c) lowers to batched tiny dots (the same
    lowering that cost the round-3 blockwise einsum ~10 ms), while the
    NHWC twin's (b,h,w,16) elementwise-multiply-reduce fuses, and XLA
    already folds the NHWC->pack2 seam into the consumer for free -- the
    halved block-operand broadcast never reaches the critical path. Kept
    opt-in (output-equivalence tested, tests/test_xpack.py) for
    re-testing on future compilers. Read at trace time."""
    global _WARP_PACKED
    _WARP_PACKED = None if enabled is None else bool(enabled)


def get_warp_packed() -> bool:
    if _WARP_PACKED is None:
        return False
    return _WARP_PACKED


_LOSS_TAIL: str | None = None


def set_loss_tail(layout: str | None) -> None:
    """Layout of the f32 3-channel TRAINING loss-tail filters (the Color
    blur and the Var local variances -- ops/filters.py), the largest
    remaining structural target in the packed train step (round-4 trace:
    ~63 ms/frame booked on filters.py lines, ~30x their HBM roofline from
    3-of-128 lane padding).

      * "wminor": (B, C, H, W) shifted-add formulations
        (ops.filters.blur_wminor / local_variance_wminor; measured 3.2x
        faster standalone for the blur) PLUS the single-blur Color
        rewrite: MSE(blur(H1).detach(), blur(H3)) == mean(blur(sg(H1) -
        H3)^2) exactly (blur is linear; the detach placement gives the
        identical gradient), eliminating one full-res 21x21 blur
        outright. The loss consumes only means of these maps, so nothing
        transposes back. The Res/Inter analysis tail (pair_downsampler,
        texture mask, local means) also runs W-minor: 2.1x faster
        isolated (31.6 -> 15.2 ms fwd+bwd at 1080p) but e2e NEUTRAL
        (309.8 vs 310.4 ms/frame) -- the scheduler already hides that
        tail behind the conv backward chain; kept because it is exact,
        strictly less booked work, and wins at operating points with
        less MXU work to hide behind.
      * "nhwc": the legacy two-blur NHWC tail.
      * None (default): "wminor" in fast mode, "nhwc" in highest.

    Gradient equivalence vs the NHWC tail is tested
    (tests/test_loss_tail.py). Only consulted by the monolithic training
    forward in fast mode; the spatial banded path always uses the NHWC
    region-masked tail. Read at trace time."""
    global _LOSS_TAIL
    if layout not in (None, "wminor", "nhwc"):
        raise ValueError(f"unknown loss tail layout {layout!r}")
    _LOSS_TAIL = layout


def get_loss_tail() -> str:
    if _LOSS_TAIL is None:
        return "wminor" if _MODE == "fast" else "nhwc"
    return _LOSS_TAIL


def conv_precision() -> lax.Precision:
    return lax.Precision.HIGHEST if _MODE == "highest" else lax.Precision.DEFAULT
