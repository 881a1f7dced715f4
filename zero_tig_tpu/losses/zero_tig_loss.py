"""The Zero-TIG self-supervised objective: one weighted sum of ~17 terms.

Parity: ``LossFunction`` (loss.py:23-78), ``SmoothLoss`` (loss.py:173-311),
``L_TV`` (loss.py:139-152). All weights, eps values, clamp ranges and the
reference's channel-coefficient quirks are preserved exactly:

  * the non-WB luminance uses 0.299*ch2 + 0.587*ch1 + 0.144*ch0 -- i.e. the
    BT.601 R coefficient lands on channel index 2 (loss.py:31);
  * ``weighted_diff2`` reuses H3_denoised1 (loss.py:71);
  * SmoothLoss's rgb2yCbCr flattens the NCHW buffer into (N*C*H*W/3, 3) rows
    BEFORE the 3x3 color matmul (loss.py:180-188), so the "color transform"
    actually mixes horizontally adjacent pixels -- a reference bug the
    trained checkpoints bake in, replicated verbatim.

TPU-first formulation: the reference computes the bilateral smoothness as 48
hand-written shifted-slice expressions (loss.py:198-308); each offset pair
(w1/w2, grad1/grad2, ...) is the same quantity mirrored, so we evaluate the
12 unique offsets once and double them -- identical value, half the memory
traffic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.filters import (
    calculate_local_variance,
    local_mean,
    local_mean_wminor,
    local_variance_wminor,
    pair_downsampler,
    pair_downsampler_wminor,
    texture_difference_wminor,
)
from ..models.network import TrainOutputs

EPS = 1e-9

# (dy, dx) displacement of the 12 unique SmoothLoss directions; each is
# counted twice in the reference's 24-term sum (loss.py:198-308).
_SMOOTH_OFFSETS = (
    (1, 0), (0, 1), (1, 1), (1, -1),
    (2, 0), (0, 2), (2, 1), (2, -1),
    (1, 2), (1, -2), (2, 2), (2, -2),
)

_YCBCR_MAT = jnp.array(
    [[0.257, -0.148, 0.439], [0.564, -0.291, -0.368], [0.098, 0.439, -0.071]],
    jnp.float32,
)
_YCBCR_BIAS = jnp.array([16.0 / 255.0, 128.0 / 255.0, 128.0 / 255.0], jnp.float32)


def _mse(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(a - b))


class Region:
    """Row-band ownership for spatially-split loss evaluation.

    The tensors handed to the loss are row slices
    [slice_start, slice_start + slice_h) of a full_h-row frame (band plus
    halo); this object turns every full-frame mean into a masked SUM over
    the OWNED absolute rows [own_start, own_end) divided by the FULL-frame
    element count, so that summing the per-band losses (and gradients)
    reproduces the monolithic value exactly. slice_start/own_* may be
    traced scalars (one compiled band function serves every band);
    full_h is static. Row bounds must be multiples of every map scale
    (use multiples of 2 for the pair-downsampled maps).
    """

    def __init__(self, slice_start, own_start, own_end, full_h: int):
        self.slice_start = slice_start
        self.own_start = own_start
        self.own_end = own_end
        self.full_h = full_h

    def row_mask(self, map_h: int, slice_h: int, absolute_cap=None):
        """(map_h,) f32 mask of owned rows for a map whose slice height is
        map_h (resolution scale inferred from slice_h). absolute_cap
        optionally excludes absolute full-res-scale rows >= cap (shifted/
        pair maps that drop trailing rows)."""
        scale = max(slice_h // map_h, 1) if map_h else 1
        rows = jax.lax.iota(jnp.int32, map_h) + self.slice_start // scale
        m = (rows >= self.own_start // scale) & (rows < self.own_end // scale)
        if absolute_cap is not None:
            m = m & (rows < absolute_cap)
        return m.astype(jnp.float32)


def _mse_region(a, b, region: "Region | None", slice_h: int):
    if region is None:
        return _mse(a, b)
    mask = region.row_mask(a.shape[1], slice_h)
    sq = jnp.square(a - b) * mask[None, :, None, None]
    scale = max(slice_h // a.shape[1], 1)
    denom = a.shape[0] * (region.full_h // scale) * a.shape[2] * a.shape[3]
    return jnp.sum(sq) / denom


def _rgb2ycbcr_scrambled(x_nhwc: jax.Array) -> jax.Array:
    """The reference's rgb2yCbCr (loss.py:178-189), bug included.

    torch flattens the contiguous NCHW buffer into rows of 3 consecutive
    scalars (triplets along W, channel-major), transforms those, and reshapes
    back to NCHW. Replicated here exactly; returns NHWC.
    """
    b, h, w, c = x_nhwc.shape
    flat = x_nhwc.transpose(0, 3, 1, 2).reshape(-1, 3)
    out = (
        jnp.matmul(flat, _YCBCR_MAT, precision=jax.lax.Precision.HIGHEST)
        + _YCBCR_BIAS
    )
    return out.reshape(b, c, h, w).transpose(0, 2, 3, 1)


def _shift_pair(x: jax.Array, dy: int, dx: int) -> tuple[jax.Array, jax.Array]:
    """Overlapping slices of x displaced by (dy, dx), NHWC."""
    h, w = x.shape[1], x.shape[2]
    y0a, y1a = max(dy, 0), h + min(dy, 0)
    x0a, x1a = max(dx, 0), w + min(dx, 0)
    y0b, y1b = max(-dy, 0), h + min(-dy, 0)
    x0b, x1b = max(-dx, 0), w + min(-dx, 0)
    return x[:, y0a:y1a, x0a:x1a, :], x[:, y0b:y1b, x0b:x1b, :]


def smooth_loss(
    input_rgb: jax.Array,
    output: jax.Array,
    region: Region | None = None,
    ycc: jax.Array | None = None,
) -> jax.Array:
    """Edge-aware bilateral smoothness of `output` w.r.t. yCbCr(input).

    Parity: SmoothLoss.forward (loss.py:192-311), sigma=10, p=1.
    With `region`, each offset's mean becomes a masked sum over the owned
    grad rows (grad row i pairs source rows (i+dy, i); ownership follows
    row i) divided by the full-frame count.

    ycc: precomputed scrambled-yCbCr of the FULL-frame input, sliced to this
    band. Required in region mode: the scrambled transform's triplet
    grouping runs over the flattened (C, H, W) buffer, so a slice-local
    recomputation has the wrong phase whenever W*(full_h - slice_h) % 3 != 0
    and mixes different pixels at the slice's plane boundaries. The weights
    are gradient-free (input is the detached L2), so the caller computes
    ycc once full-frame (pipeline.spatial._flow_phase) and slices it.
    """
    if region is not None and ycc is None:
        raise ValueError(
            "region mode requires the full-frame-phased ycc (slice-local "
            "recomputation scrambles with the wrong triplet phase)"
        )
    if ycc is None:
        ycc = _rgb2ycbcr_scrambled(input_rgb)
    slice_h = input_rgb.shape[1]
    sigma_color = -1.0 / (2.0 * 10.0 * 10.0)
    total = jnp.zeros((), jnp.float32)
    for dy, dx in _SMOOTH_OFFSETS:
        ia, ib = _shift_pair(ycc, dy, dx)
        wgt = jnp.exp(
            jnp.sum(jnp.square(ia - ib), axis=-1, keepdims=True) * sigma_color
        )
        oa, ob = _shift_pair(output, dy, dx)
        grad = wgt * jnp.sum(jnp.abs(oa - ob), axis=-1, keepdims=True)
        if region is None:
            term = jnp.mean(grad)
        else:
            # grad row i pairs source rows (i+dy, i); owned by row i, with
            # absolute rows >= full_h - dy nonexistent in the full map
            mask = region.row_mask(
                grad.shape[1], slice_h, absolute_cap=region.full_h - dy
            )
            denom = (
                grad.shape[0] * (region.full_h - dy)
                * grad.shape[2] * grad.shape[3]
            )
            term = jnp.sum(grad * mask[None, :, None, None]) / denom
        total = total + 2.0 * term  # each direction counted twice
    return total


def tv_loss(x: jax.Array, region: Region | None = None) -> jax.Array:
    """Total variation. Parity: L_TV (loss.py:139-152), NHWC input.

    With `region`, vertical pairs belong to their TOP row's owner and
    counts are full-frame."""
    b, h, w, _ = x.shape
    dh = jnp.square(x[:, 1:, :, :] - x[:, :-1, :, :])
    dw = jnp.square(x[:, :, 1:, :] - x[:, :, :-1, :])
    if region is None:
        count_h = (h - 1) * w
        count_w = h * (w - 1)
        return 2.0 * (jnp.sum(dh) / count_h + jnp.sum(dw) / count_w) / b
    full = region.full_h
    # vertical pair (i, i+1) belongs to its top row; the full map has no
    # pair for the last row
    mh = region.row_mask(dh.shape[1], h, absolute_cap=full - 1)
    mw = region.row_mask(h, h)
    h_tv = jnp.sum(dh * mh[None, :, None, None])
    w_tv = jnp.sum(dw * mw[None, :, None, None])
    return 2.0 * (h_tv / ((full - 1) * w) + w_tv / (full * (w - 1))) / b


def loss_factor(L2d: jax.Array, *, is_wb: bool = False) -> jax.Array:
    """The adaptive enhancement factor (loss.py:26-38): a full-frame mean
    of the DETACHED denoised input. Exposed separately so the spatial
    gradient-accumulation step can compute it once on the full frame."""
    if is_wb:
        # adaptive white balance: per-channel factor (loss.py:26-29)
        mean_c = jnp.mean(L2d, axis=(1, 2), keepdims=True)
        factor = 0.3 / (mean_c + EPS)
    else:
        luma = (
            L2d[..., 2] * 0.299 + L2d[..., 1] * 0.587 + L2d[..., 0] * 0.144
        )
        mean_y = jnp.mean(luma, axis=(1, 2))[:, None, None, None]
        factor = 0.5 / (mean_y + EPS)
    return jnp.clip(factor, 1.0, 25.0)


def zero_tig_loss(
    frame: jax.Array,
    o: TrainOutputs,
    *,
    is_wb: bool = False,
    region: Region | None = None,
    factor: jax.Array | None = None,
    ycc: jax.Array | None = None,
) -> jax.Array:
    """The full weighted objective. Parity: LossFunction.forward (loss.py:23-78).

    frame: the raw (B, H, W, 3) input in [0, 1]. NOTE: the criterion receives
    the RAW frame (+1e-9, loss.py:24-25), not the forward's +1e-4 copy --
    train._loss passes the pre-eps input (model/model.py:205-212), so the
    Res_1 targets are offset by 1e-4 from the forward's L11/L12. Preserved.

    region/factor/ycc: spatial-split mode (pipeline.train_step_spatial). All
    tensors are row slices; every mean becomes an owned-rows sum over the
    full-frame count, and the two full-frame gradient-free quantities -- the
    enhancement `factor` and the scrambled-yCbCr `ycc` of the detached L2
    (see smooth_loss) -- must be supplied as band slices. Summing the
    per-band losses reproduces the monolithic loss exactly.
    """
    sg = jax.lax.stop_gradient
    inp = frame + EPS  # loss.py:24-25 (1e-9 only)
    slice_h = frame.shape[1]

    L2d = sg(o.L2)
    if factor is None:
        factor = loss_factor(L2d, is_wb=is_wb)
    elif region is None:
        raise ValueError("factor override is for spatial-split mode")
    adjustment = jnp.power(0.7, -factor) / factor

    normalized_low = jnp.clip(L2d / o.s2, EPS, 0.8)
    enhanced_brightness = jnp.power(L2d * factor, factor)
    clamped_brightness = jnp.clip(enhanced_brightness * adjustment, EPS, 1.0)
    clamped_adjusted = jnp.clip(L2d * factor, EPS, 1.0)

    def mse(a, b):
        return _mse_region(a, b, region, slice_h)

    # W-minor analysis tail (fast mode; see the Color/Var branches below):
    # every pair_downsampler / windowed-stat term on a 3-channel map runs
    # in (B, C, H, W) layout -- NHWC pads 3 -> 128 lanes, ~2x measured on
    # the whole Res/Inter tail fwd+bwd at 1080p. mse is layout-invariant,
    # so only the operands transpose (differentiable, ~0.6 ms/frame).
    wtail = o.color_blur_diff is not None

    def t(x):  # NHWC -> W-minor
        return jnp.transpose(x, (0, 3, 1, 2))

    loss = jnp.zeros((), jnp.float32)
    # Enhance
    loss += mse(o.s2, clamped_brightness) * 700.0
    loss += mse(normalized_low, clamped_adjusted) * 1000.0
    loss += smooth_loss(L2d, o.s2, region, ycc=ycc) * 5.0
    loss += tv_loss(o.s2, region) * 1600.0
    # Res_1 (N2N stage 1)
    if wtail:
        L11, L12 = pair_downsampler_wminor(t(inp))
        denoised1, denoised2 = pair_downsampler_wminor(t(o.L2))
        loss += mse(L11, t(o.L_pred2)) * 1000.0
        loss += mse(L12, t(o.L_pred1)) * 1000.0
        loss += mse(t(o.L_pred1), denoised1) * 1000.0
        loss += mse(t(o.L_pred2), denoised2) * 1000.0
    else:
        L11, L12 = pair_downsampler(inp)
        loss += mse(L11, o.L_pred2) * 1000.0
        loss += mse(L12, o.L_pred1) * 1000.0
        denoised1, denoised2 = pair_downsampler(o.L2)
        loss += mse(o.L_pred1, denoised1) * 1000.0
        loss += mse(o.L_pred2, denoised2) * 1000.0
    # Res_2 (N2N stage 2)
    loss += mse(o.H3_pred, sg(jnp.concatenate([o.H12, o.s22], -1))) * 1000.0
    loss += mse(o.H4_pred, sg(jnp.concatenate([o.H11, o.s21], -1))) * 1000.0
    if wtail:
        H3_denoised1, H3_denoised2 = pair_downsampler_wminor(t(o.H3))
        loss += mse(t(o.H3_pred[..., 0:3]), H3_denoised1) * 1000.0
        loss += mse(t(o.H4_pred[..., 0:3]), H3_denoised2) * 1000.0
    else:
        H3_denoised1, H3_denoised2 = pair_downsampler(o.H3)
        loss += mse(o.H3_pred[..., 0:3], H3_denoised1) * 1000.0
        loss += mse(o.H4_pred[..., 0:3], H3_denoised2) * 1000.0
    # Color (loss.py:64). Fast loss tail (core.precision.set_loss_tail):
    # blur is linear and blur(H1) is detached, so MSE(blur(H1).detach(),
    # blur(H3)) == mean(blur(sg(H1) - H3)^2) with the identical gradient;
    # the forward supplies that single W-minor blur as color_blur_diff.
    if o.color_blur_diff is not None:
        if region is not None:
            raise ValueError(
                "the wminor loss tail has no region masking; pass "
                "loss_tail='nhwc' to forward_train_core in banded mode"
            )
        loss += jnp.mean(jnp.square(o.color_blur_diff)) * 10000.0
    else:
        loss += mse(sg(o.H2_blur), o.H3_blur) * 10000.0
    # Ill
    loss += mse(sg(o.s2), o.s3) * 1000.0
    # Inter (texture-gated local mean); weighted_diff2 reuses H3_denoised1
    # exactly as written in loss.py:71
    if wtail:
        # recompute the mask W-minor (the forward's NHWC
        # H3_denoised1_H3_denoised2_diff output is then dead under
        # value_and_grad and XLA removes it); H3_denoised* are W-minor here
        d = texture_difference_wminor(H3_denoised1, H3_denoised2)
        lm1 = local_mean_wminor(H3_denoised1)
        lm2 = local_mean_wminor(H3_denoised2)
    else:
        d = o.H3_denoised1_H3_denoised2_diff
        lm1 = local_mean(H3_denoised1)
        lm2 = local_mean(H3_denoised2)
    weighted_diff1 = (1.0 - d) * lm1 + H3_denoised1 * d
    weighted_diff2 = (1.0 - d) * lm2 + H3_denoised1 * d
    loss += mse(H3_denoised1, weighted_diff1) * 10000.0
    loss += mse(H3_denoised2, weighted_diff2) * 10000.0
    # Var (loss.py:75-77)
    if o.color_blur_diff is not None:
        # W-minor tail: both variance maps from ONE (B, 6, H, W) stacked
        # pass; only their mean squared difference is consumed, which is
        # layout-invariant, so nothing transposes back
        st = jnp.transpose(
            jnp.concatenate([o.H2, o.H3 - o.H2], axis=-1), (0, 3, 1, 2)
        )
        v = local_variance_wminor(st)
        loss += jnp.mean(jnp.square(v[:, :3] - v[:, 3:])) * 1000.0
    else:
        noise_var = calculate_local_variance(o.H3 - o.H2)
        h2_var = calculate_local_variance(o.H2)
        loss += mse(h2_var, noise_var) * 1000.0
    return loss
