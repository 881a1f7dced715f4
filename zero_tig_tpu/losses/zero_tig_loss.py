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

from ..ops.filters import calculate_local_variance, local_mean, pair_downsampler
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


def smooth_loss(input_rgb: jax.Array, output: jax.Array) -> jax.Array:
    """Edge-aware bilateral smoothness of `output` w.r.t. yCbCr(input).

    Parity: SmoothLoss.forward (loss.py:192-311), sigma=10, p=1.
    """
    ycc = _rgb2ycbcr_scrambled(input_rgb)
    sigma_color = -1.0 / (2.0 * 10.0 * 10.0)
    total = jnp.zeros((), jnp.float32)
    for dy, dx in _SMOOTH_OFFSETS:
        ia, ib = _shift_pair(ycc, dy, dx)
        wgt = jnp.exp(
            jnp.sum(jnp.square(ia - ib), axis=-1, keepdims=True) * sigma_color
        )
        oa, ob = _shift_pair(output, dy, dx)
        grad = wgt * jnp.sum(jnp.abs(oa - ob), axis=-1, keepdims=True)
        total = total + 2.0 * jnp.mean(grad)  # each direction counted twice
    return total


def tv_loss(x: jax.Array) -> jax.Array:
    """Total variation. Parity: L_TV (loss.py:139-152), NHWC input."""
    b, h, w, _ = x.shape
    count_h = (h - 1) * w
    count_w = h * (w - 1)
    h_tv = jnp.sum(jnp.square(x[:, 1:, :, :] - x[:, :-1, :, :]))
    w_tv = jnp.sum(jnp.square(x[:, :, 1:, :] - x[:, :, :-1, :]))
    return 2.0 * (h_tv / count_h + w_tv / count_w) / b


def zero_tig_loss(
    frame: jax.Array, o: TrainOutputs, *, is_wb: bool = False
) -> jax.Array:
    """The full weighted objective. Parity: LossFunction.forward (loss.py:23-78).

    frame: the raw (B, H, W, 3) input in [0, 1]. NOTE: the criterion receives
    the RAW frame (+1e-9, loss.py:24-25), not the forward's +1e-4 copy --
    train._loss passes the pre-eps input (model/model.py:205-212), so the
    Res_1 targets are offset by 1e-4 from the forward's L11/L12. Preserved.
    """
    sg = jax.lax.stop_gradient
    inp = frame + EPS  # loss.py:24-25 (1e-9 only)

    L2d = sg(o.L2)
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
    factor = jnp.clip(factor, 1.0, 25.0)
    adjustment = jnp.power(0.7, -factor) / factor

    normalized_low = jnp.clip(L2d / o.s2, EPS, 0.8)
    enhanced_brightness = jnp.power(L2d * factor, factor)
    clamped_brightness = jnp.clip(enhanced_brightness * adjustment, EPS, 1.0)
    clamped_adjusted = jnp.clip(L2d * factor, EPS, 1.0)

    loss = jnp.zeros((), jnp.float32)
    # Enhance
    loss += _mse(o.s2, clamped_brightness) * 700.0
    loss += _mse(normalized_low, clamped_adjusted) * 1000.0
    loss += smooth_loss(L2d, o.s2) * 5.0
    loss += tv_loss(o.s2) * 1600.0
    # Res_1 (N2N stage 1)
    L11, L12 = pair_downsampler(inp)
    loss += _mse(L11, o.L_pred2) * 1000.0
    loss += _mse(L12, o.L_pred1) * 1000.0
    denoised1, denoised2 = pair_downsampler(o.L2)
    loss += _mse(o.L_pred1, denoised1) * 1000.0
    loss += _mse(o.L_pred2, denoised2) * 1000.0
    # Res_2 (N2N stage 2)
    loss += _mse(o.H3_pred, sg(jnp.concatenate([o.H12, o.s22], -1))) * 1000.0
    loss += _mse(o.H4_pred, sg(jnp.concatenate([o.H11, o.s21], -1))) * 1000.0
    H3_denoised1, H3_denoised2 = pair_downsampler(o.H3)
    loss += _mse(o.H3_pred[..., 0:3], H3_denoised1) * 1000.0
    loss += _mse(o.H4_pred[..., 0:3], H3_denoised2) * 1000.0
    # Color
    loss += _mse(sg(o.H2_blur), o.H3_blur) * 10000.0
    # Ill
    loss += _mse(sg(o.s2), o.s3) * 1000.0
    # Inter (texture-gated local mean); weighted_diff2 reuses H3_denoised1
    # exactly as written in loss.py:71
    d = o.H3_denoised1_H3_denoised2_diff
    lm1 = local_mean(H3_denoised1)
    lm2 = local_mean(H3_denoised2)
    weighted_diff1 = (1.0 - d) * lm1 + H3_denoised1 * d
    weighted_diff2 = (1.0 - d) * lm2 + H3_denoised1 * d
    loss += _mse(H3_denoised1, weighted_diff1) * 10000.0
    loss += _mse(H3_denoised2, weighted_diff2) * 10000.0
    # Var
    noise_var = calculate_local_variance(o.H3 - o.H2)
    h2_var = calculate_local_variance(o.H2)
    loss += _mse(h2_var, noise_var) * 1000.0
    return loss
