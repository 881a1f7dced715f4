"""Window/filter image ops with PyTorch-reference-exact semantics (NHWC).

These are the HBM-bandwidth-bound elementwise/window kernels of the pipeline
(SURVEY.md section 2.4). They are written as slicing + depthwise convolutions
so XLA fuses them with neighbouring ops; the padding-mode distinctions of the
reference (reflect for means/stddev, zero for the variance op) are preserved
exactly.
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .convs import depthwise_conv2d


def pair_downsampler(img: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Neighbor2Neighbor diagonal pair downsampling.

    Parity: utils/utils.py:15-24 -- two 2x2 stride-2 grouped convs with fixed
    filters [[0,.5],[.5,0]] and [[.5,0],[0,.5]]. Implemented as strided
    slicing (no conv needed): pure VPU adds, fully fusable.

    img: (B, H, W, C) -> two (B, H//2, W//2, C) siblings.

    Formulated as reshape + static indexing rather than stride-2 slicing:
    bit-identical, but the reshape lowers to a single relayout on TPU
    (2x faster than four strided slices at 1080p).
    """
    h2 = img.shape[-3] // 2
    w2 = img.shape[-2] // 2
    r = img[..., : 2 * h2, : 2 * w2, :].reshape(
        *img.shape[:-3], h2, 2, w2, 2, img.shape[-1]
    )
    a = r[..., 0, :, 0, :]  # (2i,   2j)
    b = r[..., 0, :, 1, :]  # (2i,   2j+1)
    c = r[..., 1, :, 0, :]  # (2i+1, 2j)
    d = r[..., 1, :, 1, :]  # (2i+1, 2j+1)
    out1 = 0.5 * (b + c)
    out2 = 0.5 * (a + d)
    return out1, out2


def gauss_kernel(kernlen: int = 21, nsig: float = 3.0) -> jax.Array:
    """erf-based Gaussian kernel, parity with utils/utils.py:29-39.

    Computed host-side in numpy (float32, like torch.linspace) so the result
    is a trace-safe constant. The reference's ``blur`` uses nsig=1
    (utils/utils.py:56).
    """
    from scipy.special import erf as np_erf

    interval = (2 * nsig + 1.0) / kernlen
    x = np.linspace(
        -nsig - interval / 2.0, nsig + interval / 2.0, kernlen + 1,
        dtype=np.float32,
    )
    cdf = 0.5 * (1.0 + np_erf(x / math.sqrt(2.0)))
    kern1d = np.diff(cdf)
    kernel_raw = np.sqrt(np.outer(kern1d, kern1d))
    return (kernel_raw / kernel_raw.sum()).astype(np.float32)


_BLUR_KERNEL_21 = gauss_kernel(21, 1.0)  # numpy: no device ops at import


_s1d = None


def _sqrt_taps() -> np.ndarray:
    """The separable 21-tap factor of the erf blur kernel (host constant)."""
    global _s1d
    if _s1d is None:
        k2d = np.asarray(_BLUR_KERNEL_21, np.float64)
        # recover s = sqrt(k1d)/sqrt(S) from row 10: row = sqrt(k1d[10])*s
        row = k2d[10]
        s = row / np.sqrt(row[10])
        assert np.allclose(np.outer(s, s), k2d, atol=1e-12)
        _s1d = s.astype(np.float32)
    return _s1d


def blur(x: jax.Array) -> jax.Array:
    """21x21 Gaussian depthwise blur, reflect padding.

    Parity: utils/utils.py:52-58 (kernel_size=21, nsig=1, reflect pad 10).
    Evaluated as two separable 21-tap depthwise passes (the erf kernel is
    sqrt(outer(k1d, k1d))/S == outer(sqrt(k1d), sqrt(k1d))/S exactly).
    """
    _sqrt_taps()
    xp = jnp.pad(x, ((0, 0), (10, 10), (10, 10), (0, 0)), mode="reflect")
    s = jnp.asarray(_s1d, x.dtype)
    out = depthwise_conv2d(xp, s[:, None], padding=0)
    return depthwise_conv2d(out, s[None, :], padding=0)


def _box_sum(x: jax.Array, k: int) -> jax.Array:
    """Unpadded k x k sliding-window sum via separable depthwise conv."""
    ones_col = jnp.ones((k, 1), dtype=x.dtype)
    x = depthwise_conv2d(x, ones_col, padding=0)
    return depthwise_conv2d(x, ones_col.T, padding=0)


def local_mean(x: jax.Array, patch_size: int = 5) -> jax.Array:
    """5x5 sliding mean with reflect padding. Parity: utils/utils.py:41-50."""
    p = patch_size // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    return _box_sum(xp, patch_size) / (patch_size * patch_size)


def local_stddev(x: jax.Array, patch_size: int = 5, eps: float = 1e-9) -> jax.Array:
    """Window stddev with reflect padding. Parity: loss.py:123-131.

    mean over window of (patch - window_mean)^2 == E[x^2] - E[x]^2 with both
    expectations over the same window.
    """
    p = patch_size // 2
    n = patch_size * patch_size
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    m = _box_sum(xp, patch_size) / n
    ex2 = _box_sum(xp * xp, patch_size) / n
    var = jnp.maximum(ex2 - m * m, 0.0)
    return jnp.sqrt(var + eps)


def avg_pool2d(x: jax.Array, kernel: int, stride: int, padding: int = 0) -> jax.Array:
    """torch ``nn.AvgPool2d`` with count_include_pad=True (the default).

    Implemented as a separable depthwise conv (differentiable; the generic
    ``lax.reduce_window`` has no VJP rule in this form).
    """
    ones_col = jnp.ones((kernel, 1), dtype=x.dtype) / kernel
    c = x.shape[-1]
    w_col = jnp.broadcast_to(ones_col[:, :, None, None], (kernel, 1, 1, c))
    x = lax.conv_general_dilated(
        x, w_col, (stride, 1), [(padding, padding), (0, 0)],
        feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
    )
    w_row = jnp.broadcast_to(ones_col.T[:, :, None, None], (1, kernel, 1, c))
    return lax.conv_general_dilated(
        x, w_row, (1, stride), [(0, 0), (padding, padding)],
        feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
    )


def calculate_local_variance(x: jax.Array) -> jax.Array:
    """Local variance vs the 5x5 AvgPool mean, zero padding.

    Parity: utils/utils.py:66-79 -- noisy_avg = AvgPool2d(5, pad=2,
    count_include_pad), then the 5x5 window mean (zero-padded, via
    ``padr_tensor``) of (x - noisy_avg)^2.
    """
    avg = avg_pool2d(x, kernel=5, stride=1, padding=2)
    d2 = (x - avg) ** 2
    d2p = jnp.pad(d2, ((0, 0), (2, 2), (2, 2), (0, 0)))
    return _box_sum(d2p, 5) / 25.0


# ---------------------------------------------------------------------------
# W-minor (B, C, H, W) twins of the 3-channel loss-tail filters.
#
# At 1080p a 3-channel NHWC tensor pads its minor dim 3 -> 128 lanes, so
# every windowed op pays ~42x its logical bytes; in W-minor layout the minor
# dim is W=1920 (lane-dense) and the separable taps become shifted adds.
# Measured one v5e (round-4 scout, tools/snippets_filters_layout.py):
# blur 8.77 ms (NHWC depthwise conv) -> 2.72 ms (W-minor shifted adds);
# NHWC->NCHW transpose ~1.3 ms each way. The loss consumes only MEANS of
# these maps (layout-invariant), so W-minor outputs never transpose back.
# Used by the fast-mode training loss tail (losses/zero_tig_loss.py,
# core.precision.set_loss_tail).
# ---------------------------------------------------------------------------


def _slide_h(x: jax.Array, taps) -> jax.Array:
    """Sliding weighted sum along axis -2 (valid): sum_k taps[k]*x[i+k]."""
    k = len(taps)
    h = x.shape[-2] - (k - 1)
    acc = None
    for i in range(k):
        t = taps[i] * x[..., i : i + h, :]
        acc = t if acc is None else acc + t
    return acc


def _slide_w(x: jax.Array, taps) -> jax.Array:
    """Sliding weighted sum along the minor axis -1 (valid)."""
    k = len(taps)
    w = x.shape[-1] - (k - 1)
    acc = None
    for i in range(k):
        t = taps[i] * x[..., i : i + w]
        acc = t if acc is None else acc + t
    return acc


def blur_wminor(x: jax.Array) -> jax.Array:
    """``blur`` on a (B, C, H, W) tensor: same separable sqrt-kernel taps,
    reflect pad 10, H pass then W pass (the NHWC twin's conv order)."""
    taps = [float(v) for v in _sqrt_taps()]
    xp = jnp.pad(x, ((0, 0), (0, 0), (10, 10), (10, 10)), mode="reflect")
    return _slide_w(_slide_h(xp, taps), taps)


def local_variance_wminor(x: jax.Array) -> jax.Array:
    """``calculate_local_variance`` on a (B, C, H, W) tensor.

    Same semantics as the NHWC twin (utils/utils.py:66-79 parity): 5x5
    AvgPool mean with zero padding 2 and count_include_pad, then the 5x5
    zero-padded window mean of (x - avg)^2.
    """
    five = [0.2] * 5
    xp = jnp.pad(x, ((0, 0), (0, 0), (2, 2), (2, 2)))
    avg = _slide_w(_slide_h(xp, five), five)
    d2 = jnp.square(x - avg)
    d2p = jnp.pad(d2, ((0, 0), (0, 0), (2, 2), (2, 2)))
    return _slide_w(_slide_h(d2p, five), five)


def pair_downsampler_wminor(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """``pair_downsampler`` on a (B, C, H, W) tensor: same diagonal-pair
    averages ((2i,2j+1)+(2i+1,2j))/2 and ((2i,2j)+(2i+1,2j+1))/2, computed
    as static reshape-slices (no 3-of-128 NHWC lane padding)."""
    b, c, h, w = x.shape
    r = x[..., : 2 * (h // 2), : 2 * (w // 2)].reshape(
        b, c, h // 2, 2, w // 2, 2
    )
    a = r[..., 0, :, 0]
    bb = r[..., 0, :, 1]
    cc = r[..., 1, :, 0]
    d = r[..., 1, :, 1]
    return 0.5 * (bb + cc), 0.5 * (a + d)


def local_mean_wminor(x: jax.Array, patch_size: int = 5) -> jax.Array:
    """``local_mean`` on a (B, C, H, W) tensor (5x5 reflect-pad mean)."""
    p = patch_size // 2
    xp = jnp.pad(x, ((0, 0), (0, 0), (p, p), (p, p)), mode="reflect")
    ones = [1.0] * patch_size
    return _slide_w(_slide_h(xp, ones), ones) / (patch_size * patch_size)


def local_stddev_wminor(
    x: jax.Array, patch_size: int = 5, eps: float = 1e-9
) -> jax.Array:
    """``local_stddev`` on a (B, C, H, W) tensor: E[x^2] - E[x]^2 over the
    reflect-padded window, exactly the NHWC twin's formula."""
    p = patch_size // 2
    n = patch_size * patch_size
    xp = jnp.pad(x, ((0, 0), (0, 0), (p, p), (p, p)), mode="reflect")
    ones = [1.0] * patch_size
    m = _slide_w(_slide_h(xp, ones), ones) / n
    ex2 = _slide_w(_slide_h(xp * xp, ones), ones) / n
    var = jnp.maximum(ex2 - m * m, 0.0)
    return jnp.sqrt(var + eps)


def texture_difference_wminor(
    img1: jax.Array,
    img2: jax.Array,
    *,
    patch_size: int = 5,
    constant_c: float = 1e-5,
    threshold: float = 0.975,
) -> jax.Array:
    """``texture_difference`` on (B, 3, H, W) tensors -> (B, 1, H, W) mask.
    Same quirky 0.144/0.587/0.299 grayscale coefficients (loss.py:135)."""
    def gray(im):
        return (
            0.144 * im[:, 0:1] + 0.5870 * im[:, 1:2] + 0.299 * im[:, 2:3]
        )

    s1 = local_stddev_wminor(gray(img1), patch_size)
    s2 = local_stddev_wminor(gray(img2), patch_size)
    diff = (2.0 * s1 * s2) / (s1 * s1 + s2 * s2 + constant_c)
    return jnp.where(diff > threshold, 1.0, 0.0).astype(img1.dtype)


def texture_difference(
    img1: jax.Array,
    img2: jax.Array,
    *,
    patch_size: int = 5,
    constant_c: float = 1e-5,
    threshold: float = 0.975,
) -> jax.Array:
    """Binary texture-similarity mask. Parity: loss.py:99-136.

    Grayscale conversion uses the reference's (quirky) channel coefficients
    0.144*R + 0.587*G + 0.299*B (loss.py:135). img: (B, H, W, 3) ->
    (B, H, W, 1) float mask in {0, 1}.
    """
    def gray(im):
        return (
            0.144 * im[..., 0:1] + 0.5870 * im[..., 1:2] + 0.299 * im[..., 2:3]
        )

    s1 = local_stddev(gray(img1), patch_size)
    s2 = local_stddev(gray(img2), patch_size)
    diff = (2.0 * s1 * s2) / (s1 * s1 + s2 * s2 + constant_c)
    return jnp.where(diff > threshold, 1.0, 0.0).astype(img1.dtype)
