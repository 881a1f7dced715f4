"""Golden validation of the hand-implemented eval metrics.

skimage is not installed in this image, so ssim_uint8 / match_histograms in
eval/metrics.py are reimplementations of the skimage algorithms the reference
calls (evals.py:76-103). These tests validate them against INDEPENDENT
brute-force formulations (explicit per-window loops / per-element quantile
mapping) plus hand-computable fixed points, so an error in the fast cumsum /
vectorized paths cannot silently skew every reported number.
"""

from __future__ import annotations

import numpy as np
import pytest

from zero_tig_tpu.eval.metrics import (
    match_histograms,
    psnr_uint8,
    ssim_uint8,
    to_uint8,
)


def _ssim_bruteforce(img: np.ndarray, gt: np.ndarray, win: int = 7) -> float:
    """skimage structural_similarity via explicit per-window loops.

    skimage crops pad=(win-1)//2 border pixels from the SSIM map before
    averaging, so only fully-interior windows contribute; each is evaluated
    directly from its pixels here (sample covariance, data_range=255).
    """
    k1, k2 = 0.01, 0.03
    c1 = (k1 * 255.0) ** 2
    c2 = (k2 * 255.0) ** 2
    pad = (win - 1) // 2
    npix = win * win
    cov_norm = npix / (npix - 1)

    vals = []
    for ch in range(img.shape[2]):
        x = img[..., ch].astype(np.float64)
        y = gt[..., ch].astype(np.float64)
        h, w = x.shape
        smap = []
        for i in range(pad, h - pad):
            for j in range(pad, w - pad):
                wx = x[i - pad : i + pad + 1, j - pad : j + pad + 1]
                wy = y[i - pad : i + pad + 1, j - pad : j + pad + 1]
                ux, uy = wx.mean(), wy.mean()
                vx = cov_norm * ((wx * wx).mean() - ux * ux)
                vy = cov_norm * ((wy * wy).mean() - uy * uy)
                vxy = cov_norm * ((wx * wy).mean() - ux * uy)
                s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
                    (ux * ux + uy * uy + c1) * (vx + vy + c2)
                )
                smap.append(s)
        vals.append(np.mean(smap))
    return float(np.mean(vals))


def _match_histograms_bruteforce(out: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """Per-element quantile mapping: for each output value v, its source
    quantile is count(out <= v)/size, mapped through the template's
    (quantile -> value) curve. One joint CDF over all channels, matching the
    reference's match_histograms call with no channel_axis."""
    tmpl_values, tmpl_counts = np.unique(gt.ravel(), return_counts=True)
    tmpl_quantiles = np.cumsum(tmpl_counts) / gt.size
    flat = out.ravel()
    res = np.empty(flat.shape, np.float64)
    for i, v in enumerate(flat):
        q = np.count_nonzero(flat <= v) / flat.size
        res[i] = np.interp(q, tmpl_quantiles, tmpl_values)
    return res.reshape(out.shape).astype(out.dtype, copy=False)


def test_ssim_matches_bruteforce():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (20, 24, 3), dtype=np.uint8)
    gt = np.clip(
        img.astype(np.int32) + rng.integers(-30, 30, img.shape), 0, 255
    ).astype(np.uint8)
    fast = ssim_uint8(img, gt)
    slow = _ssim_bruteforce(img, gt)
    assert fast == pytest.approx(slow, abs=1e-10)


def test_ssim_identity_is_one():
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    assert ssim_uint8(img, img) == pytest.approx(1.0, abs=1e-12)


def test_match_histograms_matches_bruteforce():
    rng = np.random.default_rng(13)
    out = rng.uniform(0, 1, (9, 11, 3)).astype(np.float32)
    gt = rng.uniform(0.2, 0.9, (9, 11, 3)).astype(np.float32)
    fast = match_histograms(out, gt)
    slow = _match_histograms_bruteforce(out, gt)
    np.testing.assert_allclose(fast, slow, atol=1e-6)


def test_match_histograms_identity():
    rng = np.random.default_rng(14)
    out = rng.uniform(0, 1, (8, 8, 3)).astype(np.float32)
    matched = match_histograms(out, out)
    np.testing.assert_allclose(matched, out, atol=1e-7)


def test_match_histograms_exact_after_matching():
    """After matching, the output's sorted values equal the template's."""
    rng = np.random.default_rng(15)
    out = rng.uniform(0, 1, (6, 7, 3)).astype(np.float64)
    gt = rng.uniform(0, 1, (6, 7, 3)).astype(np.float64)
    matched = match_histograms(out, gt)
    np.testing.assert_allclose(
        np.sort(matched.ravel()), np.sort(gt.ravel()), atol=1e-9
    )


def test_psnr_hand_value():
    img = np.zeros((4, 4, 3), np.uint8)
    gt = np.ones((4, 4, 3), np.uint8)
    assert psnr_uint8(img, gt) == pytest.approx(10 * np.log10(255.0**2), rel=1e-12)
    assert psnr_uint8(img, img) == float("inf")


def test_to_uint8_rounds():
    x = np.array([[[0.0, 0.5019607, 1.0]]], np.float32)  # 0.50196*255=128.0
    np.testing.assert_array_equal(to_uint8(x), [[[0, 128, 255]]])
