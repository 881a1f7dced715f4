"""Golden-value tests for zero_tig_tpu.ops against PyTorch CPU primitives.

Each op in SURVEY.md section 2.4 must reproduce the corresponding torch
*library* call bit-for-bit (up to float associativity). torch is used here
only as a test oracle -- the framework itself never imports it.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from zero_tig_tpu import ops


def nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


def nhwc(t_nchw: torch.Tensor) -> np.ndarray:
    return t_nchw.detach().numpy().transpose(0, 2, 3, 1)


@pytest.mark.parametrize("shape", [(1, 8, 10, 3), (2, 9, 7, 4)])
def test_pair_downsampler(rng, shape):
    x = rng.standard_normal(shape).astype(np.float32)
    xt = nchw(x)
    c = xt.shape[1]
    f1 = torch.tensor([[[[0.0, 0.5], [0.5, 0.0]]]]).repeat(c, 1, 1, 1)
    f2 = torch.tensor([[[[0.5, 0.0], [0.0, 0.5]]]]).repeat(c, 1, 1, 1)
    ref1 = nhwc(F.conv2d(xt, f1, stride=2, groups=c))
    ref2 = nhwc(F.conv2d(xt, f2, stride=2, groups=c))
    o1, o2 = ops.pair_downsampler(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(o1), ref1, atol=1e-6)
    np.testing.assert_allclose(np.asarray(o2), ref2, atol=1e-6)


def test_gauss_kernel_and_blur(rng):
    # reference gauss_kernel with nsig=1 (utils/utils.py:29-39,52-58)
    kernlen, nsig = 21, 1.0
    interval = (2 * nsig + 1.0) / kernlen
    x = torch.linspace(-nsig - interval / 2.0, nsig + interval / 2.0, kernlen + 1)
    kern1d = torch.diff(0.5 * (1 + torch.erf(x / torch.sqrt(torch.tensor(2.0)))))
    kernel_raw = torch.sqrt(torch.outer(kern1d, kern1d))
    ref_k = (kernel_raw / kernel_raw.sum()).numpy()
    np.testing.assert_allclose(np.asarray(ops.gauss_kernel(21, 1.0)), ref_k, atol=1e-7)

    img = rng.random((1, 32, 40, 3)).astype(np.float32)
    it = nchw(img)
    kt = torch.from_numpy(ref_k).view(1, 1, 21, 21).repeat(3, 1, 1, 1)
    ip = F.pad(it, (10, 10, 10, 10), mode="reflect")
    ref = nhwc(F.conv2d(ip, kt, groups=3))
    out = np.asarray(ops.blur(jnp.asarray(img)))
    np.testing.assert_allclose(out, ref, atol=2e-6)


def test_local_mean(rng):
    x = rng.random((2, 12, 14, 3)).astype(np.float32)
    xt = nchw(x)
    xp = F.pad(xt, (2, 2, 2, 2), mode="reflect")
    patches = xp.unfold(2, 5, 1).unfold(3, 5, 1)
    ref = nhwc(patches.mean(dim=(4, 5)))
    out = np.asarray(ops.local_mean(jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_local_stddev(rng):
    x = rng.random((1, 16, 16, 1)).astype(np.float32)
    xt = nchw(x)
    xp = F.pad(xt, (2, 2, 2, 2), mode="reflect")
    patches = xp.unfold(2, 5, 1).unfold(3, 5, 1)
    mean = patches.mean(dim=(4, 5), keepdim=True)
    var = ((patches - mean) ** 2).mean(dim=(4, 5))
    ref = nhwc(torch.sqrt(var + 1e-9))
    out = np.asarray(ops.local_stddev(jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_calculate_local_variance(rng):
    x = rng.random((1, 10, 12, 3)).astype(np.float32)
    xt = nchw(x)
    avg = F.avg_pool2d(xt, kernel_size=5, stride=1, padding=2)
    avg_p = F.pad(avg, (2, 2, 2, 2))
    x_p = F.pad(xt, (2, 2, 2, 2))
    ua = avg_p.unfold(2, 5, 1).unfold(3, 5, 1)
    ux = x_p.unfold(2, 5, 1).unfold(3, 5, 1)
    ref = nhwc(((ux - ua) ** 2).mean(dim=(4, 5)))
    out = np.asarray(ops.calculate_local_variance(jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_avg_pool2d_matches_torch(rng):
    x = rng.random((1, 9, 11, 4)).astype(np.float32)
    ref = nhwc(F.avg_pool2d(nchw(x), 2, stride=2))
    out = np.asarray(ops.avg_pool2d(jnp.asarray(x), 2, 2))
    np.testing.assert_allclose(out, ref, atol=1e-6)
    ref2 = nhwc(F.avg_pool2d(nchw(x), 5, stride=1, padding=2))
    out2 = np.asarray(ops.avg_pool2d(jnp.asarray(x), 5, 1, 2))
    np.testing.assert_allclose(out2, ref2, atol=1e-6)


@pytest.mark.parametrize("align", [False, True])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((12, 16), (7, 9)),
        ((7, 9), (21, 30)),
        ((360, 640), (33, 47)),
        # integer-ratio strided fast paths (align_corners=False branch):
        ((12, 16), (4, 8)),    # 3x / 2x downscale
        ((6, 8), (24, 16)),    # 4x / 2x upscale
        ((9, 8), (27, 40)),    # 3x / 5x upscale (odd phases + clamp row)
        ((30, 8), (5, 8)),     # 6x downscale / identity W
    ],
)
def test_resize_bilinear(rng, align, in_hw, out_hw):
    x = rng.random((2, *in_hw, 3)).astype(np.float32)
    ref = nhwc(
        F.interpolate(nchw(x), out_hw, mode="bilinear", align_corners=align)
    )
    out = np.asarray(
        ops.resize_bilinear(jnp.asarray(x), out_hw, align_corners=align)
    )
    # atol 5e-5: torch computes lerp weights in a slightly different f32
    # order; indices agree exactly (verified), only weights wobble ~1e-5.
    np.testing.assert_allclose(out, ref, atol=5e-5)


def test_upflow8(rng):
    flow = (rng.standard_normal((1, 6, 8, 2)) * 3).astype(np.float32)
    ft = nchw(flow)
    ref = nhwc(
        8 * F.interpolate(ft, (48, 64), mode="bilinear", align_corners=True)
    )
    out = np.asarray(ops.upflow8(jnp.asarray(flow)))
    np.testing.assert_allclose(out, ref, atol=1e-4)


@pytest.mark.parametrize("align", [False, True])
def test_grid_sample(rng, align):
    img = rng.random((2, 10, 13, 3)).astype(np.float32)
    # include out-of-range coords to exercise zeros padding
    grid = (rng.random((2, 6, 7, 2)) * 2.6 - 1.3).astype(np.float32)
    ref = nhwc(
        F.grid_sample(
            nchw(img),
            torch.from_numpy(grid),
            mode="bilinear",
            padding_mode="zeros",
            align_corners=align,
        )
    )
    out = np.asarray(
        ops.grid_sample(jnp.asarray(img), jnp.asarray(grid), align_corners=align)
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_bilinear_sampler_pixel_coords(rng):
    """Pixel-coordinate path matches reference bilinear_sampler semantics:
    normalize to [-1,1] with (W-1)/(H-1) then grid_sample align_corners=True
    (utils/utils.py:285-299)."""
    img = rng.random((3, 9, 9, 2)).astype(np.float32)
    x = (rng.random((3, 5, 5)) * 12 - 2).astype(np.float32)
    y = (rng.random((3, 5, 5)) * 12 - 2).astype(np.float32)
    xg = 2 * torch.from_numpy(x) / (9 - 1) - 1
    yg = 2 * torch.from_numpy(y) / (9 - 1) - 1
    grid = torch.stack([xg, yg], dim=-1)
    ref = nhwc(F.grid_sample(nchw(img), grid, align_corners=True))
    out = np.asarray(
        ops.grid_sample_pixel(jnp.asarray(img), jnp.asarray(x), jnp.asarray(y))
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_equalize_uint8_matches_torchvision_algorithm(rng):
    """Oracle: the torchvision _scale_channel algorithm implemented on torch
    tensors (torchvision itself is not installed in this image)."""
    img = (rng.random((2, 24, 32, 3)) ** 2 * 255).astype(np.uint8)

    def scale_channel(ch: torch.Tensor) -> torch.Tensor:
        hist = torch.bincount(ch.flatten().long(), minlength=256)
        nonzero_hist = hist[hist != 0]
        step = torch.div(nonzero_hist[:-1].sum(), 255, rounding_mode="floor")
        if step == 0:
            return ch
        lut = torch.div(
            torch.cumsum(hist, 0) + torch.div(step, 2, rounding_mode="floor"),
            step,
            rounding_mode="floor",
        )
        lut = torch.nn.functional.pad(lut, [1, 0])[:-1].clamp(0, 255)
        return lut[ch.long()].to(torch.uint8)

    t = torch.from_numpy(img.transpose(0, 3, 1, 2))
    ref = torch.stack(
        [torch.stack([scale_channel(t[b, c]) for c in range(3)]) for b in range(2)]
    )
    out = np.asarray(ops.equalize_uint8(jnp.asarray(img)))
    np.testing.assert_array_equal(out, ref.numpy().transpose(0, 2, 3, 1))


def test_equalize_constant_channel_unchanged():
    img = np.full((1, 8, 8, 3), 77, dtype=np.uint8)
    out = np.asarray(ops.equalize_uint8(jnp.asarray(img)))
    np.testing.assert_array_equal(out, img)


def test_warp_tensor_matches_reference_composition(rng):
    """Compose the reference warp from torch primitives: grid - flow, swapped
    scales (utils/utils.py:215-216), bilinear map resize (align=False),
    normalize, grid_sample zeros/align=False."""
    B, Hf, Wf = 1, 6, 8
    Hd, Wd = 18, 24
    flow = (rng.standard_normal((B, Hf, Wf, 2)) * 2).astype(np.float32)
    img1 = rng.random((B, Hd, Wd, 3)).astype(np.float32)
    img2 = rng.random((B, Hd, Wd, 3)).astype(np.float32)

    ft = nchw(flow)
    h_scale = Hd / Hf
    w_scale = Wd / Wf
    gy, gx = torch.meshgrid(
        torch.arange(Hf, dtype=torch.float32),
        torch.arange(Wf, dtype=torch.float32),
        indexing="ij",
    )
    map_x = (gx[None] - ft[:, 0]) * h_scale
    map_y = (gy[None] - ft[:, 1]) * w_scale
    map_x = F.interpolate(map_x.unsqueeze(1), (Hd, Wd), mode="bilinear")
    map_y = F.interpolate(map_y.unsqueeze(1), (Hd, Wd), mode="bilinear")
    grid = torch.stack(
        [map_x / ((Wd - 1) / 2) - 1, map_y / ((Hd - 1) / 2) - 1], dim=-1
    ).squeeze(1)
    ref_w = nhwc(F.grid_sample(nchw(img1), grid, mode="bilinear", padding_mode="zeros"))
    ref_o = 0.5 * ref_w + 0.5 * img2

    w_out, o_out = ops.warp_tensor(
        jnp.asarray(flow), jnp.asarray(img1), jnp.asarray(img2)
    )
    np.testing.assert_allclose(np.asarray(w_out), ref_w, atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_out), ref_o, atol=1e-5)


def test_pad8(rng):
    x = rng.random((1, 13, 22, 3)).astype(np.float32)
    t, b, l, r = ops.pad8_amounts(13, 22)
    ref = nhwc(F.pad(nchw(x), (l, r, t, b), mode="replicate"))
    out = np.asarray(ops.pad8_replicate(jnp.asarray(x)))
    assert out.shape[1] % 8 == 0 and out.shape[2] % 8 == 0
    np.testing.assert_allclose(out, ref, atol=1e-7)
    back = np.asarray(ops.unpad8(jnp.asarray(out), 13, 22))
    np.testing.assert_allclose(back, x, atol=1e-7)


def test_conv2d_matches_torch(rng):
    x = rng.standard_normal((2, 9, 11, 5)).astype(np.float32)
    w = rng.standard_normal((3, 3, 5, 7)).astype(np.float32)
    b = rng.standard_normal((7,)).astype(np.float32)
    wt = torch.from_numpy(w.transpose(3, 2, 0, 1))  # HWIO -> OIHW
    ref = nhwc(F.conv2d(nchw(x), wt, torch.from_numpy(b), padding=1))
    out = np.asarray(
        ops.conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), padding=1)
    )
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_texture_difference_mask(rng):
    """End-to-end vs the loss.py:99-136 math built from torch primitives."""
    i1 = rng.random((1, 16, 16, 3)).astype(np.float32)
    i2 = rng.random((1, 16, 16, 3)).astype(np.float32)

    def gray(t):
        return (0.144 * t[:, 0] + 0.5870 * t[:, 1] + 0.299 * t[:, 2]).unsqueeze(1)

    def stddev(t):
        tp = F.pad(t, (2, 2, 2, 2), mode="reflect")
        p = tp.unfold(2, 5, 1).unfold(3, 5, 1)
        m = p.mean(dim=(4, 5), keepdim=True)
        return torch.sqrt(((p - m) ** 2).mean(dim=(4, 5)) + 1e-9)

    s1, s2 = stddev(gray(nchw(i1))), stddev(gray(nchw(i2)))
    diff = 2 * s1 * s2 / (s1**2 + s2**2 + 1e-5)
    ref = nhwc(torch.where(diff > 0.975, torch.tensor(1.0), torch.tensor(0.0)))
    out = np.asarray(ops.texture_difference(jnp.asarray(i1), jnp.asarray(i2)))
    # binary masks: require exact agreement on > 99.9% of pixels (borderline
    # threshold pixels may flip due to float associativity)
    agree = (out == ref).mean()
    assert agree > 0.999, f"mask agreement {agree}"


def test_grid_sample_pixel_quad_bit_identical(rng):
    """The single-gather quad formulation == the 4-gather path, exactly
    (same f32 weight/accumulation math, zero-padded corners)."""
    import jax.numpy as jnp

    img = jnp.asarray(rng.uniform(0, 1, (2, 17, 23, 6)).astype(np.float32))
    x = jnp.asarray(rng.uniform(-4, 27, (2, 9, 11)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-4, 21, (2, 9, 11)).astype(np.float32))
    base = ops.grid_sample_pixel(img, x, y)
    quad = ops.sampling.grid_sample_pixel_quad(img, x, y)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(quad))
