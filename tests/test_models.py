"""Model-layer tests: torch-primitive parity for layers, structural and
invariance checks for the composed networks (weights are random; the
reference checkpoints are not in the snapshot)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from zero_tig_tpu.models import (
    DENOISE_1,
    ENHANCER,
    forward_inference,
    forward_train,
    init_network_variables,
    init_raft_variables,
    instance_norm,
    raft_forward,
    reinit_enhancer,
)
from zero_tig_tpu.models.layers import TorchBatchNorm
from zero_tig_tpu.models.raft.corr import build_corr_pyramid, lookup_corr
from zero_tig_tpu.models.raft.raft import convex_upsample_flow


def nchw(x):
    return torch.from_numpy(np.ascontiguousarray(np.asarray(x).transpose(0, 3, 1, 2)))


def nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


# ---------------------------------------------------------------- layers


def test_instance_norm_matches_torch(rng):
    x = rng.standard_normal((2, 7, 9, 5)).astype(np.float32)
    ref = nhwc(F.instance_norm(nchw(x)))
    out = np.asarray(instance_norm(jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_batchnorm_train_and_eval_match_torch(rng):
    x = rng.standard_normal((1, 6, 8, 4)).astype(np.float32) * 3 + 1

    bn = TorchBatchNorm(4)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
    scale = rng.standard_normal(4).astype(np.float32)
    bias = rng.standard_normal(4).astype(np.float32)
    variables = {
        "params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
        "batch_stats": variables["batch_stats"],
    }

    tbn = torch.nn.BatchNorm2d(4)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(scale))
        tbn.bias.copy_(torch.from_numpy(bias))

    # train mode: batch stats used, running stats updated with unbiased var
    tbn.train()
    ref = nhwc(tbn(nchw(x)))
    out, mut = bn.apply(
        variables, jnp.asarray(x), False, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["mean"]),
        tbn.running_mean.numpy(),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["var"]),
        tbn.running_var.numpy(),
        atol=1e-5,
    )

    # eval mode: running stats consumed
    tbn.eval()
    ref_eval = nhwc(tbn(nchw(x)))
    out_eval = bn.apply(
        {"params": variables["params"], "batch_stats": mut["batch_stats"]},
        jnp.asarray(x),
        True,
    )
    np.testing.assert_allclose(np.asarray(out_eval), ref_eval, atol=1e-5)


def test_denoise1_matches_torch_composition(rng):
    """Denoise_1 = conv3x3 -> lrelu(0.2) -> conv3x3 -> lrelu -> conv1x1."""
    x = rng.standard_normal((1, 10, 12, 3)).astype(np.float32)
    variables = DENOISE_1.init(jax.random.PRNGKey(1), jnp.asarray(x))
    p = variables["params"]

    def tconv(xt, name, pad):
        w = np.asarray(p[name]["kernel"]).transpose(3, 2, 0, 1)
        b = np.asarray(p[name]["bias"])
        return F.conv2d(xt, torch.from_numpy(w), torch.from_numpy(b), padding=pad)

    xt = nchw(x)
    xt = F.leaky_relu(tconv(xt, "conv1", 1), 0.2)
    xt = F.leaky_relu(tconv(xt, "conv2", 1), 0.2)
    ref = nhwc(tconv(xt, "conv3", 0))

    out = np.asarray(DENOISE_1.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_enhancer_shared_block_weight_sharing():
    """The three residual stages must share ONE conv+bn parameter set
    (reference quirk, model/model.py:60-67)."""
    x = jnp.zeros((1, 8, 8, 9))
    variables = ENHANCER.init(jax.random.PRNGKey(0), x, False)
    p = variables["params"]
    assert set(p.keys()) == {"in_conv", "block", "out_conv"}
    # output in (0.0001, 1]
    y = ENHANCER.apply(variables, jnp.ones((1, 8, 8, 9)), True)
    assert float(jnp.min(y)) >= 0.0001 and float(jnp.max(y)) <= 1.0


def test_enhancer_bn_stats_updated_three_times(rng):
    """Each training forward passes through the shared BN 3x; running stats
    must reflect three sequential updates (momentum 0.1)."""
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 9)).astype(np.float32))
    variables = ENHANCER.init(jax.random.PRNGKey(0), x, False)
    _, mut = ENHANCER.apply(variables, x, False, mutable=["batch_stats"])
    m3 = np.asarray(mut["batch_stats"]["block"]["bn"]["mean"])
    # one update of momentum 0.1 from zeros cannot produce the same result
    # as three compounding updates unless batch means are zero
    assert not np.allclose(m3, 0.0)
    # var initialized at 1.0 must have moved
    v3 = np.asarray(mut["batch_stats"]["block"]["bn"]["var"])
    assert not np.allclose(v3, 1.0)


def test_reinit_enhancer_statistics():
    variables = init_network_variables(jax.random.PRNGKey(0))
    params = reinit_enhancer(jax.random.PRNGKey(7), variables["params"])
    k = np.asarray(params["enhance"]["in_conv"]["kernel"])
    assert abs(k.std() - 0.02) < 0.005
    assert np.all(np.asarray(params["enhance"]["in_conv"]["bias"]) == 0)
    bn_scale = np.asarray(params["enhance"]["block"]["bn"]["scale"])
    assert abs(bn_scale.mean() - 1.0) < 0.02
    # denoise params untouched
    np.testing.assert_array_equal(
        np.asarray(params["denoise_1"]["conv1"]["kernel"]),
        np.asarray(variables["params"]["denoise_1"]["conv1"]["kernel"]),
    )


# ---------------------------------------------------------------- RAFT parts


def test_corr_pyramid_matches_torch_matmul(rng):
    b, h, w, d = 1, 6, 8, 16
    f1 = rng.standard_normal((b, h, w, d)).astype(np.float32)
    f2 = rng.standard_normal((b, h, w, d)).astype(np.float32)
    pyr = build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=2)

    t1 = nchw(f1).view(b, d, h * w)
    t2 = nchw(f2).view(b, d, h * w)
    ref = torch.matmul(t1.transpose(1, 2), t2) / np.sqrt(d)
    ref = ref.view(b * h * w, 1, h, w)
    np.testing.assert_allclose(
        np.asarray(pyr.levels[0])[:, None], ref.numpy(), atol=1e-4
    )
    ref1 = F.avg_pool2d(ref, 2, 2)
    np.testing.assert_allclose(
        np.asarray(pyr.levels[1])[:, None], ref1.numpy(), atol=1e-4
    )


def test_lookup_corr_window_layout(rng):
    """Window position (i, j) must sample (x + L[i], y + L[j]) -- the
    reference/upstream-RAFT transpose quirk (model/RAFT/corr.py:37-43)."""
    b, h, w, d = 1, 9, 9, 4
    f1 = rng.standard_normal((b, h, w, d)).astype(np.float32)
    f2 = rng.standard_normal((b, h, w, d)).astype(np.float32)
    pyr = build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=1)

    # zero flow: coords = pixel grid
    from zero_tig_tpu.ops.sampling import coords_grid

    coords = coords_grid(b, h, w)
    out = np.asarray(lookup_corr(pyr, coords, radius=1))  # (b,h,w,9)

    corr_full = np.asarray(pyr.levels[0]).reshape(h, w, h, w)
    # query pixel (4,4) [y,x]; window channel (i,j) -> offset (dx=L[i], dy=L[j])
    L = [-1, 0, 1]
    for i in range(3):
        for j in range(3):
            expect = corr_full[4, 4, 4 + L[j], 4 + L[i]]
            got = out[0, 4, 4, i * 3 + j]
            np.testing.assert_allclose(got, expect, atol=1e-5)


def test_lookup_corr_matches_naive_sampler(rng):
    """The patch-slice fast lookup must equal direct bilinear sampling
    (grid_sample align_corners=True, zeros padding) at every level,
    including fractional and far out-of-range coords."""
    from zero_tig_tpu.ops.sampling import grid_sample_pixel

    b, h, w, d = 1, 8, 10, 8
    f1 = rng.standard_normal((b, h, w, d)).astype(np.float32)
    f2 = rng.standard_normal((b, h, w, d)).astype(np.float32)
    pyr = build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=3)

    # random coords spanning in-range, near-edge and far OOB
    coords = (rng.random((b, h, w, 2)) * 30 - 10).astype(np.float32)
    coords_j = jnp.asarray(coords)
    r = 2
    nwin = 2 * r + 1
    out_fast = np.asarray(lookup_corr(pyr, coords_j, radius=r))

    q = b * h * w
    offs = jnp.linspace(-r, r, nwin)
    cx = coords_j[..., 0].reshape(q)
    cy = coords_j[..., 1].reshape(q)
    naive = []
    for lvl, corr_l in enumerate(pyr.levels):
        sc = 1.0 / 2**lvl
        x = jnp.broadcast_to(
            cx[:, None, None] * sc + offs[None, :, None], (q, nwin, nwin)
        )
        y = jnp.broadcast_to(
            cy[:, None, None] * sc + offs[None, None, :], (q, nwin, nwin)
        )
        naive.append(
            np.asarray(grid_sample_pixel(corr_l[..., None], x, y)).reshape(b, h, w, -1)
        )
    out_naive = np.concatenate(naive, axis=-1)
    np.testing.assert_allclose(out_fast, out_naive, atol=1e-5)


def test_convex_upsample_matches_torch(rng):
    b, h, w = 1, 4, 5
    flow = rng.standard_normal((b, h, w, 2)).astype(np.float32)
    mask = rng.standard_normal((b, h, w, 576)).astype(np.float32)

    ft, mt = nchw(flow), nchw(mask)
    m = mt.view(b, 1, 9, 8, 8, h, w)
    m = torch.softmax(m, dim=2)
    up = F.unfold(8 * ft, [3, 3], padding=1).view(b, 2, 9, 1, 1, h, w)
    ref = torch.sum(m * up, dim=2).permute(0, 1, 4, 2, 5, 3).reshape(b, 2, 8 * h, 8 * w)

    out = np.asarray(convex_upsample_flow(jnp.asarray(flow), jnp.asarray(mask)))
    np.testing.assert_allclose(out.transpose(0, 3, 1, 2), ref.numpy(), atol=1e-4)


@pytest.fixture(scope="module")
def raft_vars():
    return init_raft_variables(jax.random.PRNGKey(0))


def test_raft_shapes_and_padding(raft_vars, rng):
    # 36x60 is not /8: output flow must be at the padded (40x64) resolution
    img = jnp.asarray(rng.random((1, 36, 60, 3)).astype(np.float32) * 255)
    flow_low, flow_up = raft_forward(raft_vars, img, img, iters=2)
    assert flow_low.shape == (1, 5, 8, 2)
    assert flow_up.shape == (1, 40, 64, 2)


def test_raft_identical_frames_small_flow(raft_vars, rng):
    """Zero-motion invariance: flow between identical frames stays small even
    with random weights (the GRU starts from zero flow)."""
    img = jnp.asarray((rng.random((1, 48, 64, 3)) * 255).astype(np.float32))
    _, flow_up = raft_forward(raft_vars, img, img, iters=4)
    assert float(jnp.max(jnp.abs(flow_up))) < 24.0


# ---------------------------------------------------------------- composed


@pytest.fixture(scope="module")
def net_vars():
    return init_network_variables(jax.random.PRNGKey(2))


def _carry(shape):
    return {
        "last_H3": jnp.zeros(shape, jnp.float32),
        "last_s3": jnp.zeros(shape, jnp.float32),
    }


def test_forward_train_shapes_and_ranges(net_vars, raft_vars, rng):
    frame = jnp.asarray(rng.random((1, 48, 64, 3)).astype(np.float32) * 0.2)
    outs, new_bs, new_carry = forward_train(
        net_vars, raft_vars, frame, _carry(frame.shape),
        jnp.asarray(True), of_scale=2, raft_iters=2,
    )
    assert outs.H3.shape == frame.shape
    assert outs.s2.shape == frame.shape
    assert outs.H11.shape == (1, 24, 32, 3)
    assert outs.H3_pred.shape == (1, 24, 32, 6)
    assert float(jnp.min(outs.s2)) >= 0.0001
    assert float(jnp.max(outs.H2)) <= 1.0
    assert new_carry["last_H3"].shape == frame.shape
    # binary masks
    vals = np.unique(np.asarray(outs.L_pred1_L_pred2_diff))
    assert set(vals).issubset({0.0, 1.0})


def test_forward_train_new_seq_vs_continuation(net_vars, raft_vars, rng):
    """is_new_seq must gate the warped state: with a non-zero carry the two
    paths produce different outputs."""
    frame = jnp.asarray(rng.random((1, 48, 64, 3)).astype(np.float32) * 0.2)
    carry = {
        "last_H3": jnp.asarray(rng.random((1, 48, 64, 3)).astype(np.float32)),
        "last_s3": jnp.asarray(
            rng.random((1, 48, 64, 3)).astype(np.float32) * 0.5 + 0.2
        ),
    }
    o_new, _, _ = forward_train(
        net_vars, raft_vars, frame, carry, jnp.asarray(True),
        of_scale=2, raft_iters=2,
    )
    o_cont, _, _ = forward_train(
        net_vars, raft_vars, frame, carry, jnp.asarray(False),
        of_scale=2, raft_iters=2,
    )
    assert not np.allclose(np.asarray(o_new.H3), np.asarray(o_cont.H3))
    # but L2 (pre-warp) identical
    np.testing.assert_allclose(
        np.asarray(o_new.L2), np.asarray(o_cont.L2), atol=0
    )


def test_forward_inference_new_seq_uses_H2(net_vars, raft_vars, rng):
    frame = jnp.asarray(rng.random((1, 48, 64, 3)).astype(np.float32) * 0.2)
    (H2, H3, s3), carry = forward_inference(
        net_vars, raft_vars, frame, _carry(frame.shape),
        jnp.asarray(True), of_scale=2, raft_iters=2,
    )
    assert H2.shape == frame.shape and H3.shape == frame.shape
    assert float(jnp.min(H3)) >= np.float32(1e-4) and float(jnp.max(H3)) <= 1.0
    # second frame continues the sequence
    (H2b, H3b, _), _ = forward_inference(
        net_vars, raft_vars, frame, carry, jnp.asarray(False),
        of_scale=2, raft_iters=2,
    )
    assert H3b.shape == frame.shape


def test_forward_train_jits_once(net_vars, raft_vars, rng):
    """One compiled graph serves both new-seq and continuation frames."""
    fwd = jax.jit(
        lambda v, r, f, c, n: forward_train(
            v, r, f, c, n, of_scale=2, raft_iters=2
        )
    )
    frame = jnp.asarray(rng.random((1, 48, 64, 3)).astype(np.float32))
    carry = _carry(frame.shape)
    o1, _, carry = fwd(net_vars, raft_vars, frame, carry, jnp.asarray(True))
    o2, _, _ = fwd(net_vars, raft_vars, frame, carry, jnp.asarray(False))
    assert fwd._cache_size() == 1


@pytest.mark.parametrize("hw", [(50, 70), (47, 63)])
def test_forward_inference_odd_sizes(net_vars, raft_vars, rng, hw):
    """Non-/8, odd frame sizes must flow through the whole step: floor
    pair-downsampling, of_scale division, /8 replicate padding inside RAFT,
    padded-res flow into the warp."""
    h, w = hw
    frame = jnp.asarray(rng.random((1, h, w, 3)).astype(np.float32) * 0.2)
    carry = {
        "last_H3": jnp.asarray(rng.random((1, h, w, 3)).astype(np.float32)),
        "last_s3": jnp.asarray(
            rng.random((1, h, w, 3)).astype(np.float32) * 0.5 + 0.2
        ),
    }
    (H2, H3, s3), new_carry = forward_inference(
        net_vars, raft_vars, frame, carry, jnp.asarray(False),
        of_scale=3, raft_iters=2,
    )
    assert H3.shape == frame.shape
    assert np.isfinite(np.asarray(H3)).all()


def test_update_block_fast_apply_matches_module(rng):
    """The raw-param fast apply (z/r gate convs fused into one conv per GRU
    direction) is the same function as the Flax module path: channel-concat
    of kernels that read the same input leaves every output channel's
    products untouched."""
    from zero_tig_tpu.models.raft.update import (
        BasicUpdateBlock,
        update_block_apply_fast,
    )

    blk = BasicUpdateBlock(hidden_dim=128)
    net = jnp.asarray(rng.standard_normal((1, 6, 8, 128)).astype(np.float32))
    inp = jnp.asarray(rng.standard_normal((1, 6, 8, 128)).astype(np.float32))
    corr = jnp.asarray(rng.standard_normal((1, 6, 8, 324)).astype(np.float32))
    flow = jnp.asarray(rng.standard_normal((1, 6, 8, 2)).astype(np.float32))
    v = blk.init(jax.random.PRNGKey(0), net, inp, corr, flow)

    ref_net, _, ref_delta = blk.apply(v, net, inp, corr, flow)
    f_net, f_delta = update_block_apply_fast(v["params"], net, inp, corr, flow)
    np.testing.assert_allclose(np.asarray(f_net), np.asarray(ref_net), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(f_delta), np.asarray(ref_delta), atol=1e-6
    )


def test_raft_forward_fused_body_matches_module_body(raft_vars, rng):
    """raft_forward's opt-in fused fast body (raw z/r-fused apply, mask
    once post-scan; precision.set_raft_fused) returns the same flow as
    the default module body at the same precision."""
    from zero_tig_tpu.core import precision
    from zero_tig_tpu.models.raft import raft as raftmod

    img = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32) * 255.0)
    img2 = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32) * 255.0)
    precision.set_precision("fast")
    try:
        _, up_module = raft_forward(raft_vars, img, img2, iters=3)
        precision.set_raft_fused(True)
        _, up_fused = raft_forward(raft_vars, img, img2, iters=3)
    finally:
        precision.set_raft_fused(False)
        precision.set_precision("highest")
    np.testing.assert_allclose(
        np.asarray(up_fused), np.asarray(up_module), atol=1e-4
    )
