"""Loss-subsystem tests. Oracles are built from torch primitives following
the loss.py formulas (weights/eps from SURVEY.md section 2.3)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from zero_tig_tpu.losses import smooth_loss, tv_loss, zero_tig_loss
from zero_tig_tpu.losses.zero_tig_loss import _rgb2ycbcr_scrambled
from zero_tig_tpu.models import (
    forward_train,
    init_network_variables,
    init_raft_variables,
)


def nchw(x):
    return torch.from_numpy(np.ascontiguousarray(np.asarray(x).transpose(0, 3, 1, 2)))


def test_tv_loss_matches_torch(rng):
    x = rng.random((2, 7, 9, 3)).astype(np.float32)
    xt = nchw(x)
    h, w = 7, 9
    h_tv = ((xt[:, :, 1:, :] - xt[:, :, :-1, :]) ** 2).sum()
    w_tv = ((xt[:, :, :, 1:] - xt[:, :, :, :-1]) ** 2).sum()
    ref = 2 * (h_tv / ((h - 1) * w) + w_tv / (h * (w - 1))) / 2
    out = float(tv_loss(jnp.asarray(x)))
    np.testing.assert_allclose(out, float(ref), rtol=1e-5)


def test_rgb2ycbcr_scrambled_matches_torch(rng):
    """The reference flattens the NCHW buffer into consecutive triplets
    before the 3x3 matmul (loss.py:180-188). Verify bug-for-bug parity."""
    x = rng.random((1, 4, 6, 3)).astype(np.float32)
    xt = nchw(x)
    mat = torch.tensor(
        [[0.257, -0.148, 0.439], [0.564, -0.291, -0.368], [0.098, 0.439, -0.071]]
    )
    bias = torch.tensor([16.0 / 255.0, 128.0 / 255.0, 128.0 / 255.0])
    ref = (xt.contiguous().view(-1, 3).mm(mat) + bias).view(1, 3, 4, 6)
    out = np.asarray(_rgb2ycbcr_scrambled(jnp.asarray(x))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref.numpy(), atol=1e-6)


def test_smooth_loss_matches_torch_reference_math(rng):
    """Oracle: all 24 shifted-window terms evaluated with torch ops."""
    inp = rng.random((1, 8, 10, 3)).astype(np.float32)
    out = rng.random((1, 8, 10, 3)).astype(np.float32)

    it = nchw(inp)
    ot = nchw(out)
    mat = torch.tensor(
        [[0.257, -0.148, 0.439], [0.564, -0.291, -0.368], [0.098, 0.439, -0.071]]
    )
    bias = torch.tensor([16.0 / 255.0, 128.0 / 255.0, 128.0 / 255.0])
    ycc = (it.contiguous().view(-1, 3).mm(mat) + bias).view(1, 3, 8, 10)
    sc = -1.0 / (2 * 10 * 10)

    def sl(t, dy, dx):
        h, w = t.shape[2], t.shape[3]
        return t[
            :, :, max(dy, 0) : h + min(dy, 0), max(dx, 0) : w + min(dx, 0)
        ]

    offsets = [
        (1, 0), (0, 1), (1, 1), (1, -1), (2, 0), (0, 2),
        (2, 1), (2, -1), (1, 2), (1, -2), (2, 2), (2, -2),
    ]
    total = torch.zeros(())
    for dy, dx in offsets:
        a, b = sl(ycc, dy, dx), sl(ycc, -dy, -dx)
        wgt = torch.exp(((a - b) ** 2).sum(dim=1, keepdim=True) * sc)
        oa, ob = sl(ot, dy, dx), sl(ot, -dy, -dx)
        grad = wgt * torch.norm(oa - ob, 1.0, dim=1, keepdim=True)
        total = total + 2 * grad.mean()

    got = float(smooth_loss(jnp.asarray(inp), jnp.asarray(out)))
    np.testing.assert_allclose(got, float(total), rtol=1e-5)


def test_full_loss_finite_and_differentiable(rng):
    variables = init_network_variables(jax.random.PRNGKey(0))
    raft_vars = init_raft_variables(jax.random.PRNGKey(1))
    frame = jnp.asarray(rng.random((1, 48, 64, 3)).astype(np.float32) * 0.2)
    carry = {
        "last_H3": jnp.zeros_like(frame),
        "last_s3": jnp.zeros_like(frame),
    }

    def loss_fn(params):
        v = {"params": params, "batch_stats": variables["batch_stats"]}
        outs, _, _ = forward_train(
            v, raft_vars, frame, carry, jnp.asarray(True),
            of_scale=2, raft_iters=2,
        )
        return zero_tig_loss(frame, outs)

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss)) and float(loss) > 0
    # gradient must reach all three trainable submodules
    for mod in ["enhance", "denoise_1", "denoise_2"]:
        gnorm = jax.tree_util.tree_reduce(
            lambda a, x: a + float(jnp.sum(jnp.abs(x))), grads[mod], 0.0
        )
        assert gnorm > 0, f"no gradient into {mod}"
    # frozen RAFT must receive no gradient: raft_vars is not an argument of
    # loss_fn at all (structural guarantee)


def test_wb_variant_differs(rng):
    variables = init_network_variables(jax.random.PRNGKey(0))
    raft_vars = init_raft_variables(jax.random.PRNGKey(1))
    frame = jnp.asarray(rng.random((1, 48, 64, 3)).astype(np.float32) * 0.2)
    carry = {"last_H3": jnp.zeros_like(frame), "last_s3": jnp.zeros_like(frame)}
    outs, _, _ = forward_train(
        variables, raft_vars, frame, carry, jnp.asarray(True),
        of_scale=2, raft_iters=2,
    )
    l_rgb = float(zero_tig_loss(frame, outs, is_wb=False))
    l_wb = float(zero_tig_loss(frame, outs, is_wb=True))
    assert l_rgb != l_wb
