"""Packed-layout fast TRAINING forward (models/network._forward_train_xpack,
precision.set_xpack_train): equivalence with the unpacked fast train path.

The packed path's products are identical to the unpacked fast path's up to
bf16 rounding of the inter-stack glue (which the unpacked path promotes to
f32), so all comparisons here are tolerance-based at bf16 scale: forward
outputs, train-BN batch statistics, the loss value, the gradient direction,
and a short optimizer trajectory.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zero_tig_tpu.core import precision
from zero_tig_tpu.core.config import Config
from zero_tig_tpu.losses.zero_tig_loss import zero_tig_loss
from zero_tig_tpu.models import init_network_variables, init_raft_variables
from zero_tig_tpu.models.network import forward_train
from zero_tig_tpu.pipeline import init_train_state, train_step

H, W = 16, 24  # W % 4 == 0: the packed train path dispatches


@pytest.fixture
def setup():
    precision.set_precision("fast")
    jax.clear_caches()
    net_vars = init_network_variables(jax.random.PRNGKey(0))
    raft_vars = init_raft_variables(jax.random.PRNGKey(1))
    frame = jax.random.uniform(jax.random.PRNGKey(2), (1, H, W, 3)) * 0.3
    carry = {
        "last_H3": jax.random.uniform(jax.random.PRNGKey(3), (1, H, W, 3)),
        "last_s3": jnp.full((1, H, W, 3), 0.5, jnp.float32),
    }
    yield net_vars, raft_vars, frame, carry
    precision.set_precision("highest")
    precision.set_xpack_train(None)
    jax.clear_caches()


def _run_forward(net_vars, raft_vars, frame, carry, packed, bn_train=True):
    precision.set_xpack_train(packed)
    jax.clear_caches()
    outs, new_bs, new_carry = forward_train(
        net_vars, raft_vars, frame, carry, jnp.asarray(False),
        of_scale=2, raft_iters=2, bn_train=bn_train,
    )
    return outs, new_bs, new_carry


@pytest.mark.parametrize("bn_train", [True, False])
def test_forward_outputs_match_plain_fast(setup, bn_train):
    net_vars, raft_vars, frame, carry = setup
    o_plain, bs_plain, c_plain = _run_forward(
        net_vars, raft_vars, frame, carry, False, bn_train
    )
    o_pack, bs_pack, c_pack = _run_forward(
        net_vars, raft_vars, frame, carry, True, bn_train
    )
    # continuous outputs: bf16-glue rounding only
    # (H2_blur/H3_blur are None in fast mode -- the wminor loss tail
    # supplies color_blur_diff instead, compared below)
    for name in (
        "L_pred1", "L_pred2", "L2", "s2", "s21", "s22", "H2", "H11", "H12",
        "H13", "s13", "H14", "s14", "H3", "s3", "color_blur_diff",
    ):
        a = np.asarray(getattr(o_plain, name), np.float32)
        b = np.asarray(getattr(o_pack, name), np.float32)
        np.testing.assert_allclose(a, b, atol=3e-2, err_msg=name)
    # binary texture masks: identical except threshold-adjacent pixels
    for name in ("L_pred1_L_pred2_diff", "H3_denoised1_H3_denoised2_diff"):
        a = np.asarray(getattr(o_plain, name))
        b = np.asarray(getattr(o_pack, name))
        assert np.mean(a != b) < 0.05, name
    # train-BN running stats (packed-lane batch statistics)
    a = jax.tree_util.tree_leaves(bs_plain)
    b = jax.tree_util.tree_leaves(bs_pack)
    for x, y in zip(a, b):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=2e-2, rtol=2e-2
        )
    for k in ("last_H3", "last_s3"):
        np.testing.assert_allclose(
            np.asarray(c_plain[k]), np.asarray(c_pack[k]), atol=3e-2
        )


def test_loss_and_grad_match_plain_fast(setup):
    net_vars, raft_vars, frame, carry = setup

    def loss_for(packed):
        precision.set_xpack_train(packed)
        jax.clear_caches()

        def loss_fn(params):
            variables = {
                "params": params, "batch_stats": net_vars["batch_stats"]
            }
            outs, _, _ = forward_train(
                variables, raft_vars, frame, carry, jnp.asarray(False),
                of_scale=2, raft_iters=2, bn_train=True,
            )
            return zero_tig_loss(frame, outs)

        return jax.value_and_grad(loss_fn)(net_vars["params"])

    loss_p, grad_p = loss_for(False)
    loss_x, grad_x = loss_for(True)
    assert abs(float(loss_p) - float(loss_x)) / abs(float(loss_p)) < 2e-2
    flat_p = jnp.concatenate(
        [g.ravel() for g in jax.tree_util.tree_leaves(grad_p)]
    )
    flat_x = jnp.concatenate(
        [g.ravel() for g in jax.tree_util.tree_leaves(grad_x)]
    )
    cos = float(
        jnp.vdot(flat_p, flat_x)
        / (jnp.linalg.norm(flat_p) * jnp.linalg.norm(flat_x))
    )
    assert cos > 0.98, cos


@pytest.mark.parametrize("packed", [True, False])
def test_split_flow_step_matches_monolithic(setup, packed):
    """train_step_split (flow+warp as its own dispatch) must reproduce the
    single-program train_step exactly: the seam is the reference's
    torch.no_grad flow block, so no gradient crosses it and the update
    phase consumes identical warped tensors."""
    from zero_tig_tpu.pipeline import train_step_split

    net_vars, raft_vars, frame, carry = setup
    precision.set_xpack_train(packed)
    jax.clear_caches()
    cfg = Config(of_scale=2, raft_iters=2)
    s1 = init_train_state(cfg, net_vars, frame.shape)._replace(
        carry=dict(carry)
    )
    s2 = init_train_state(cfg, net_vars, frame.shape)._replace(
        carry=dict(carry)
    )
    s1, l1 = train_step(
        s1, raft_vars, frame, jnp.asarray(False),
        of_scale=2, raft_iters=2, bn_train=True,
    )
    s2, l2 = train_step_split(
        s2, raft_vars, frame, jnp.asarray(False),
        of_scale=2, raft_iters=2, bn_train=True,
    )
    assert float(l1) == pytest.approx(float(l2), rel=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s2.params),
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(s2.carry["last_H3"]), np.asarray(s1.carry["last_H3"]),
        atol=1e-6,
    )


def test_xpack_train_width_sharded_matches_single_device(setup):
    """The packed fast train step under width ('spatial') sharding must be
    a pure layout decision: the pack2 (W -> W/2, 2C) reshapes, the packed
    convs' halo exchanges, and the packed-lane train-BN reductions all
    cross the shard boundary. Mirrors test_parallel's width-sharding
    equivalence, on the fast/packed operating point."""
    from zero_tig_tpu.losses.zero_tig_loss import zero_tig_loss
    from zero_tig_tpu.parallel import frame_sharding, make_mesh, shard_params

    net_vars, raft_vars, frame, carry = setup
    precision.set_xpack_train(True)
    jax.clear_caches()

    def loss_and_grad(params, frame_, carry_):
        def loss_fn(p):
            variables = {
                "params": p, "batch_stats": net_vars["batch_stats"]
            }
            outs, _, new_carry = forward_train(
                variables, raft_vars, frame_, carry_, jnp.asarray(False),
                of_scale=2, raft_iters=2, bn_train=True,
            )
            return zero_tig_loss(frame_, outs), new_carry

        return jax.value_and_grad(loss_fn, has_aux=True)(params)

    (loss_1, carry_1), grad_1 = loss_and_grad(
        net_vars["params"], frame, carry
    )

    mesh = make_mesh(1, 2)
    fs = frame_sharding(mesh)
    with jax.sharding.set_mesh(mesh):
        (loss_n, carry_n), grad_n = loss_and_grad(
            shard_params(mesh, net_vars["params"]),
            jax.device_put(frame, fs),
            jax.device_put(carry, fs),
        )

    assert float(loss_1) == pytest.approx(float(loss_n), rel=2e-3)
    for k in ("last_H3", "last_s3"):
        np.testing.assert_allclose(
            np.asarray(carry_n[k]), np.asarray(carry_1[k]), atol=2e-2
        )
    flat_1 = jnp.concatenate(
        [g.ravel() for g in jax.tree_util.tree_leaves(grad_1)]
    )
    flat_n = jnp.concatenate(
        [g.ravel() for g in jax.tree_util.tree_leaves(grad_n)]
    )
    cos = float(
        jnp.vdot(flat_1, flat_n)
        / (jnp.linalg.norm(flat_1) * jnp.linalg.norm(flat_n))
    )
    assert cos > 0.999, cos


def test_train_trajectory_matches_plain_fast(setup):
    net_vars, raft_vars, frame, carry = setup
    cfg = Config(of_scale=2, raft_iters=2)

    def run(packed, steps=3):
        precision.set_xpack_train(packed)
        jax.clear_caches()
        state = init_train_state(cfg, net_vars, (1, H, W, 3))
        losses = []
        for i in range(steps):
            state, loss = train_step(
                state, raft_vars, frame + 0.01 * i, jnp.asarray(i == 0),
                of_scale=2, raft_iters=2, bn_train=True,
            )
            losses.append(float(loss))
        return losses, state

    losses_p, state_p = run(False)
    losses_x, state_x = run(True)
    for lp, lx in zip(losses_p, losses_x):
        assert abs(lp - lx) / abs(lp) < 3e-2, (losses_p, losses_x)
    # parameters after 3 Adam steps stay close (same trajectory). Adam's
    # normalized step is ~lr (1e-4) per step with early bias correction,
    # so a bf16-glue grad difference on a near-zero-gradient element can
    # move a parameter by up to ~3*lr*(sign flip) over 3 steps: bound 1e-3.
    for p, x in zip(
        jax.tree_util.tree_leaves(state_p.params),
        jax.tree_util.tree_leaves(state_x.params),
    ):
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(x), atol=1e-3
        )
