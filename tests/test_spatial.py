"""Spatial gradient accumulation: exact equivalence to the monolithic step.

train_step_spatial exists so f32-faithful FULL-RES training fits one chip
(BASELINE.md); these tests certify it computes the SAME optimization
trajectory as pipeline.train_step (bn_train=False) -- same losses, same
parameters, same recurrent carry -- across consecutive frames, including
a geometry where band slices genuinely crop (slice_h < H).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zero_tig_tpu.core.config import Config
from zero_tig_tpu.models import init_network_variables, init_raft_variables
from zero_tig_tpu.pipeline import (
    init_train_state,
    train_step,
    train_step_spatial,
)


@pytest.mark.parametrize(
    "bands,halo,h,bn_train",
    [(2, 24, 128, False), (4, 24, 128, False), (2, 24, 128, True)],
)
def test_spatial_step_matches_monolithic(rng, bands, halo, h, bn_train):
    """bn_train=True exercises the exact two-pass banded BatchNorm (the
    reference's epoch-0 schedule): full-frame batch stats from banded
    sums, stats-as-inputs band grads, and the back-substituted
    stats->params chain adjoints. Same losses, params, running stats, and
    carry as the monolithic step."""
    w = 64
    cfg = Config(of_scale=2, raft_iters=2)
    net_vars = init_network_variables(jax.random.PRNGKey(0))
    raft_vars = init_raft_variables(jax.random.PRNGKey(1))

    frames = [
        jnp.asarray(rng.random((1, h, w, 3)).astype(np.float32) * 0.3)
        for _ in range(2)
    ]

    state_m = init_train_state(cfg, net_vars, frames[0].shape)
    state_s = init_train_state(cfg, net_vars, frames[0].shape)

    if bn_train:
        # sharp signal: banded GRADIENTS == monolithic jax.grad (post-Adam
        # parameters amplify f32 noise on near-zero-grad channels into
        # +/-lr-sized update differences, so they are compared loosely)
        from zero_tig_tpu.losses.zero_tig_loss import zero_tig_loss
        from zero_tig_tpu.models.network import forward_train
        from zero_tig_tpu.pipeline.spatial import spatial_loss_and_grads

        frame0 = frames[0]
        carry0 = dict(state_m.carry)

        def mono_loss(p):
            outputs, _, _ = forward_train(
                {"params": p, "batch_stats": state_m.batch_stats},
                raft_vars, frame0, carry0, jnp.asarray(True),
                of_scale=2, raft_iters=2, bn_train=True,
            )
            return zero_tig_loss(frame0, outputs)

        g_mono = jax.grad(mono_loss)(state_m.params)
        _, g_band, _, _ = spatial_loss_and_grads(
            state_s, raft_vars, frame0, jnp.asarray(True),
            bands=bands, halo=halo, of_scale=2, raft_iters=2, bn_train=True,
        )
        for (path, gm), (_, gb) in zip(
            jax.tree_util.tree_flatten_with_path(g_mono)[0],
            jax.tree_util.tree_flatten_with_path(g_band)[0],
        ):
            key = jax.tree_util.keystr(path)
            if key == "['enhance']['block']['conv']['bias']":
                # analytically ZERO under train-mode BN (the batch mean
                # absorbs a bias shift, (x - mean) is invariant); both
                # methods produce only f32 cancellation noise here
                assert np.abs(np.asarray(gm)).max() < 1e-2, key
                assert np.abs(np.asarray(gb)).max() < 1e-2, key
                continue
            scale = max(float(np.abs(np.asarray(gm)).max()), 1e-3)
            np.testing.assert_allclose(
                np.asarray(gb), np.asarray(gm), atol=2e-5 * scale,
                rtol=1e-4,
                err_msg=key,
            )

    for i, frame in enumerate(frames):
        new = jnp.asarray(i == 0)
        state_m, loss_m = train_step(
            state_m, raft_vars, frame, new,
            of_scale=2, raft_iters=2, bn_train=bn_train,
        )
        state_s, loss_s = train_step_spatial(
            state_s, raft_vars, frame, new,
            bands=bands, halo=halo, of_scale=2, raft_iters=2,
            bn_train=bn_train,
        )
        # rel tightened 2e-5 -> 3e-6 after the full-frame-phase ycc fix
        # (the scrambled smooth term previously differed ~3e-5 when
        # W*(full_h-slice_h) % 3 != 0, as this w=64 geometry does)
        assert float(loss_s) == pytest.approx(float(loss_m), rel=3e-6), i

    # bn_train=True: near-zero-grad channels take +/-lr Adam updates whose
    # sign follows f32 summation noise -> looser param tolerance there
    p_atol = 5e-4 if bn_train else 2e-6
    for pm, ps in zip(
        jax.tree_util.tree_leaves(state_m.params),
        jax.tree_util.tree_leaves(state_s.params),
    ):
        np.testing.assert_allclose(
            np.asarray(ps), np.asarray(pm), atol=p_atol, rtol=1e-4
        )
    # bn_train=True: step-2 batch stats inherit the +/-lr Adam-noise param
    # drift from step 1 (the per-frame stats machinery itself agrees to
    # ~1e-7; verified directly above via the gradient comparison)
    s_atol, s_rtol = (2e-4, 5e-3) if bn_train else (1e-6, 1e-5)
    for sm, ss in zip(
        jax.tree_util.tree_leaves(state_m.batch_stats),
        jax.tree_util.tree_leaves(state_s.batch_stats),
    ):
        np.testing.assert_allclose(
            np.asarray(ss), np.asarray(sm), atol=s_atol, rtol=s_rtol
        )
    np.testing.assert_allclose(
        np.asarray(state_s.carry["last_H3"]),
        np.asarray(state_m.carry["last_H3"]),
        atol=2e-5 if bn_train else 1e-6,  # step-2 carry inherits param drift
    )


@pytest.mark.parametrize("bn_train", [False, True])
def test_fused_spatial_matches_per_band(rng, bn_train):
    """fused=True (one dispatched program: in-graph band scan + BN passes
    + optimizer) computes the same step as the per-band dispatch form --
    same arithmetic in the same band order, so agreement is at f32
    compilation-difference level, not algorithm level."""
    h, w = 96, 64
    cfg = Config(of_scale=2, raft_iters=2)
    net_vars = init_network_variables(jax.random.PRNGKey(0))
    raft_vars = init_raft_variables(jax.random.PRNGKey(1))
    frame = jnp.asarray(rng.random((1, h, w, 3)).astype(np.float32) * 0.3)

    state_f = init_train_state(cfg, net_vars, frame.shape)
    state_p = init_train_state(cfg, net_vars, frame.shape)
    state_f, loss_f = train_step_spatial(
        state_f, raft_vars, frame, jnp.asarray(True),
        bands=2, halo=16, of_scale=2, raft_iters=2, bn_train=bn_train,
        fused=True,
    )
    state_p, loss_p = train_step_spatial(
        state_p, raft_vars, frame, jnp.asarray(True),
        bands=2, halo=16, of_scale=2, raft_iters=2, bn_train=bn_train,
        fused=False,
    )
    assert float(loss_f) == pytest.approx(float(loss_p), rel=1e-6)
    # bn_train=True: the enhance-block bias gradients are analytically
    # zero, so Adam turns f32 compilation-difference noise (scan body vs
    # standalone jit) into +/-lr-sized updates with noise-chosen sign --
    # the same amplification the monolithic comparison above documents
    p_atol = 2e-4 if bn_train else 5e-6
    for a, b in zip(
        jax.tree_util.tree_leaves(state_f.params),
        jax.tree_util.tree_leaves(state_p.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=p_atol, rtol=1e-5
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(state_f.batch_stats),
        jax.tree_util.tree_leaves(state_p.batch_stats),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5
        )
    np.testing.assert_allclose(
        np.asarray(state_f.carry["last_H3"]),
        np.asarray(state_p.carry["last_H3"]), atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(state_f.carry["last_s3"]),
        np.asarray(state_p.carry["last_s3"]), atol=1e-6,
    )


def test_train_cli_spatial_bands(tmp_path):
    """--spatial_bands 2 through the train CLI produces the reference
    artifact layout on the synthetic fixture."""
    import glob
    import os

    from zero_tig_tpu.cli.train import run_training
    from zero_tig_tpu.data import make_rlv_fixture

    root = str(tmp_path / "rlv")
    make_rlv_fixture(root, frames_per_scene=2, size=(64, 48))
    cfg = Config(
        lowlight_images_path=root, save=str(tmp_path / "exp"), dataset="RLV",
        frame_width=64, frame_height=48, of_scale=2, raft_iters=2, epochs=1,
        spatial_bands=2, spatial_halo=12,
    )
    run_dir = run_training(cfg)
    assert glob.glob(os.path.join(run_dir, "model_epochs", "weights_0.*"))
    with open(os.path.join(run_dir, "log.txt")) as f:
        assert f.read().count("train-epoch 000 ") >= 4
