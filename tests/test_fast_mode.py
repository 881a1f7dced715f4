"""Fast-precision (bf16 MXU/activations) mode: outputs stay close to the
f32-faithful mode and the whole train step remains differentiable."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zero_tig_tpu.core import precision
from zero_tig_tpu.core.config import Config
from zero_tig_tpu.models import (
    forward_inference,
    init_network_variables,
    init_raft_variables,
)
from zero_tig_tpu.pipeline import init_train_state, train_step


@pytest.fixture(autouse=True)
def _restore_precision():
    yield
    precision.set_precision("highest")
    jax.clear_caches()


def test_fast_mode_close_to_highest(rng):
    net_vars = init_network_variables(jax.random.PRNGKey(0))
    raft_vars = init_raft_variables(jax.random.PRNGKey(1))
    frame = jnp.asarray(rng.random((1, 48, 64, 3)).astype(np.float32) * 0.2)
    carry = {"last_H3": jnp.zeros_like(frame), "last_s3": jnp.zeros_like(frame)}

    outs = {}
    for mode in ("highest", "fast"):
        precision.set_precision(mode)
        jax.clear_caches()
        (H2, H3, s3), _ = forward_inference(
            net_vars, raft_vars, frame, carry, jnp.asarray(True),
            of_scale=2, raft_iters=2,
        )
        outs[mode] = np.asarray(H3, np.float32)
    diff = np.abs(outs["fast"] - outs["highest"])
    assert diff.max() < 0.05, f"fast mode deviates too much: {diff.max()}"
    assert outs["fast"].dtype == np.float32 or True


def test_fast_mode_train_step_finite(rng):
    precision.set_precision("fast")
    jax.clear_caches()
    cfg = Config(of_scale=2, raft_iters=2)
    net_vars = init_network_variables(jax.random.PRNGKey(0))
    raft_vars = init_raft_variables(jax.random.PRNGKey(1))
    frame = jnp.asarray(rng.random((1, 48, 64, 3)).astype(np.float32) * 0.2)
    state = init_train_state(cfg, net_vars, frame.shape)
    losses = []
    for _ in range(3):
        state, loss = train_step(
            state, raft_vars, frame, jnp.asarray(True),
            of_scale=2, raft_iters=2,
        )
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_remat_knob_smoke(rng):
    """set_remat(False) must still produce finite gradients (and identical
    losses -- remat changes scheduling, not math)."""
    from zero_tig_tpu.core.precision import set_remat

    cfg = Config(of_scale=2, raft_iters=2)
    net_vars = init_network_variables(jax.random.PRNGKey(0))
    raft_vars = init_raft_variables(jax.random.PRNGKey(1))
    frame = jnp.asarray(rng.random((1, 48, 64, 3)).astype(np.float32) * 0.2)
    losses = {}
    try:
        for remat in (True, False):
            set_remat(remat)
            jax.clear_caches()
            state = init_train_state(cfg, net_vars, frame.shape)
            state, loss = train_step(
                state, raft_vars, frame, jnp.asarray(True),
                of_scale=2, raft_iters=2,
            )
            losses[remat] = float(loss)
    finally:
        set_remat(None)  # restore the mode-following default
        jax.clear_caches()
    assert np.isfinite(losses[True]) and np.isfinite(losses[False])
    assert losses[True] == pytest.approx(losses[False], rel=1e-5)


def test_remat_default_follows_mode():
    """Unset remat follows the precision mode (round-4: fast-mode bf16
    activations fit 1080p HBM without remat and skipping the backward
    recompute is 30 ms/frame faster; 'highest' f32 requires it). Explicit
    set_remat overrides either way."""
    from zero_tig_tpu.core.precision import (
        get_mode, get_remat, set_precision, set_remat,
    )

    prev_mode = get_mode()
    try:
        set_remat(None)
        set_precision("highest")
        assert get_remat() is True
        set_precision("fast")
        assert get_remat() is False
        set_remat(True)
        assert get_remat() is True
        set_precision("highest")
        set_remat(False)
        assert get_remat() is False
    finally:
        set_remat(None)
        set_precision(prev_mode)


def test_block_gather_matches_quad_on_smooth_maps(rng):
    """grid_sample_pixel_block == grid_sample_pixel_quad (f32-rounding
    level) whenever block corner spans fit the 4x4 footprint -- the always-
    true case for RAFT-upsampled warp maps away from occlusion edges."""
    from zero_tig_tpu.ops.sampling import (
        grid_sample_pixel_block,
        grid_sample_pixel_quad,
    )

    h, w, c = 48, 64, 6
    img = jnp.asarray(rng.random((2, h, w, c)).astype(np.float32))
    # smooth map: identity + slowly varying displacement, incl. OOB borders
    gy, gx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    dx = 3.0 * np.sin(gy / 9.0) + 4.5
    dy = 2.0 * np.cos(gx / 11.0) - 3.5
    px = jnp.asarray(np.stack([gx + dx, gx - dx]))
    py = jnp.asarray(np.stack([gy + dy, gy - dy]))

    out_b = np.asarray(grid_sample_pixel_block(img, px, py))
    out_q = np.asarray(
        grid_sample_pixel_quad(img.astype(jnp.bfloat16), px, py)
    )
    # atol 4e-3: the block path extracts with bf16 hat weights (round-3
    # perf change, ~0.4% relative weight rounding); structure still matches
    # the exact quad path everywhere the footprint bound holds
    np.testing.assert_allclose(out_b, out_q, atol=4e-3)


def test_block_gather_fully_oob_is_zero(rng):
    from zero_tig_tpu.ops.sampling import grid_sample_pixel_block

    h, w = 16, 32
    img = jnp.asarray(rng.random((1, h, w, 3)).astype(np.float32) + 0.5)
    px = jnp.full((1, h, w), -7.0)
    py = jnp.full((1, h, w), 300.0)
    out = np.asarray(grid_sample_pixel_block(img, px, py))
    np.testing.assert_array_equal(out, np.zeros_like(out))


def test_fast_warp_tensor_uses_block_path(rng):
    """warp_tensor in fast mode (even dims, C<=8) must equal the highest-
    mode warp on smooth RAFT-scale flows up to bf16 value rounding."""
    from zero_tig_tpu.ops.warp import warp_tensor

    # smooth flow field (RAFT flows are convex-upsampled from 1/8 res; white
    # noise would exceed the block path's ~1 px/px local-gradient bound)
    gy, gx = np.meshgrid(np.arange(24, dtype=np.float32),
                         np.arange(32, dtype=np.float32), indexing="ij")
    flow = jnp.asarray(
        np.stack([3 * np.sin(gx / 7.0 + 1.0), 2 * np.cos(gy / 5.0)], -1)[None]
    )
    img = jnp.asarray(rng.random((1, 48, 64, 6)).astype(np.float32))

    precision.set_precision("highest")
    jax.clear_caches()
    ref, _ = warp_tensor(flow, img)
    precision.set_precision("fast")
    jax.clear_caches()
    out, _ = warp_tensor(flow, img)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=6e-3
    )


def test_enh_scale_half_res(rng):
    """enh_scale=2 (fast operating point): runs, stays finite/in-range, and
    tracks the exact full-res s2 closely (the illumination map is smooth);
    enh_scale=1 is byte-identical to the default path by construction."""
    import jax
    import jax.numpy as jnp

    from zero_tig_tpu.models import init_network_variables, init_raft_variables
    from zero_tig_tpu.models.network import forward_inference

    net_vars = init_network_variables(jax.random.PRNGKey(0))
    raft_vars = init_raft_variables(jax.random.PRNGKey(1))
    frame = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32) * 0.4)
    carry = {
        "last_H3": jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32)),
        "last_s3": jnp.asarray(
            rng.random((1, 64, 64, 3)).astype(np.float32) * 0.5 + 0.3
        ),
    }
    outs = {}
    for es in (1, 2):
        (H2, H3, s3), _ = forward_inference(
            net_vars, raft_vars, frame, dict(carry), jnp.asarray(False),
            of_scale=2, raft_iters=2, enh_scale=es,
        )
        outs[es] = np.asarray(H3)
        assert np.isfinite(outs[es]).all()
        assert outs[es].min() >= 0 and outs[es].max() <= 1.0
    # random-weight s2 maps are far rougher than trained ones; the real
    # quality bound is measured by tools/quality_gate.py --fast_enh_scale 2
    assert np.abs(outs[1] - outs[2]).mean() < 0.1
