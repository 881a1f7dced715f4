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
        set_remat(True)
        jax.clear_caches()
    assert np.isfinite(losses[True]) and np.isfinite(losses[False])
    assert losses[True] == pytest.approx(losses[False], rel=1e-5)
