"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zero_tig_tpu.parallel import (
    flag_sharding,
    frame_sharding,
    make_mesh,
    shard_params,
)


def test_mesh_construction():
    assert len(jax.devices()) == 8
    mesh = make_mesh(4, 2)
    assert mesh.shape == {"data": 4, "spatial": 2}
    with pytest.raises(ValueError):
        make_mesh(16, 1)


def test_dryrun_multichip_entrypoint():
    """The driver-facing dry run: full sharded train step on 8 devices."""
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_scene_parallel_matches_single_device(rng):
    """DP over scenes must give the same loss as unsharded execution."""
    from zero_tig_tpu.core.config import Config
    from zero_tig_tpu.models import (
        init_network_variables,
        init_raft_variables,
    )
    from zero_tig_tpu.pipeline import init_train_state, train_step

    cfg = Config(of_scale=2, raft_iters=2)
    net_vars = init_network_variables(jax.random.PRNGKey(0))
    raft_vars = init_raft_variables(jax.random.PRNGKey(1))
    frames = jnp.asarray(rng.random((4, 48, 64, 3)).astype(np.float32) * 0.2)
    flags = jnp.zeros((4,), jnp.bool_)

    state = init_train_state(cfg, net_vars, frames.shape)
    _, loss_single = train_step(
        state, raft_vars, frames, flags, of_scale=2, raft_iters=2
    )

    mesh = make_mesh(4, 2)
    fs = frame_sharding(mesh)
    state_sh = state._replace(
        params=shard_params(mesh, state.params),
        batch_stats=shard_params(mesh, state.batch_stats),
        opt_state=shard_params(mesh, state.opt_state),
        carry=jax.device_put(state.carry, fs),
    )
    with jax.sharding.set_mesh(mesh):
        _, loss_sharded = train_step(
            state_sh,
            shard_params(mesh, raft_vars),
            jax.device_put(frames, fs),
            jax.device_put(flags, flag_sharding(mesh)),
            of_scale=2,
            raft_iters=2,
        )
    np.testing.assert_allclose(
        float(loss_single), float(loss_sharded), rtol=2e-4
    )
