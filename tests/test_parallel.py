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


def test_scene_streams_and_batched_records(tmp_path):
    from zero_tig_tpu.data import RLVDataset, make_rlv_fixture
    from zero_tig_tpu.parallel import batched_records, scene_streams

    root = make_rlv_fixture(
        str(tmp_path / "rlv"), scenes=("S01", "S02", "S03", "S04"),
        frames_per_scene=3, size=(32, 24),
    )
    ds = RLVDataset(root, "train", size=(32, 24))
    streams = scene_streams(ds, 2)
    assert len(streams) == 2
    assert sum(len(s) for s in streams) == len(ds)
    # scenes stay contiguous within a stream
    for s in streams:
        assert len(s) % 3 == 0

    batches = list(batched_records(ds, 2))
    assert len(batches) == 6  # 12 frames / 2 streams
    frames, flags, paths = batches[0]
    assert len(paths) == 2
    assert frames.shape == (2, 24, 32, 3)
    assert flags.tolist() == [True, True]  # both streams start fresh
    # scene boundaries flagged inside each stream
    all_flags = np.stack([b[1] for b in batches])
    assert all_flags[:, 0].sum() == 2 and all_flags[:, 1].sum() == 2


def test_train_scenes_spmd_e2e(tmp_path):
    """Full scene-parallel SPMD training on the 8-device virtual mesh."""
    from zero_tig_tpu.core.config import Config
    from zero_tig_tpu.data import RLVDataset, make_rlv_fixture
    from zero_tig_tpu.models import init_raft_variables
    from zero_tig_tpu.parallel import train_scenes_spmd

    root = make_rlv_fixture(
        str(tmp_path / "rlv"), scenes=("S01", "S02", "S03", "S04"),
        frames_per_scene=2, size=(64, 48),
    )
    ds = RLVDataset(root, "train", size=(64, 48))
    cfg = Config(
        frame_width=64, frame_height=48, of_scale=2, raft_iters=2,
        epochs=1, mesh_data=4, mesh_spatial=2,
    )
    raft_vars = init_raft_variables(jax.random.PRNGKey(1))
    logs = []
    state = train_scenes_spmd(
        cfg, ds, raft_vars, log_fn=logs.append
    )
    assert any("mean" in l for l in logs)
    losses = [float(l.split()[-1]) for l in logs if "mean" not in l]
    assert all(np.isfinite(losses))
    assert state.carry["last_H3"].shape == (4, 48, 64, 3)


def test_scene_parallel_inference_matches_single_device(tmp_path):
    """Sharded multi-scene predict == the single-device per-frame loop,
    frame for frame (scenes are embarrassingly parallel; the carry stays
    chip-local). SURVEY section 2.7-1, inference side."""
    from zero_tig_tpu.core.config import Config
    from zero_tig_tpu.data import create_dataset, make_rlv_fixture
    from zero_tig_tpu.models import (
        init_network_variables,
        init_raft_variables,
    )
    from zero_tig_tpu.parallel import make_mesh, predict_scenes_spmd
    from zero_tig_tpu.pipeline import predict_step

    root = str(tmp_path / "rlv")
    make_rlv_fixture(root, frames_per_scene=3, size=(64, 48))
    cfg = Config(
        frame_width=64, frame_height=48, of_scale=2, raft_iters=2,
        mesh_data=2, mesh_spatial=1,
    )
    net_vars = init_network_variables(jax.random.PRNGKey(0))
    raft_vars = init_raft_variables(jax.random.PRNGKey(1))

    # single-device reference: sequential loop, carry reset per scene
    ds = create_dataset("RLV", root, "train", size=(64, 48))
    ref = {}
    carry = None
    for rec in ds:
        frame = jnp.asarray(np.asarray(rec.image, np.float32)[None])
        if carry is None:
            zeros = jnp.zeros_like(frame)
            carry = {"last_H3": zeros, "last_s3": zeros}
        (H2, H3, s3), carry = predict_step(
            net_vars, raft_vars, frame, carry, jnp.asarray(rec.is_new_seq),
            of_scale=2, raft_iters=2,
        )
        ref[rec.path] = np.asarray(H3[0])

    got = {}
    ds2 = create_dataset("RLV", root, "train", size=(64, 48))
    mesh = make_mesh(2, 1)
    n = predict_scenes_spmd(
        cfg, ds2, net_vars, raft_vars,
        lambda p, H2, H3, s3: got.__setitem__(p, H3),
        mesh=mesh,
    )
    assert n == len(ref) == 6
    for p, h3 in ref.items():
        np.testing.assert_allclose(got[p], h3, atol=2e-5, err_msg=p)


def test_spmd_cli_train_and_predict(tmp_path):
    """--mesh_data 2 through the train AND predict CLIs: SPMD training
    produces the reference artifact layout; sharded predict writes one
    PNG pair per frame."""
    import glob
    import os

    from zero_tig_tpu.cli.predict import run_predict
    from zero_tig_tpu.cli.train import run_training
    from zero_tig_tpu.core.config import Config
    from zero_tig_tpu.data import make_rlv_fixture

    root = str(tmp_path / "rlv")
    make_rlv_fixture(root, frames_per_scene=2, size=(64, 48))
    cfg = Config(
        lowlight_images_path=root, save=str(tmp_path / "exp"), dataset="RLV",
        frame_width=64, frame_height=48, of_scale=2, raft_iters=2, epochs=1,
        mesh_data=2,
    )
    run_dir = run_training(cfg)
    weights = glob.glob(os.path.join(run_dir, "model_epochs", "weights_0.pt"))
    assert weights
    assert glob.glob(os.path.join(run_dir, "result", "denoise", "*.png"))

    pcfg = Config(
        lowlight_images_path=root, save=str(tmp_path / "pred"), dataset="RLV",
        model_pretrain=weights[0],
        frame_width=64, frame_height=48, of_scale=2, raft_iters=2,
        mesh_data=2,
    )
    run_predict(pcfg)
    outs = glob.glob(str(tmp_path / "pred" / "**" / "*_denoise.png"),
                     recursive=True)
    assert len(outs) == 4  # 2 scenes x 2 frames


@pytest.mark.parametrize("n_spatial", [2, 4])
def test_width_sharding_matches_single_device(rng, n_spatial):
    """Width sharding ('spatial' axis) must be a pure layout decision:
    predict outputs AND train-step results (loss, updated params) match
    single-device execution. This proves XLA's SPMD halo insertion is
    semantically clean through the shard-boundary-crossing ops: the
    of_scale bilinear resize, RAFT flow (global corr volume), the warp
    gather, and the banded losses. SURVEY section 2.7 item 2."""
    from zero_tig_tpu.core.config import Config
    from zero_tig_tpu.models import (
        init_network_variables,
        init_raft_variables,
    )
    from zero_tig_tpu.pipeline import init_train_state, predict_step, train_step

    net_vars = init_network_variables(jax.random.PRNGKey(0))
    raft_vars = init_raft_variables(jax.random.PRNGKey(1))
    frame = jnp.asarray(rng.random((1, 48, 64, 3)).astype(np.float32) * 0.2)
    prev = jnp.asarray(rng.random((1, 48, 64, 3)).astype(np.float32) * 0.5)
    carry = {"last_H3": prev, "last_s3": prev * 0.8 + 0.1}
    flag = jnp.asarray(False)  # continuation: flow+warp genuinely run

    # ---- single-device reference
    (H2_1, H3_1, s3_1), carry_1 = predict_step(
        net_vars, raft_vars, frame, carry, flag, of_scale=2, raft_iters=2
    )
    cfg = Config(of_scale=2, raft_iters=2)
    state = init_train_state(cfg, net_vars, frame.shape)
    state = state._replace(carry=dict(carry))
    state_1, loss_1 = train_step(
        state, raft_vars, frame, flag, of_scale=2, raft_iters=2
    )

    # ---- width-sharded
    mesh = make_mesh(1, n_spatial)
    fs = frame_sharding(mesh)
    with jax.sharding.set_mesh(mesh):
        (H2_n, H3_n, s3_n), carry_n = predict_step(
            shard_params(mesh, net_vars),
            shard_params(mesh, raft_vars),
            jax.device_put(frame, fs),
            jax.device_put(carry, fs),
            flag,
            of_scale=2,
            raft_iters=2,
        )
        state_sh = state._replace(
            params=shard_params(mesh, state.params),
            batch_stats=shard_params(mesh, state.batch_stats),
            opt_state=shard_params(mesh, state.opt_state),
            carry=jax.device_put(state.carry, fs),
        )
        state_n, loss_n = train_step(
            state_sh, shard_params(mesh, raft_vars),
            jax.device_put(frame, fs), flag, of_scale=2, raft_iters=2,
        )

    np.testing.assert_allclose(np.asarray(H3_n), np.asarray(H3_1), atol=3e-5)
    np.testing.assert_allclose(np.asarray(H2_n), np.asarray(H2_1), atol=3e-5)
    np.testing.assert_allclose(np.asarray(s3_n), np.asarray(s3_1), atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(carry_n["last_H3"]), np.asarray(carry_1["last_H3"]),
        atol=3e-5,
    )
    assert float(loss_1) == pytest.approx(float(loss_n), rel=1e-4)
    # updated params certify the sharded GRADIENTS (Adam's first step is
    # ~lr*sign(g): any halo error flips elements by 2e-4)
    flat_1 = jax.tree_util.tree_leaves_with_path(state_1.params)
    flat_n = dict(jax.tree_util.tree_leaves_with_path(state_n.params))
    for path, v1 in flat_1:
        np.testing.assert_allclose(
            np.asarray(flat_n[path]), np.asarray(v1), atol=2e-5,
            err_msg=str(path),
        )
