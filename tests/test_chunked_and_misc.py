"""Chunked scan steps (must equal per-frame loops) + misc util parity."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zero_tig_tpu.core.config import Config
from zero_tig_tpu.models import (
    init_network_variables,
    init_raft_variables,
)
from zero_tig_tpu.pipeline import (
    init_train_state,
    predict_chunk,
    predict_step,
    train_chunk,
    train_step,
)


@pytest.fixture(scope="module")
def setup(rng=np.random.default_rng(2)):
    net_vars = init_network_variables(jax.random.PRNGKey(0))
    raft_vars = init_raft_variables(jax.random.PRNGKey(1))
    frames = jnp.asarray(
        rng.random((3, 1, 48, 64, 3)).astype(np.float32) * 0.2
    )
    flags = jnp.asarray([True, False, False])
    return net_vars, raft_vars, frames, flags


def test_predict_chunk_matches_loop(setup):
    net_vars, raft_vars, frames, flags = setup
    zeros = jnp.zeros_like(frames[0])
    carry = {"last_H3": zeros, "last_s3": zeros}
    (h2s, h3s, s3s), chunk_carry = predict_chunk(
        net_vars, raft_vars, frames, carry, flags,
        of_scale=2, raft_iters=2,
    )
    carry2 = {"last_H3": zeros, "last_s3": zeros}
    for k in range(3):
        (H2, H3, s3), carry2 = predict_step(
            net_vars, raft_vars, frames[k], carry2, flags[k],
            of_scale=2, raft_iters=2,
        )
        np.testing.assert_allclose(
            np.asarray(h3s[k]), np.asarray(H3), atol=1e-6
        )
    np.testing.assert_allclose(
        np.asarray(chunk_carry["last_H3"]),
        np.asarray(carry2["last_H3"]),
        atol=1e-6,
    )


def test_train_chunk_matches_loop(setup):
    net_vars, raft_vars, frames, flags = setup
    cfg = Config(of_scale=2, raft_iters=2)
    state_a = init_train_state(cfg, net_vars, frames[0].shape)
    state_b = init_train_state(cfg, net_vars, frames[0].shape)

    state_a, losses = train_chunk(
        state_a, raft_vars, frames, flags, of_scale=2, raft_iters=2
    )
    loop_losses = []
    for k in range(3):
        state_b, loss = train_step(
            state_b, raft_vars, frames[k], flags[k],
            of_scale=2, raft_iters=2,
        )
        loop_losses.append(float(loss))
    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(loop_losses), rtol=1e-5
    )
    # final params identical up to float scheduling noise (the scanned and
    # unscanned programs reduce in different orders; Adam steps are ~1e-4)
    pa = jax.tree_util.tree_leaves(state_a.params)
    pb = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_count_parameters(setup):
    from zero_tig_tpu.utils import count_parameters_in_mb

    net_vars, raft_vars, _, _ = setup
    total = count_parameters_in_mb(
        {"net": net_vars["params"], "raft": raft_vars["params"]}
    )
    assert 5.2 < total < 5.6  # ~5.35M, matches the reference's model size


def test_drop_path():
    from zero_tig_tpu.utils import drop_path

    x = jnp.ones((8, 4, 4, 2))
    out = drop_path(x, 0.5, jax.random.PRNGKey(0))
    vals = np.unique(np.asarray(out))
    assert set(np.round(vals, 4)).issubset({0.0, 2.0})
    np.testing.assert_array_equal(np.asarray(drop_path(x, 0.0, None)), x)


def test_show_pic_and_viz(tmp_path, rng):
    from zero_tig_tpu.utils import show_pic, viz_flow_overlay

    pics = [rng.random((1, 8, 8, 3)).astype(np.float32) for _ in range(3)]
    p = str(tmp_path / "sheet.png")
    show_pic(pics, ["a", "b", "c"], p)
    assert os.path.exists(p)

    viz_flow_overlay(
        rng.random((1, 8, 8, 3)).astype(np.float32),
        rng.standard_normal((1, 8, 8, 2)).astype(np.float32),
        str(tmp_path / "viz.png"),
    )
    assert os.path.exists(tmp_path / "viz.png")


def test_vmaf_hook_graceful():
    from zero_tig_tpu.eval import score_sequences, vmaf_available

    if not vmaf_available():
        assert score_sequences("/nonexistent", "/nonexistent") is None


def test_sintel_submission(tmp_path, rng):
    import cv2

    from zero_tig_tpu.flowtools import get_flow_model, write_sintel_submission
    from zero_tig_tpu.utils.flow_io import read_flo

    model = get_flow_model("raft")
    variables = model.init_fn(jax.random.PRNGKey(0))
    scene = tmp_path / "frames" / "alley_1"
    scene.mkdir(parents=True)
    for i in range(3):
        img = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(scene / f"frame_{i:04d}.png"), img)
    n = write_sintel_submission(
        "raft", variables, str(tmp_path / "frames"), str(tmp_path / "out"),
        iters=2,
    )
    assert n == 2
    flo = read_flo(str(tmp_path / "out" / "alley_1" / "frame_0000.flo"))
    assert flo.shape == (48, 64, 2)


def test_forward_interpolate():
    from zero_tig_tpu.utils import forward_interpolate

    # constant shift (+2, 0): forward splat keeps the constant field
    flow = np.zeros((2, 10, 12), np.float32)
    flow[0] = 2.0
    out = forward_interpolate(flow)
    assert out.shape == (2, 10, 12)
    np.testing.assert_allclose(out[0, 2:-2, 4:-4], 2.0, atol=1e-6)
    np.testing.assert_allclose(out[1], 0.0, atol=1e-6)


def test_train_step_hparams_are_dynamic():
    """lr/grad_clip/weight_decay are traced, not static: changing them must
    NOT recompile (a hyperparameter sweep would otherwise pay a full 1080p
    compile per value) and must change the update."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from zero_tig_tpu.core.config import Config
    from zero_tig_tpu.models import init_network_variables, init_raft_variables
    from zero_tig_tpu.pipeline import init_train_state, train_step

    cfg = Config(of_scale=2, raft_iters=1)
    nv = init_network_variables(jax.random.PRNGKey(0))
    rv = init_raft_variables(jax.random.PRNGKey(1))
    st = init_train_state(cfg, nv, (1, 32, 32, 3))
    f = jnp.zeros((1, 32, 32, 3)) + 0.2
    new = jnp.asarray(False)

    kw = dict(of_scale=2, raft_iters=1)
    before = train_step._cache_size()
    st1, _ = train_step(st, rv, f, new, lr=1e-4, grad_clip=5.0,
                        weight_decay=3e-4, **kw)
    after_first = train_step._cache_size()
    st2, _ = train_step(st, rv, f, new, lr=5e-4, grad_clip=2.0,
                        weight_decay=1e-3, **kw)
    assert train_step._cache_size() == after_first, "hparam change recompiled"
    d1 = np.asarray(jax.tree_util.tree_leaves(st1.params)[0])
    d2 = np.asarray(jax.tree_util.tree_leaves(st2.params)[0])
    assert not np.allclose(d1, d2), "hyperparameters ignored"


def test_predict_chunk_emit_u8_matches_host_quantization(setup):
    """emit="u8" == host-side save_images_uint8 of the f32 emission,
    bit for bit (same floats, same formula)."""
    net_vars, raft_vars, frames, flags = setup
    from zero_tig_tpu.cli.common import save_images_uint8

    zeros = jnp.zeros_like(frames[0])
    carry = {"last_H3": zeros, "last_s3": zeros}

    (h2s, h3s, _s3s), _ = predict_chunk(
        net_vars, raft_vars, frames, dict(carry), flags,
        of_scale=2, raft_iters=2,
    )
    (h2u, h3u), _ = predict_chunk(
        net_vars, raft_vars, frames, dict(carry), flags,
        of_scale=2, raft_iters=2, emit="u8",
    )
    assert np.asarray(h3u).dtype == np.uint8
    for f32, u8 in ((h2s, h2u), (h3s, h3u)):
        np.testing.assert_array_equal(
            np.asarray(u8), save_images_uint8(np.asarray(f32))
        )
