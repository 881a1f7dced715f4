"""Auxiliary subsystems: flow IO/viz, flow metrics, augmentors, sidecar
benchmark/validate, train-state checkpointing."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_flo_roundtrip(tmp_path, rng):
    from zero_tig_tpu.utils.flow_io import read_flo, write_flo

    flow = rng.standard_normal((12, 17, 2)).astype(np.float32)
    p = str(tmp_path / "a.flo")
    write_flo(p, flow)
    np.testing.assert_array_equal(read_flo(p), flow)


def test_pfm_roundtrip(tmp_path, rng):
    from zero_tig_tpu.utils.flow_io import read_pfm, write_pfm

    img = rng.random((9, 7, 3)).astype(np.float32)
    p = str(tmp_path / "a.pfm")
    write_pfm(p, img)
    np.testing.assert_allclose(read_pfm(p), img, atol=1e-7)


def test_kitti_roundtrip(tmp_path, rng):
    from zero_tig_tpu.utils.flow_io import read_flow_kitti, write_flow_kitti

    flow = (rng.standard_normal((8, 10, 2)) * 10).astype(np.float32)
    p = str(tmp_path / "a.png")
    write_flow_kitti(p, flow)
    back, valid = read_flow_kitti(p)
    np.testing.assert_allclose(back, flow, atol=1 / 64)
    assert valid.min() == 1


def test_flow_viz_shape(rng):
    from zero_tig_tpu.utils.flow_viz import flow_to_image

    img = flow_to_image(rng.standard_normal((6, 8, 2)).astype(np.float32))
    assert img.shape == (6, 8, 3) and img.dtype == np.uint8


def test_flow_metrics_perfect_and_outliers():
    from zero_tig_tpu.flowtools import flow_metrics

    gt = np.ones((10, 10, 2), np.float32) * 10
    m = flow_metrics(gt.copy(), gt)
    assert m["epe"] == 0 and m["fl_all"] == 0 and m["px1"] == 1
    assert m["wauc"] == 100.0
    pred = gt.copy()
    pred[:5] += 20  # epe ~28 > 3px and > 5% of |gt|
    m2 = flow_metrics(pred, gt)
    assert m2["fl_all"] == pytest.approx(50.0)


def test_flow_registry_and_infer(tmp_path, rng):
    import cv2

    from zero_tig_tpu.flowtools import available_models, get_flow_model, infer_pair

    assert "raft" in available_models()
    model = get_flow_model("raft")
    variables = model.init_fn(jax.random.PRNGKey(0))

    d = tmp_path / "frames"
    d.mkdir()
    for i in range(2):
        img = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(d / f"{i:03d}.png"), img)
    out = infer_pair(
        "raft", variables, str(d / "000.png"), str(d / "001.png"),
        iters=2, save_dir=str(tmp_path / "out"),
    )
    assert os.path.exists(tmp_path / "out" / "001.flo")
    assert os.path.exists(tmp_path / "out" / "001_viz.png")


def test_flow_validate_folder(tmp_path, rng):
    import cv2

    from zero_tig_tpu.flowtools import get_flow_model, validate_folder
    from zero_tig_tpu.utils.flow_io import write_flo

    model = get_flow_model("raft")
    variables = model.init_fn(jax.random.PRNGKey(0))
    d = tmp_path / "frames"
    g = tmp_path / "flows"
    d.mkdir()
    g.mkdir()
    for i in range(3):
        img = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(d / f"{i:03d}.png"), img)
    for i in range(2):
        write_flo(str(g / f"{i:03d}.flo"),
                  np.zeros((48, 64, 2), np.float32))
    agg = validate_folder(
        "raft", variables, str(d), str(g), iters=2,
        csv_path=str(tmp_path / "val.csv"),
    )
    assert agg["num_pairs"] == 2
    assert np.isfinite(agg["epe"])
    assert os.path.exists(tmp_path / "val.csv")


def test_flow_augmentor(rng):
    from zero_tig_tpu.data.augmentor import FlowAugmentor

    aug = FlowAugmentor(crop_size=(32, 40), seed=3)
    img1 = (rng.random((64, 80, 3)) * 255).astype(np.uint8)
    img2 = (rng.random((64, 80, 3)) * 255).astype(np.uint8)
    flow = rng.standard_normal((64, 80, 2)).astype(np.float32)
    a1, a2, af = aug(img1, img2, flow)
    assert a1.shape == (32, 40, 3) and af.shape == (32, 40, 2)
    assert a1.dtype == np.uint8 and af.dtype == np.float32


def test_sparse_flow_augmentor(rng):
    from zero_tig_tpu.data.augmentor import SparseFlowAugmentor

    aug = SparseFlowAugmentor(crop_size=(32, 40), seed=3)
    img1 = (rng.random((64, 80, 3)) * 255).astype(np.uint8)
    img2 = (rng.random((64, 80, 3)) * 255).astype(np.uint8)
    flow = rng.standard_normal((64, 80, 2)).astype(np.float32)
    valid = (rng.random((64, 80)) > 0.5).astype(np.float32)
    a1, a2, af, av = aug(img1, img2, flow, valid)
    assert af.shape == (32, 40, 2) and av.shape == (32, 40)
    assert set(np.unique(av)).issubset({0, 1})


def test_sparse_resize_splat():
    from zero_tig_tpu.data.augmentor import SparseFlowAugmentor

    flow = np.zeros((4, 4, 2), np.float32)
    flow[1, 1] = [2.0, 3.0]
    valid = np.zeros((4, 4), np.float32)
    valid[1, 1] = 1
    f2, v2 = SparseFlowAugmentor.resize_sparse_flow_map(flow, valid, 2.0, 2.0)
    assert f2.shape == (8, 8, 2)
    assert v2.sum() == 1
    yy, xx = np.argwhere(v2)[0]
    np.testing.assert_allclose(f2[yy, xx], [4.0, 6.0])


def test_train_state_checkpoint_roundtrip(tmp_path, rng):
    from zero_tig_tpu.core.config import Config
    from zero_tig_tpu.core.train_ckpt import (
        latest_checkpoint,
        restore_train_state,
        save_train_state,
    )
    from zero_tig_tpu.models import init_network_variables
    from zero_tig_tpu.pipeline import init_train_state

    cfg = Config()
    net = init_network_variables(jax.random.PRNGKey(0))
    state = init_train_state(cfg, net, (1, 16, 16, 3))
    state = state._replace(
        carry={
            "last_H3": jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32),
            "last_s3": jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32),
        }
    )
    p = str(tmp_path / "state_3.msgpack")
    save_train_state(p, state, epoch=3, step=42)
    assert latest_checkpoint(str(tmp_path)) == p

    template = init_train_state(cfg, net, (1, 16, 16, 3))
    restored, meta = restore_train_state(p, template)
    assert meta == {"epoch": 3, "step": 42}
    np.testing.assert_array_equal(
        np.asarray(restored.carry["last_H3"]),
        np.asarray(state.carry["last_H3"]),
    )


def test_flow_benchmark_smoke():
    from zero_tig_tpu.flowtools import benchmark_model

    r = benchmark_model("raft", height=48, width=64, num_samples=2,
                        num_warmup=1, iters=2)
    assert r["params"] > 5_000_000  # RAFT ~5.3M
    assert r["time_ms_median"] > 0


def test_raft_return_predictions(rng):
    from zero_tig_tpu.models import init_raft_variables, raft_forward

    v = init_raft_variables(jax.random.PRNGKey(0))
    img = jnp.asarray((rng.random((1, 48, 64, 3)) * 255).astype(np.float32))
    flow_low, flow_ups = raft_forward(
        v, img, img, iters=3, return_predictions=True
    )
    assert flow_ups.shape == (3, 1, 48, 64, 2)
    # final prediction equals the inference path's single output
    _, flow_up = raft_forward(v, img, img, iters=3)
    np.testing.assert_allclose(
        np.asarray(flow_ups[-1]), np.asarray(flow_up), atol=1e-5
    )


def test_flow_sequence_loss_and_train_step(rng):
    from zero_tig_tpu.flowtools import (
        flow_train_step,
        init_flow_train_state,
        sequence_loss,
    )
    from zero_tig_tpu.models import init_raft_variables

    gt = jnp.asarray(rng.standard_normal((1, 16, 16, 2)).astype(np.float32))
    preds = jnp.stack([gt, gt])  # perfect predictions -> zero loss
    assert float(sequence_loss(preds, gt)) == pytest.approx(0.0, abs=1e-6)
    # weighting: early-iteration error discounted by gamma
    bad_first = jnp.stack([gt + 1.0, gt])
    bad_last = jnp.stack([gt, gt + 1.0])
    assert float(sequence_loss(bad_first, gt)) < float(
        sequence_loss(bad_last, gt)
    )

    variables = init_raft_variables(jax.random.PRNGKey(0))
    state = init_flow_train_state(variables, total_steps=100)
    img = jnp.asarray((rng.random((1, 32, 32, 3)) * 255).astype(np.float32))
    gt = jnp.asarray(rng.standard_normal((1, 32, 32, 2)).astype(np.float32))
    new_state, loss = flow_train_step(
        state, img, img, gt, iters=2, total_steps=100
    )
    assert np.isfinite(float(loss)) and float(loss) > 0
    # params actually moved (gradients flowed through the scan + lookup)
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(new_state.params),
        )
    )
    assert moved
