"""End-to-end slice: train -> checkpoint -> predict -> evals on the
synthetic 2-scene fixture at tiny resolution (SURVEY.md section 4 strategy).
"""

import glob
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zero_tig_tpu.core.config import Config
from zero_tig_tpu.data import make_rlv_fixture
from zero_tig_tpu.models import init_network_variables
from zero_tig_tpu.pipeline import (
    init_train_state,
    predict_step,
    train_step,
)


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("rlv_e2e"))
    return make_rlv_fixture(root, frames_per_scene=3, size=(64, 48))


TINY = dict(
    frame_width=64, frame_height=48, of_scale=2, raft_iters=2, epochs=1,
)


def _tiny_config(fixture_root, save):
    return Config(
        lowlight_images_path=fixture_root, save=save, dataset="RLV", **TINY
    )


def test_train_step_decreases_loss(rng):
    """Repeated steps on one frame must reduce the objective (optimizer
    plumbing sanity: clip -> weight decay -> Adam)."""
    from zero_tig_tpu.models import init_raft_variables

    cfg = Config(**TINY)
    net_vars = init_network_variables(jax.random.PRNGKey(0))
    raft_vars = init_raft_variables(jax.random.PRNGKey(1))
    frame = jnp.asarray(rng.random((1, 48, 64, 3)).astype(np.float32) * 0.15)
    state = init_train_state(cfg, net_vars, frame.shape)

    losses = []
    for _ in range(6):
        state, loss = train_step(
            state, raft_vars, frame, jnp.asarray(True),
            of_scale=2, raft_iters=2,
        )
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses


def test_full_cli_train_predict_eval(fixture_root, tmp_path):
    """Exercise the real CLI code paths end to end."""
    from zero_tig_tpu.cli.evals import run_evals
    from zero_tig_tpu.cli.predict import run_predict
    from zero_tig_tpu.cli.train import run_training

    save = str(tmp_path / "exp")
    cfg = _tiny_config(fixture_root, save)
    run_dir = run_training(cfg)

    # artifacts (reference layout, train.py:33-36,135,149-152)
    assert os.path.exists(os.path.join(run_dir, "log.txt"))
    assert glob.glob(os.path.join(run_dir, "model_epochs", "weights_0.*"))
    dumps = glob.glob(os.path.join(run_dir, "result", "denoise", "*.png"))
    assert len(dumps) == 6

    weights = os.path.join(run_dir, "model_epochs", "weights_0.pt")
    pred_cfg = Config(
        lowlight_images_path=fixture_root,
        save=str(tmp_path / "pred"),
        model_pretrain=weights,
        dataset="RLV",
        **TINY,
    )
    run_predict(pred_cfg)
    outs = glob.glob(str(tmp_path / "pred" / "**" / "*_denoise.png"),
                     recursive=True)
    assert len(outs) == 6

    eval_cfg = Config(
        lowlight_images_path=fixture_root,
        save=str(tmp_path / "eval"),
        model_pretrain=weights,
        dataset="RLV",
        **TINY,
    )
    metrics = run_evals(eval_cfg)
    assert np.isfinite(metrics["Total_PSNR"]) and metrics["Total_PSNR"] > 0
    assert 0 <= metrics["Total_SSIM"] <= 1
    with open(str(tmp_path / "eval" / "Metrics.json")) as f:
        on_disk = json.load(f)
    assert set(on_disk) == {
        "Total_PSNR", "Total_SSIM", "Total_LPIPS",
        "Total_PSNR_HM", "Total_SSIM_HM", "Total_LPIPS_HM",
    }


def test_predict_cli_chunked_equivalence(fixture_root, tmp_path):
    """--chunk K must produce the same PNGs as the per-frame path (one full
    chunk of 4 + a trailing partial group of 2 over the 6 fixture frames)."""
    from zero_tig_tpu.cli.predict import run_predict

    outs = {}
    for chunk in (1, 4):
        cfg = Config(
            lowlight_images_path=fixture_root,
            save=str(tmp_path / f"pred_c{chunk}"),
            dataset="RLV",
            chunk=chunk,
            **TINY,
        )
        run_predict(cfg)
        files = sorted(
            glob.glob(str(tmp_path / f"pred_c{chunk}" / "**" / "*.png"),
                      recursive=True)
        )
        assert len(files) == 12
        outs[chunk] = {os.path.relpath(f, cfg.save): f for f in files}

    assert outs[1].keys() == outs[4].keys()
    import cv2

    for rel in outs[1]:
        a = cv2.imread(outs[1][rel])
        b = cv2.imread(outs[4][rel])
        np.testing.assert_array_equal(a, b, err_msg=rel)


def test_train_cli_chunked_smoke(fixture_root, tmp_path):
    """--chunk 2 through the train CLI: runs, logs per-frame losses, dumps
    the reference artifact layout."""
    from zero_tig_tpu.cli.train import run_training

    cfg = Config(
        lowlight_images_path=fixture_root,
        save=str(tmp_path / "exp_chunk"),
        dataset="RLV",
        chunk=2,
        **TINY,
    )
    run_dir = run_training(cfg)
    assert glob.glob(os.path.join(run_dir, "model_epochs", "weights_0.*"))
    with open(os.path.join(run_dir, "log.txt")) as f:
        text = f.read()
    assert text.count("train-epoch 000 ") >= 6  # 6 per-frame loss lines


def test_predict_carry_threading(rng):
    """Continuation frames must consume the previous output: feeding the
    same frame twice with is_new_seq=False vs True gives different H3."""
    from zero_tig_tpu.models import init_raft_variables

    net_vars = init_network_variables(jax.random.PRNGKey(0))
    raft_vars = init_raft_variables(jax.random.PRNGKey(1))
    frame = jnp.asarray(rng.random((1, 48, 64, 3)).astype(np.float32) * 0.15)
    zeros = jnp.zeros_like(frame)
    carry = {"last_H3": zeros, "last_s3": zeros}
    (_, H3a, _), carry = predict_step(
        net_vars, raft_vars, frame, carry, jnp.asarray(True),
        of_scale=2, raft_iters=2,
    )
    (_, H3b, _), _ = predict_step(
        net_vars, raft_vars, frame, carry, jnp.asarray(False),
        of_scale=2, raft_iters=2,
    )
    assert not np.allclose(np.asarray(H3a), np.asarray(H3b))


def test_underwater_wb_cli_train_predict(fixture_root, tmp_path):
    """--dataset underwater: generic recursive loader + adaptive white
    balance loss (the reference's documented path crashes on its broken
    DefaultDataset; ours must work end to end)."""
    from zero_tig_tpu.cli.predict import run_predict
    from zero_tig_tpu.cli.train import run_training

    input_dir = os.path.join(fixture_root, "input")
    cfg = Config(
        lowlight_images_path=input_dir,
        save=str(tmp_path / "uw_exp"),
        dataset="underwater",
        **TINY,
    )
    assert cfg.is_wb
    run_dir = run_training(cfg)
    weights = glob.glob(os.path.join(run_dir, "model_epochs", "weights_0.pt"))
    assert weights

    pred_cfg = Config(
        lowlight_images_path=input_dir,
        save=str(tmp_path / "uw_pred"),
        model_pretrain=weights[0],
        dataset="underwater",
        **TINY,
    )
    run_predict(pred_cfg)
    outs = glob.glob(
        str(tmp_path / "uw_pred" / "**" / "*_denoise.png"), recursive=True
    )
    assert len(outs) == 6


def test_train_cli_applies_enhancer_reinit(fixture_root, tmp_path):
    """load_variables(for_training=True) must apply the reference's custom
    enhancer init (train.py:82-84): conv kernels ~ N(0, 0.02)."""
    from zero_tig_tpu.cli.common import load_variables

    cfg = _tiny_config(fixture_root, str(tmp_path / "x"))
    train_vars, _ = load_variables(cfg, for_training=True)
    infer_vars, _ = load_variables(cfg, for_training=False)
    k_train = np.asarray(train_vars["params"]["enhance"]["in_conv"]["kernel"])
    k_infer = np.asarray(infer_vars["params"]["enhance"]["in_conv"]["kernel"])
    assert abs(float(k_train.std()) - 0.02) < 0.005  # custom init
    assert float(k_infer.std()) > 0.03  # torch-default kaiming-uniform
    # denoisers keep the default init in both modes
    np.testing.assert_array_equal(
        np.asarray(train_vars["params"]["denoise_1"]["conv1"]["kernel"]),
        np.asarray(infer_vars["params"]["denoise_1"]["conv1"]["kernel"]),
    )
