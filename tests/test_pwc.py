"""PWC-lite flow model: registry wiring, shape/semantics contracts, and
supervised trainability through the sidecar.

PWC-lite is this framework's third flow-model family (VERDICT r3 item 9):
the sidecar's selection workflow (benchmark/validate/submit over a model
zoo, parity ptlflow_scripts/model_benchmark.py:1-17) needs a genuinely
different architecture to choose between -- coarse-to-fine pyramid +
warping + local cost volume (Sun et al., CVPR 2018) vs RAFT's recurrent
all-pairs refinement.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zero_tig_tpu.models.pwc import init_pwc_variables, pwc_forward


@pytest.fixture(scope="module")
def pwc_vars():
    return init_pwc_variables(jax.random.PRNGKey(0))


def _pair(rng, h=64, w=64):
    a = rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32)
    b = rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32)
    return jnp.asarray(a), jnp.asarray(b)


def test_registry_has_pwc():
    from zero_tig_tpu.flowtools import available_models

    assert set(available_models()) >= {"raft", "raft_small", "pwc_lite"}


def test_pwc_forward_contract(pwc_vars, rng):
    """(flow_low at 1/4 res, flow_up at padded-input res), finite."""
    a, b = _pair(rng)
    flow_low, flow_up = jax.jit(
        lambda v, x, y: pwc_forward(v, x, y)
    )(pwc_vars, a, b)
    assert flow_low.shape == (1, 16, 16, 2)
    assert flow_up.shape == (1, 64, 64, 2)
    assert np.isfinite(np.asarray(flow_up)).all()


def test_pwc_pads_non16_sizes(pwc_vars, rng):
    a, b = _pair(rng, h=50, w=70)
    flow_low, flow_up = pwc_forward(pwc_vars, a, b)
    # padded to 64x80
    assert flow_up.shape == (1, 64, 80, 2)
    assert np.isfinite(np.asarray(flow_up)).all()


def test_pwc_return_predictions(pwc_vars, rng):
    """Multi-scale supervision sequence: 3 levels, full res, finest last
    == flow_up's source."""
    a, b = _pair(rng)
    flow_low, preds = pwc_forward(pwc_vars, a, b, return_predictions=True)
    assert preds.shape == (3, 1, 64, 64, 2)
    assert np.isfinite(np.asarray(preds)).all()
    _, flow_up = pwc_forward(pwc_vars, a, b)
    np.testing.assert_allclose(
        np.asarray(preds[-1]), np.asarray(flow_up), atol=1e-5
    )


def test_local_correlation_impulse_indexing():
    """The 49-channel static-shift cost volume indexes displacements
    exactly: an impulse pair offset by (dy, dx) lights up ONLY channel
    (d+dy)*(2d+1) + (d+dx) at the impulse position."""
    from zero_tig_tpu.models.pwc import MAX_DISP, local_correlation

    d = MAX_DISP
    f1 = jnp.zeros((1, 9, 9, 4), jnp.float32).at[0, 4, 4, :].set(1.0)
    # f2w impulse displaced by (dy=+1, dx=-2) relative to f1's
    f2w = jnp.zeros((1, 9, 9, 4), jnp.float32).at[0, 5, 2, :].set(1.0)
    cost = np.asarray(local_correlation(f1, f2w, d))
    assert cost.shape == (1, 9, 9, (2 * d + 1) ** 2)
    want_ch = (d + 1) * (2 * d + 1) + (d - 2)
    hits = np.argwhere(cost > 0)
    assert hits.tolist() == [[0, 4, 4, want_ch]]
    assert cost[0, 4, 4, want_ch] == pytest.approx(1.0)


def test_pwc_supervised_training_reduces_loss(pwc_vars, rng):
    """The sidecar trainer (flowtools.train) optimizes pwc_lite: loss
    decreases over a few steps on a fixed synthetic batch."""
    from zero_tig_tpu.flowtools.registry import get_flow_model
    from zero_tig_tpu.flowtools.train import (
        flow_train_step,
        init_flow_train_state,
    )

    a, b = _pair(rng, h=32, w=32)
    gt = jnp.asarray(
        rng.uniform(-2, 2, (1, 32, 32, 2)).astype(np.float32)
    )
    fm = get_flow_model("pwc_lite")
    state = init_flow_train_state(dict(pwc_vars), lr=1e-3, total_steps=100)
    step = jax.jit(
        lambda s: flow_train_step(
            s, a, b, gt, iters=1, lr=1e-3, total_steps=100,
            predictions_fn=fm.predictions_fn,
        )
    )
    losses = []
    for _ in range(8):
        state, loss = step(state)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_train_flow_model_by_registry_name(pwc_vars, rng):
    """train_flow_model(model='pwc_lite') end to end over a tiny batch
    iterator."""
    from zero_tig_tpu.flowtools.train import train_flow_model

    a, b = _pair(rng, h=32, w=32)
    gt = jnp.zeros((1, 32, 32, 2), jnp.float32)
    batches = [(a, b, gt)] * 2
    state = train_flow_model(
        dict(pwc_vars), batches, iters=1, lr=1e-3, total_steps=10,
        log_every=1, model="pwc_lite",
    )
    assert int(state.step) == 2


def test_pwc_benchmark_and_infer(tmp_path, pwc_vars, rng):
    """pwc_lite through the sidecar's benchmark + infer surfaces."""
    import cv2

    from zero_tig_tpu.flowtools.benchmark import benchmark_model
    from zero_tig_tpu.flowtools.validate import infer_pair

    row = benchmark_model("pwc_lite", height=32, width=48,
                          num_samples=2, num_warmup=1)
    assert row["model"] == "pwc_lite"
    assert row["params"] > 0
    assert row["time_ms_median"] > 0

    p1 = str(tmp_path / "f1.png")
    p2 = str(tmp_path / "f2.png")
    img = (rng.uniform(0, 255, (32, 48, 3))).astype(np.uint8)
    cv2.imwrite(p1, img)
    cv2.imwrite(p2, np.roll(img, 2, axis=1))
    res = infer_pair(
        "pwc_lite", pwc_vars, p1, p2, save_dir=str(tmp_path / "out")
    )
    assert (tmp_path / "out" / "f2.flo").exists()
    assert (tmp_path / "out" / "f2_viz.png").exists()
