"""Classical pyramidal LK flow: recovers a known translation; sidecar
integration (registry entry, benchmark row, plot artifact)."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from zero_tig_tpu.models.classical_flow import init_lk_variables, lk_forward


def _pair(shift=3, h=96, w=128, seed=4):
    """Scene content moves right by `shift` px from img1 to img2, so the
    flow under the img1(x) == img2(x + flow) convention is +shift in x."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (h, w + shift, 3)).astype(np.float32)
    import cv2

    base = cv2.GaussianBlur(base, (7, 7), 2.0)
    img1 = base[:, shift : w + shift]
    img2 = base[:, :w]
    return jnp.asarray(img1[None]), jnp.asarray(img2[None])


def test_lk_recovers_translation():
    img1, img2 = _pair(shift=3)
    _, flow = jax.jit(
        lambda a, b: lk_forward(init_lk_variables(None), a, b, iters=5)
    )(img1, img2)
    flow = np.asarray(flow)
    # interior crop: boundary windows see zero padding
    inner = flow[0, 16:-16, 16:-16]
    assert abs(float(np.median(inner[..., 0])) - 3.0) < 0.5
    assert abs(float(np.median(inner[..., 1]))) < 0.5


def test_lk_zero_flow_on_identical_frames():
    img1, _ = _pair()
    _, flow = lk_forward(init_lk_variables(None), img1, img1, iters=2)
    assert float(jnp.abs(flow).max()) < 1e-3


def test_registry_has_lk():
    from zero_tig_tpu.flowtools.registry import (
        available_models,
        get_flow_model,
    )

    assert "lk_pyramid" in available_models()
    m = get_flow_model("lk_pyramid")
    assert m.predictions_fn is None  # zero-weight: not trainable
    img1, img2 = _pair(shift=2, h=64, w=64)
    _, up = m.forward_fn(m.init_fn(jax.random.PRNGKey(0)), img1, img2, 2)
    assert up.shape == (1, 64, 64, 2)


def test_benchmark_row_and_plot(tmp_path):
    from zero_tig_tpu.flowtools.benchmark import (
        benchmark_model,
        plot_benchmark,
    )

    row = benchmark_model(
        "lk_pyramid", height=64, width=96, num_samples=2, num_warmup=1
    )
    assert row["params"] == 0 and row["time_ms_median"] > 0
    png = str(tmp_path / "bench.png")
    html = str(tmp_path / "bench.html")
    plot_benchmark(
        [row], png, accuracy={"lk_pyramid": 1.5}, html_path=html
    )
    assert os.path.getsize(png) > 1000
    assert "speed vs accuracy" in open(html).read()
