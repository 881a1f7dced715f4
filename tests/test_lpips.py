"""LPIPS wiring tests with synthetic VGG/lin weights through the converter
(real torchvision/lpips weights are not in this image)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from zero_tig_tpu.eval import LPIPSScorer, convert_torch_lpips
from zero_tig_tpu.eval.lpips import _VGG_CFG


def _synthetic_state_dicts(rng):
    """torch state dicts with the exact torchvision/lpips key layout."""
    vgg_sd = {}
    seq_i = 0
    cin = 3
    for spec in _VGG_CFG:
        if spec == "M":
            seq_i += 1
            continue
        vgg_sd[f"{seq_i}.weight"] = torch.from_numpy(
            (rng.standard_normal((spec, cin, 3, 3)) * 0.05).astype(np.float32)
        )
        vgg_sd[f"{seq_i}.bias"] = torch.zeros(spec)
        cin = spec
        seq_i += 2
    lpips_sd = {}
    for j, ch in enumerate([64, 128, 256, 512, 512]):
        lpips_sd[f"lin{j}.model.1.weight"] = torch.from_numpy(
            rng.random((1, ch, 1, 1)).astype(np.float32)
        )
    return vgg_sd, lpips_sd


@pytest.fixture(scope="module")
def scorer(tmp_path_factory):
    rng = np.random.default_rng(0)
    vgg_sd, lpips_sd = _synthetic_state_dicts(rng)
    path = str(tmp_path_factory.mktemp("lpips") / "lpips_weights.npz")
    convert_torch_lpips(vgg_sd, lpips_sd, path)
    return LPIPSScorer(path)


def test_lpips_identity_zero(scorer, rng):
    img = rng.random((64, 64, 3)).astype(np.float32)
    assert scorer(img, img) == pytest.approx(0.0, abs=1e-6)


def test_lpips_symmetric_positive(scorer, rng):
    a = rng.random((64, 64, 3)).astype(np.float32)
    b = rng.random((64, 64, 3)).astype(np.float32)
    dab = scorer(a, b)
    dba = scorer(b, a)
    assert dab > 0
    assert dab == pytest.approx(dba, rel=1e-4)


def test_lpips_monotone_with_noise(scorer, rng):
    a = rng.random((64, 64, 3)).astype(np.float32) * 0.5 + 0.25
    d_small = scorer(a, np.clip(a + 0.02 * rng.standard_normal(a.shape), 0, 1))
    d_big = scorer(a, np.clip(a + 0.3 * rng.standard_normal(a.shape), 0, 1))
    assert d_big > d_small


def test_maybe_load_missing():
    assert LPIPSScorer.maybe_load(None) is None
    assert LPIPSScorer.maybe_load("/nonexistent.npz") is None
