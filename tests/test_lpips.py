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


def _torch_lpips_oracle(vgg_sd, lpips_sd, a01, b01):
    """LPIPS forward composed from torch *library* primitives only.

    Mirrors the published pipeline the reference invokes through the lpips
    package (evals.py:73-89): scaling layer, VGG16 features tapped after
    relu{1_2,2_2,3_3,4_3,5_3}, channel unit-normalization, squared diff,
    non-negative 1x1 linear heads, spatial mean, sum over taps.
    """
    layers = []
    cin = 3
    for spec in _VGG_CFG:
        if spec == "M":
            layers.append(torch.nn.MaxPool2d(2))
        else:
            layers.append(torch.nn.Conv2d(cin, spec, 3, padding=1))
            layers.append(torch.nn.ReLU())
            cin = spec
    seq = torch.nn.Sequential(*layers)
    seq.load_state_dict(vgg_sd)

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(x01):
        x = (torch.from_numpy(x01).permute(2, 0, 1)[None] - 0.5) * 2.0
        x = (x - shift) / scale
        out, conv_i = [], 0
        for m in seq:
            x = m(x)
            if isinstance(m, torch.nn.ReLU):
                if conv_i in (1, 3, 6, 9, 12):
                    out.append(x)
                conv_i += 1
        return out

    total = 0.0
    with torch.no_grad():
        for j, (fa, fb) in enumerate(zip(feats(a01), feats(b01))):
            fa = fa / torch.sqrt((fa * fa).sum(1, keepdim=True) + 1e-10)
            fb = fb / torch.sqrt((fb * fb).sum(1, keepdim=True) + 1e-10)
            d = (fa - fb) ** 2
            lin = lpips_sd[f"lin{j}.model.1.weight"]
            scored = torch.nn.functional.conv2d(d, lin)
            total += float(scored.mean())
    return total


def test_lpips_matches_torch_oracle(scorer, rng):
    """Converter + JAX forward vs the torch-composed pipeline, same weights."""
    vgg_sd, lpips_sd = _synthetic_state_dicts(np.random.default_rng(0))
    a = rng.random((32, 48, 3)).astype(np.float32)
    b = np.clip(a + 0.1 * rng.standard_normal(a.shape), 0, 1).astype(np.float32)
    got = scorer(a, b)
    want = _torch_lpips_oracle(vgg_sd, lpips_sd, a, b)
    assert got == pytest.approx(want, rel=2e-4, abs=1e-6)
