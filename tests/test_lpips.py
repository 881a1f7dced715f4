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


# ---- real-layout conversion (VERDICT r3 item 8): the first real weights
# must not be able to surprise the converter.

def _full_lpips_sd(rng):
    """A state dict with the EXACT key layout of an instantiated
    ``lpips.LPIPS(net='vgg').state_dict()``: the VGG backbone embedded as
    net.slice{1..5}.{torchvision_seq_idx}.weight/bias (the lpips package's
    vgg16 wrapper preserves Sequential indices inside its 5 slices:
    [0:4), [4:9), [9:16), [16:23), [23:30)), the scaling layer constants,
    and the 5 linear heads lin{j}.model.1.weight."""
    from zero_tig_tpu.eval.lpips import VGG16_CONV_SEQ_IDX

    slice_of = {}
    for s, lo, hi in ((1, 0, 4), (2, 4, 9), (3, 9, 16), (4, 16, 23),
                      (5, 23, 30)):
        for i in range(lo, hi):
            slice_of[i] = s
    shapes = [(64, 3), (64, 64), (128, 64), (128, 128), (256, 128),
              (256, 256), (256, 256), (512, 256), (512, 512), (512, 512),
              (512, 512), (512, 512), (512, 512)]
    sd = {
        "scaling_layer.shift": torch.tensor(
            [-0.030, -0.088, -0.188]
        ).view(1, 3, 1, 1),
        "scaling_layer.scale": torch.tensor(
            [0.458, 0.448, 0.450]
        ).view(1, 3, 1, 1),
    }
    for conv_i, seq_i in enumerate(VGG16_CONV_SEQ_IDX):
        cout, cin = shapes[conv_i]
        pre = f"net.slice{slice_of[seq_i]}.{seq_i}"
        sd[f"{pre}.weight"] = torch.from_numpy(
            (rng.standard_normal((cout, cin, 3, 3)) * 0.05).astype(np.float32)
        )
        sd[f"{pre}.bias"] = torch.zeros(cout)
    for j, ch in enumerate([64, 128, 256, 512, 512]):
        sd[f"lin{j}.model.1.weight"] = torch.from_numpy(
            rng.random((1, ch, 1, 1)).astype(np.float32)
        )
    return sd


def test_convert_lpips_full_real_layout(tmp_path, rng):
    """One full lpips state dict (real key names + shapes) -> scorer with
    plausible behavior."""
    from zero_tig_tpu.eval.lpips import convert_lpips_full

    sd = _full_lpips_sd(np.random.default_rng(3))
    path = str(tmp_path / "lpips_full.npz")
    convert_lpips_full(sd, path)
    scorer = LPIPSScorer(path)
    a = rng.random((64, 64, 3)).astype(np.float32)
    assert scorer(a, a) == pytest.approx(0.0, abs=1e-6)
    d = scorer(a, np.clip(a + 0.2 * rng.standard_normal(a.shape), 0, 1))
    assert np.isfinite(d) and 0 < d < 100


def test_convert_lpips_full_matches_two_dict_path(tmp_path):
    """Same weights through convert_lpips_full and convert_torch_lpips
    produce identical npz arrays."""
    from zero_tig_tpu.eval.lpips import (
        VGG16_CONV_SEQ_IDX,
        convert_lpips_full,
    )

    full = _full_lpips_sd(np.random.default_rng(4))
    vgg_sd = {}
    for seq_i in VGG16_CONV_SEQ_IDX:
        for k, v in full.items():
            if f".{seq_i}.weight" in k:
                vgg_sd[f"{seq_i}.weight"] = v
            elif f".{seq_i}.bias" in k:
                vgg_sd[f"{seq_i}.bias"] = v
    lin_sd = {k: v for k, v in full.items() if k.startswith("lin")}

    p1 = str(tmp_path / "a.npz")
    p2 = str(tmp_path / "b.npz")
    convert_lpips_full(full, p1)
    convert_torch_lpips(vgg_sd, lin_sd, p2)
    z1, z2 = np.load(p1), np.load(p2)
    assert set(z1.files) == set(z2.files)
    for k in z1.files:
        np.testing.assert_array_equal(z1[k], z2[k])


def test_convert_lpips_loud_failures(tmp_path):
    """Wrong layouts fail with informative errors, never silently."""
    from zero_tig_tpu.eval.lpips import convert_lpips_full

    sd = _full_lpips_sd(np.random.default_rng(5))
    path = str(tmp_path / "x.npz")

    missing = dict(sd)
    del missing["net.slice3.10.weight"]
    with pytest.raises(KeyError, match="net.slice3.10.weight"):
        convert_lpips_full(missing, path)

    badshape = dict(sd)
    badshape["net.slice1.0.weight"] = torch.zeros(64, 4, 3, 3)
    with pytest.raises(ValueError, match="shape"):
        convert_lpips_full(badshape, path)

    badscale = dict(sd)
    badscale["scaling_layer.scale"] = torch.ones(1, 3, 1, 1)
    with pytest.raises(ValueError, match="scaling"):
        convert_lpips_full(badscale, path)

    badlin = dict(sd)
    badlin["lin2.model.1.weight"] = torch.zeros(1, 128, 1, 1)
    with pytest.raises(ValueError, match="lin2"):
        convert_lpips_full(badlin, path)
