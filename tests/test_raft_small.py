"""Small-RAFT: registry wiring + reference-oracle parity.

The reference defines Small* modules (model/RAFT/extractor.py:194-266,
model/RAFT/update.py:99-112) but its RAFT class never instantiates them
(dead code, SURVEY.md section 2.2 row "small variants"). The oracle here
composes the reference's OWN torch modules into the standard small-RAFT
forward (upstream raft.py small branch: hdim 96 / cdim 64 / radius 3 /
bilinear upflow8) and asserts our jax implementation matches it
weight-for-weight through the exported state dict.
"""

from __future__ import annotations

import re
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


@pytest.fixture(scope="module", autouse=True)
def ref_on_path():
    sys.path.insert(0, REF)
    yield
    sys.path.remove(REF)
    for m in list(sys.modules):
        if m in ("loss", "utils", "model") or m.startswith(("utils.", "model.")):
            del sys.modules[m]


def _flax_to_torch_sd(tree: dict) -> dict:
    """Flatten a conv-only flax param tree to torch state-dict naming."""
    sd = {}

    def walk(t, prefix):
        for k, v in t.items():
            if isinstance(v, dict):
                walk(v, prefix + k + ".")
            elif k == "kernel":
                sd[prefix + "weight"] = torch.from_numpy(
                    np.ascontiguousarray(np.transpose(np.asarray(v), (3, 2, 0, 1)))
                )
            else:
                sd[prefix + k] = torch.from_numpy(np.asarray(v))

    walk(tree, "")
    out = {}
    for k, v in sd.items():
        k = re.sub(r"layer(\d)_(\d)\.", r"layer\1.\2.", k)
        k = k.replace("downsample.weight", "downsample.0.weight")
        k = k.replace("downsample.bias", "downsample.0.bias")
        out[k] = v
    return out


def test_registry_has_small_raft():
    from zero_tig_tpu.flowtools import available_models, get_flow_model

    assert "raft_small" in available_models()
    import jax

    m = get_flow_model("raft_small")
    v = m.init_fn(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 255, (1, 48, 64, 3)).astype(np.float32)
    b = rng.uniform(0, 255, (1, 48, 64, 3)).astype(np.float32)
    fl, fu = m.forward_fn(v, a, b, 2)
    assert fu.shape == (1, 48, 64, 2)
    assert np.isfinite(np.asarray(fu)).all()


def test_small_raft_matches_reference_composition():
    import argparse

    import jax
    import jax.numpy as jnp

    from model.RAFT.corr import CorrBlock
    from model.RAFT.extractor import SmallEncoder as RefSmallEncoder
    from model.RAFT.update import SmallUpdateBlock as RefSmallUpdateBlock
    from utils.utils import coords_grid as ref_coords_grid
    from utils.utils import upflow8 as ref_upflow8

    from zero_tig_tpu.models.raft.small import (
        init_raft_small_variables,
        raft_small_forward,
    )

    v = init_raft_small_variables(jax.random.PRNGKey(3))

    fnet = RefSmallEncoder(output_dim=128, norm_fn="instance", dropout=0)
    cnet = RefSmallEncoder(output_dim=160, norm_fn="none", dropout=0)
    args = argparse.Namespace(corr_levels=4, corr_radius=3)
    update = RefSmallUpdateBlock(args, hidden_dim=96)

    fnet.load_state_dict(_flax_to_torch_sd(v["params"]["fnet"]))
    cnet.load_state_dict(_flax_to_torch_sd(v["params"]["cnet"]))
    update.load_state_dict(_flax_to_torch_sd(v["params"]["update_block"]))
    fnet.eval(), cnet.eval(), update.eval()

    rng = np.random.default_rng(5)
    h, w = 128, 160
    img1 = rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32)
    img2 = np.clip(img1 + rng.normal(0, 8, img1.shape), 0, 255).astype(np.float32)
    iters = 3

    fl_j, fu_j = jax.jit(
        lambda vv, a, b: raft_small_forward(vv, a, b, iters=iters)
    )(v, jnp.asarray(img1), jnp.asarray(img2))

    t1 = torch.from_numpy(img1.transpose(0, 3, 1, 2)).contiguous()
    t2 = torch.from_numpy(img2.transpose(0, 3, 1, 2)).contiguous()
    with torch.no_grad():
        i1 = 2.0 * (t1 / 255.0) - 1.0
        i2 = 2.0 * (t2 / 255.0) - 1.0
        fmap1, fmap2 = fnet([i1, i2])
        corr_fn = CorrBlock(fmap1, fmap2, num_levels=4, radius=3)
        cn = cnet(i1)
        net = torch.tanh(cn[:, :96])
        inp = torch.relu(cn[:, 96:])
        coords0 = ref_coords_grid(1, h // 8, w // 8, i1.device)
        coords1 = coords0.clone()
        for _ in range(iters):
            corr = corr_fn(coords1)
            flow = coords1 - coords0
            net, _, delta = update(net, inp, corr, flow)
            coords1 = coords1 + delta
        fl_t = coords1 - coords0
        fu_t = ref_upflow8(fl_t)

    fl_t = fl_t.numpy().transpose(0, 2, 3, 1)
    fu_t = fu_t.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(fl_j), fl_t, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(fu_j), fu_t, atol=2e-3, rtol=1e-3)


def test_flowtools_benchmark_small_raft():
    """The sidecar benchmark sweeps real multi-model paths (reference:
    ptlflow_scripts/model_benchmark.py zoo sweep)."""
    from zero_tig_tpu.flowtools import benchmark_model

    r = benchmark_model("raft_small", height=48, width=64, num_samples=2,
                        iters=2)
    assert r["model"] == "raft_small"
    assert r["time_ms_median"] > 0 and np.isfinite(r["time_ms_median"])
    assert r["params"] > 0
