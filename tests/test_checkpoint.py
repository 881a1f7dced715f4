"""Checkpoint converter tests: round-trip + reference key-layout parity."""

import numpy as np
import jax
import jax.tree_util as jtu

from zero_tig_tpu.core.checkpoint import (
    convert_torch_state_dict,
    export_torch_state_dict,
    load_msgpack,
    save_msgpack,
)
from zero_tig_tpu.models import init_network_variables, init_raft_variables


def tree_allclose(a, b):
    la, ta = jtu.tree_flatten(a)
    lb, tb = jtu.tree_flatten(b)
    assert ta == tb, f"tree structure mismatch:\n{ta}\nvs\n{tb}"
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-7)


def test_roundtrip_network_and_raft():
    net = init_network_variables(jax.random.PRNGKey(0))
    raft = init_raft_variables(jax.random.PRNGKey(1))
    sd = export_torch_state_dict(net, raft)
    net2, raft2 = convert_torch_state_dict(sd)
    tree_allclose(net["params"], net2["params"])
    tree_allclose(net["batch_stats"], net2["batch_stats"])
    tree_allclose(raft["params"], raft2["params"])
    tree_allclose(raft["batch_stats"], raft2["batch_stats"])


def test_export_contains_reference_aliases_and_layout():
    net = init_network_variables(jax.random.PRNGKey(0))
    sd = export_torch_state_dict(net)
    # shared-block aliases (model/model.py:60-67)
    for i in range(3):
        assert f"enhance.blocks.{i}.0.weight" in sd
        np.testing.assert_array_equal(
            sd[f"enhance.blocks.{i}.0.weight"], sd["enhance.conv.0.weight"]
        )
    # OIHW layout: in_conv is 9->64 3x3
    assert sd["enhance.in_conv.0.weight"].shape == (64, 9, 3, 3)
    assert sd["denoise_2.conv1.weight"].shape == (48, 12, 3, 3)
    assert sd["denoise_2.conv3.weight"].shape == (6, 48, 1, 1)


def test_raft_export_key_layout():
    raft = init_raft_variables(jax.random.PRNGKey(0))
    sd = export_torch_state_dict(
        init_network_variables(jax.random.PRNGKey(1)), raft
    )
    # spot-check canonical RAFT key names and shapes
    assert sd["raft.fnet.conv1.weight"].shape == (64, 3, 7, 7)
    assert sd["raft.fnet.layer2.0.downsample.0.weight"].shape == (96, 64, 1, 1)
    assert sd["raft.cnet.norm1.weight"].shape == (64,)
    assert sd["raft.cnet.norm1.running_mean"].shape == (64,)
    assert sd["raft.cnet.layer3.0.downsample.1.running_var"].shape == (128,)
    assert sd["raft.update_block.encoder.convc1.weight"].shape == (256, 324, 1, 1)
    assert sd["raft.update_block.gru.convz1.weight"].shape == (128, 384, 1, 5)
    assert sd["raft.update_block.mask.2.weight"].shape == (576, 256, 1, 1)
    assert sd["raft.update_block.flow_head.conv2.weight"].shape == (2, 256, 3, 3)
    # fnet is InstanceNorm: no norm params may be exported
    assert not any(".norm" in k for k in sd if k.startswith("raft.fnet."))


def test_dataparallel_prefix_stripped():
    raft = init_raft_variables(jax.random.PRNGKey(0))
    sd = export_torch_state_dict(
        init_network_variables(jax.random.PRNGKey(1)), raft
    )
    raft_only = {
        "module." + k[len("raft.") :]: v
        for k, v in sd.items()
        if k.startswith("raft.")
    }
    net2, raft2 = convert_torch_state_dict(raft_only)
    assert net2 is None
    tree_allclose(raft["params"], raft2["params"])


def test_partial_checkpoint_intersection():
    """Unknown keys are skipped (reference key-intersection semantics,
    train.py:87-92)."""
    net = init_network_variables(jax.random.PRNGKey(0))
    sd = export_torch_state_dict(net)
    sd["some.unknown.key"] = np.zeros((3,))
    net2, raft2 = convert_torch_state_dict(sd)
    assert raft2 is None
    tree_allclose(net["params"], net2["params"])


def test_msgpack_native_roundtrip(tmp_path):
    net = init_network_variables(jax.random.PRNGKey(0))
    p = str(tmp_path / "ckpt.msgpack")
    save_msgpack(p, net)
    loaded = load_msgpack(p, net)
    tree_allclose(net, loaded)


def test_torch_pt_interop(tmp_path):
    """Full .pt write/read through real torch serialization."""
    import torch  # noqa: F401

    from zero_tig_tpu.core.checkpoint import load_torch_checkpoint, save_torch_pt

    net = init_network_variables(jax.random.PRNGKey(0))
    raft = init_raft_variables(jax.random.PRNGKey(1))
    p = str(tmp_path / "weights.pt")
    save_torch_pt(p, net, raft)
    net2, raft2 = load_torch_checkpoint(p)
    tree_allclose(net["params"], net2["params"])
    tree_allclose(raft["params"], raft2["params"])
