"""Round trip through the standalone checkpoint converter CLI:
.pt -> .msgpack -> .pt preserves every tensor bit-for-bit."""

import os
import runpy
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _run(argv):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    old = sys.argv
    sys.argv = ["convert_checkpoint.py"] + argv
    try:
        runpy.run_path(
            os.path.join(repo, "tools", "convert_checkpoint.py"),
            run_name="__main__",
        )
    except SystemExit as e:
        assert not e.code, e.code
    finally:
        sys.argv = old
        sys.path.remove(repo)


def test_pt_msgpack_pt_round_trip(tmp_path):
    import jax

    from zero_tig_tpu.core.checkpoint import save_torch_pt
    from zero_tig_tpu.models import (
        init_network_variables,
        init_raft_variables,
    )

    net_vars = init_network_variables(jax.random.PRNGKey(7))
    raft_vars = init_raft_variables(jax.random.PRNGKey(8))
    src = str(tmp_path / "orig.pt")
    save_torch_pt(src, net_vars, raft_vars)

    mid = str(tmp_path / "conv.msgpack")
    dst = str(tmp_path / "back.pt")
    _run([src, mid])
    _run([mid, dst])

    a = torch.load(src, weights_only=True)
    b = torch.load(dst, weights_only=True)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(
            a[k].numpy(), b[k].numpy(), err_msg=k
        )
