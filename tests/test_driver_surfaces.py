"""The two driver-facing surfaces must never break: bench.py (run on real
TPU hardware at the end of every round) and __graft_entry__.entry() (the
single-chip compile check). Both exercised here at tiny sizes on CPU."""

import json
import os
import subprocess
import sys

import numpy as np


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_py_smoke():
    """bench.py end to end at a tiny size: prints exactly one JSON line
    with the contract keys."""
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        PYTHONPATH=REPO,
        BENCH_HEIGHT="64",
        BENCH_WIDTH="64",
        BENCH_OF_SCALE="2",
        BENCH_RAFT_ITERS="2",
        BENCH_STEPS="2",
        BENCH_WARMUP="1",
        BENCH_CHUNK="2",
        BENCH_PRECISION="fast",
    )
    env.pop("PYTHONSTARTUP", None)
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    lines = [ln for ln in res.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, res.stdout
    rec = json.loads(lines[0])
    assert rec["unit"] == "frames/sec/chip"
    assert np.isfinite(rec["value"]) and rec["value"] > 0
    assert "vs_baseline" in rec


def test_graft_entry_compiles():
    """entry() returns a jittable fn + args that compile and run."""
    import jax

    sys.path.insert(0, REPO)
    try:
        from __graft_entry__ import entry

        fn, args = entry()
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        assert np.isfinite(np.asarray(out[1])).all()  # H3
    finally:
        sys.path.remove(REPO)


def test_parity_harness_selftest():
    """tools/parity_vs_reference.py --selftest: the turnkey real-weights
    A/B harness stays green on random-init exported weights (VERDICT r3
    item 7). Subprocess: the harness monkeypatches torch.load/torchvision
    globally, which must not leak into this test process."""
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    res = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "parity_vs_reference.py"),
            "--selftest",
        ],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert res.returncode == 0, (res.stdout[-1500:], res.stderr[-1500:])
    assert "SELFTEST PASS" in res.stdout
