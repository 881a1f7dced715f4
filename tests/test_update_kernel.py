"""Fused Pallas update-block core vs the raw fast apply (interpret mode).

The kernel computes the same composition as update_block_apply_fast
(motion encoder cor path + z/r-fused GRU + flow head) with bf16 dots and
f32 accumulation; the module/raw path in fast mode uses bf16 convs with
bf16 epilogues, so agreement is bf16-level, not bitwise.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zero_tig_tpu.core import precision
from zero_tig_tpu.models.raft.update import (
    BasicUpdateBlock,
    update_block_apply_fast,
)
from zero_tig_tpu.models.raft.update_kernel import update_block_apply_kernel


@pytest.fixture(scope="module")
def blk_vars():
    blk = BasicUpdateBlock(hidden_dim=128)
    rng = np.random.default_rng(7)
    net = jnp.asarray(rng.standard_normal((1, 8, 16, 128)).astype(np.float32))
    inp = jnp.asarray(rng.standard_normal((1, 8, 16, 128)).astype(np.float32))
    corr = jnp.asarray(
        rng.standard_normal((1, 8, 16, 324)).astype(np.float32)
    )
    flow = jnp.asarray(
        rng.standard_normal((1, 8, 16, 2)).astype(np.float32)
    )
    v = blk.init(jax.random.PRNGKey(0), net, inp, corr, flow)
    return v, net, inp, corr, flow


def test_update_kernel_matches_fast_apply(blk_vars):
    v, net, inp, corr, flow = blk_vars
    precision.set_precision("fast")
    try:
        ref_net, ref_delta = update_block_apply_fast(
            v["params"], net, inp, corr, flow
        )
        k_net, k_delta = update_block_apply_kernel(
            v["params"], net, inp, corr, flow, interpret=True
        )
    finally:
        precision.set_precision("highest")
    np.testing.assert_allclose(
        np.asarray(k_net, np.float32),
        np.asarray(ref_net, np.float32),
        atol=3e-2,
    )
    # delta is a pre-activation regression output (magnitude ~1)
    np.testing.assert_allclose(
        np.asarray(k_delta, np.float32),
        np.asarray(ref_delta, np.float32),
        atol=5e-2,
    )


def test_update_kernel_odd_sizes(blk_vars):
    """45x80-like non-aligned spatial dims must stage through the padded
    in-kernel buffers correctly (the operating point is h=45)."""
    v, *_ = blk_vars
    rng = np.random.default_rng(11)
    net = jnp.asarray(rng.standard_normal((1, 5, 10, 128)).astype(np.float32))
    inp = jnp.asarray(rng.standard_normal((1, 5, 10, 128)).astype(np.float32))
    corr = jnp.asarray(
        rng.standard_normal((1, 5, 10, 324)).astype(np.float32)
    )
    flow = jnp.asarray(rng.standard_normal((1, 5, 10, 2)).astype(np.float32))
    precision.set_precision("fast")
    try:
        ref_net, ref_delta = update_block_apply_fast(
            v["params"], net, inp, corr, flow
        )
        k_net, k_delta = update_block_apply_kernel(
            v["params"], net, inp, corr, flow, interpret=True
        )
    finally:
        precision.set_precision("highest")
    np.testing.assert_allclose(
        np.asarray(k_net, np.float32),
        np.asarray(ref_net, np.float32),
        atol=3e-2,
    )
    np.testing.assert_allclose(
        np.asarray(k_delta, np.float32),
        np.asarray(ref_delta, np.float32),
        atol=5e-2,
    )


def test_fused_paths_under_jitted_scan_pipeline():
    """Both opt-in fast bodies must run under predict_chunk's jitted scan
    and stay within quantization distance of the module body: the fused
    raw apply is exact (identical uint8 output); the Pallas kernel's f32
    epilogues differ from the module's bf16 ones by at most a couple of
    gray levels."""
    import jax

    from zero_tig_tpu.models import (
        init_network_variables,
        init_raft_variables,
    )
    from zero_tig_tpu.pipeline import predict_chunk

    net_vars = init_network_variables(jax.random.PRNGKey(0))
    raft_vars = init_raft_variables(jax.random.PRNGKey(1))
    frame = (
        jax.random.uniform(jax.random.PRNGKey(2), (1, 48, 64, 3), jnp.float32)
        * 0.2
    )
    frames = jnp.stack([frame + 0.001 * i for i in range(3)])
    news = jnp.zeros((3,), jnp.bool_)
    carry = {
        "last_H3": jnp.zeros_like(frame),
        "last_s3": jnp.zeros_like(frame) + 0.5,
    }
    kw = dict(of_scale=2, raft_iters=3, emit="u8")

    precision.set_precision("fast")
    try:
        (_, a), _ = predict_chunk(
            net_vars, raft_vars, frames, carry, news, **kw
        )
        jax.clear_caches()
        precision.set_raft_fused(True)
        (_, b), _ = predict_chunk(
            net_vars, raft_vars, frames, carry, news, **kw
        )
        precision.set_raft_fused(False)
        jax.clear_caches()
        precision.set_raft_kernel(True)
        (_, c), _ = predict_chunk(
            net_vars, raft_vars, frames, carry, news, **kw
        )
    finally:
        precision.set_raft_fused(False)
        precision.set_raft_kernel(False)
        precision.set_precision("highest")
        jax.clear_caches()
    d_ab = int(np.abs(np.asarray(a, np.int32) - np.asarray(b, np.int32)).max())
    d_ac = int(np.abs(np.asarray(a, np.int32) - np.asarray(c, np.int32)).max())
    assert d_ab == 0, d_ab
    assert d_ac <= 3, d_ac
