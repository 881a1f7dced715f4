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
