"""Batched multi-scene inference == B sequential single-scene runs.

The serving operating point batches B INDEPENDENT scene streams through one
predict_chunk program on one chip (bench.py BENCH_BATCH): the recurrent
carry and the is_new_seq flag are per-scene (models/network.py:662 reshapes
the flag to (-1, 1, 1, 1)), so a batched run must reproduce each scene's
sequential single-scene outputs exactly. This is the equivalence gate for
the batched frames/sec/chip headline (VERDICT r4 item 1).

Parity: the reference runs one scene per process (train.py:108-113); the
batched path is B reference runs in one XLA program.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zero_tig_tpu.core import precision
from zero_tig_tpu.models import init_network_variables, init_raft_variables
from zero_tig_tpu.pipeline import predict_chunk, predict_step


@pytest.fixture(autouse=True)
def _restore_precision():
    yield
    precision.set_precision("highest")
    jax.clear_caches()


def _run(mode, tol):
    precision.set_precision(mode)
    jax.clear_caches()

    B, K, H, W = 3, 4, 32, 40  # W % 4 == 0, H % 2 == 0: xpack dispatches
    net_vars = init_network_variables(jax.random.PRNGKey(0))
    raft_vars = init_raft_variables(jax.random.PRNGKey(1))

    rng = np.random.default_rng(7)
    frames = jnp.asarray(
        rng.random((K, B, H, W, 3)).astype(np.float32) * 0.3
    )
    # staggered per-scene resets: scene 0 resets at k=0, scene 1 at k=0 and
    # k=2, scene 2 never (stale carry exercised from step 0)
    news = np.zeros((K, B), np.bool_)
    news[0, 0] = True
    news[0, 1] = True
    news[2, 1] = True
    news = jnp.asarray(news)

    carry0 = {
        "last_H3": jnp.asarray(
            rng.random((B, H, W, 3)).astype(np.float32) * 0.5
        ),
        "last_s3": jnp.asarray(
            rng.random((B, H, W, 3)).astype(np.float32) * 0.5 + 0.25
        ),
    }

    (H2b, H3b, s3b), carry_b = predict_chunk(
        net_vars, raft_vars, frames, carry0, news,
        of_scale=2, raft_iters=2,
    )

    for b in range(B):
        carry = {
            "last_H3": carry0["last_H3"][b : b + 1],
            "last_s3": carry0["last_s3"][b : b + 1],
        }
        (H2s, H3s, s3s), carry = predict_chunk(
            net_vars, raft_vars, frames[:, b : b + 1], carry,
            news[:, b : b + 1],
            of_scale=2, raft_iters=2,
        )
        np.testing.assert_allclose(
            np.asarray(H2b[:, b]), np.asarray(H2s[:, 0]), atol=tol,
            err_msg=f"H2 scene {b} ({mode})",
        )
        np.testing.assert_allclose(
            np.asarray(H3b[:, b]), np.asarray(H3s[:, 0]), atol=tol,
            err_msg=f"H3 scene {b} ({mode})",
        )
        np.testing.assert_allclose(
            np.asarray(carry_b["last_H3"][b]),
            np.asarray(carry["last_H3"][0]),
            atol=tol,
        )


def test_batched_scenes_match_sequential_highest():
    _run("highest", tol=1e-6)


def test_batched_scenes_match_sequential_fast():
    # bf16 activations: batched vs unbatched conv tiling may reassociate
    # reductions; bound the drift well below bf16 content differences
    _run("fast", tol=2e-2)


def test_batched_single_step_flags_vector():
    """predict_step with a (B,) flag vector == per-scene scalar-flag steps."""
    precision.set_precision("highest")
    jax.clear_caches()
    B, H, W = 2, 16, 24
    net_vars = init_network_variables(jax.random.PRNGKey(0))
    raft_vars = init_raft_variables(jax.random.PRNGKey(1))
    rng = np.random.default_rng(3)
    frame = jnp.asarray(rng.random((B, H, W, 3)).astype(np.float32) * 0.3)
    carry = {
        "last_H3": jnp.asarray(rng.random((B, H, W, 3)).astype(np.float32)),
        "last_s3": jnp.asarray(
            rng.random((B, H, W, 3)).astype(np.float32) * 0.5 + 0.25
        ),
    }
    flags = jnp.asarray([True, False])

    (H2, H3, s3), _ = predict_step(
        net_vars, raft_vars, frame, carry, flags, of_scale=2, raft_iters=2
    )
    for b, flag in enumerate([True, False]):
        sub = {
            "last_H3": carry["last_H3"][b : b + 1],
            "last_s3": carry["last_s3"][b : b + 1],
        }
        (H2s, H3s, _), _ = predict_step(
            net_vars, raft_vars, frame[b : b + 1], sub,
            jnp.asarray(flag), of_scale=2, raft_iters=2,
        )
        np.testing.assert_allclose(
            np.asarray(H3[b]), np.asarray(H3s[0]), atol=1e-6
        )


def test_pipelined_chunk_bitwise_matches_sequential():
    """predict_chunk_pipelined == predict_chunk bitwise (fast xpack path),
    staggered resets included. The variant LOSES on TPU (measured post-
    mortem in its docstring) but must stay correct while it ships opt-in."""
    from zero_tig_tpu.pipeline import predict_chunk, predict_chunk_pipelined

    precision.set_precision("fast")
    jax.clear_caches()
    net_vars = init_network_variables(jax.random.PRNGKey(0))
    raft_vars = init_raft_variables(jax.random.PRNGKey(1))
    rng = np.random.default_rng(7)
    K, B, H, W = 5, 1, 32, 40
    frames = jnp.asarray(rng.random((K, B, H, W, 3)).astype(np.float32) * 0.3)
    news = jnp.asarray(np.array([True, False, False, True, False]))
    carry = {
        "last_H3": jnp.zeros((B, H, W, 3), jnp.float32),
        "last_s3": jnp.zeros((B, H, W, 3), jnp.float32) + 0.5,
    }
    (a2, a3, as3), ca = predict_chunk(
        net_vars, raft_vars, frames, carry, news, of_scale=2, raft_iters=2
    )
    (b2, b3, bs3), cb = predict_chunk_pipelined(
        net_vars, raft_vars, frames, carry, news, of_scale=2, raft_iters=2
    )
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(b2))
    np.testing.assert_array_equal(np.asarray(a3), np.asarray(b3))
    np.testing.assert_array_equal(np.asarray(as3), np.asarray(bs3))
    np.testing.assert_array_equal(
        np.asarray(ca["last_H3"]), np.asarray(cb["last_H3"])
    )


def test_pipelined_chunk_falls_back_when_pack_conv_dispatches():
    """set_pack_conv(True) routes the sequential chunk to the packed body
    and xpack_precompute returns None; predict_chunk_pipelined must fall
    back to predict_chunk (NOT subscript the None pytree -- regression for
    the round-5 review finding) and still match it exactly."""
    from zero_tig_tpu.pipeline import predict_chunk, predict_chunk_pipelined

    precision.set_precision("fast")
    precision.set_pack_conv(True)
    jax.clear_caches()
    try:
        net_vars = init_network_variables(jax.random.PRNGKey(0))
        raft_vars = init_raft_variables(jax.random.PRNGKey(1))
        rng = np.random.default_rng(3)
        K, B, H, W = 3, 1, 32, 40  # B==1, even H/W: pack_conv dispatches
        frames = jnp.asarray(
            rng.random((K, B, H, W, 3)).astype(np.float32) * 0.3
        )
        news = jnp.asarray(np.array([True, False, False]))
        carry = {
            "last_H3": jnp.zeros((B, H, W, 3), jnp.float32),
            "last_s3": jnp.zeros((B, H, W, 3), jnp.float32) + 0.5,
        }
        (a2, a3, _), ca = predict_chunk(
            net_vars, raft_vars, frames, carry, news,
            of_scale=2, raft_iters=2,
        )
        (b2, b3, _), cb = predict_chunk_pipelined(
            net_vars, raft_vars, frames, carry, news,
            of_scale=2, raft_iters=2,
        )
        np.testing.assert_array_equal(np.asarray(a3), np.asarray(b3))
        np.testing.assert_array_equal(
            np.asarray(ca["last_H3"]), np.asarray(cb["last_H3"])
        )
    finally:
        precision.set_pack_conv(False)
