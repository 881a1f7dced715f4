"""Packed-pair Pallas conv vs XLA conv: numerical equivalence (interpret
mode on CPU; the real kernel runs only in the TPU fast path)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zero_tig_tpu.ops.pack_conv import (
    build_weight_blocks,
    conv3x3_packed,
    matmul1x1_packed,
    pack,
    pair_params,
    unpack,
)


def _xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.mark.parametrize("h,w,cin,cout", [(8, 12, 3, 5), (6, 10, 4, 4), (12, 8, 2, 7)])
def test_conv3x3_packed_matches_xla(rng, h, w, cin, cout):
    x = jnp.asarray(rng.standard_normal((1, h, w, cin)).astype(np.float32))
    wk = jnp.asarray(0.2 * rng.standard_normal((3, 3, cin, cout)).astype(np.float32))
    b = jnp.asarray(0.1 * rng.standard_normal((cout,)).astype(np.float32))

    ref = _xla_conv(x, wk).astype(jnp.float32) + b

    out = conv3x3_packed(
        pack(x), build_weight_blocks(wk),
        pair_params(jnp.ones((cout,))), pair_params(b),
        h=h, w=w, interpret=True,
    )
    got = unpack(out, h, w).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_conv3x3_packed_activations_and_residual(rng):
    h, w, c = 8, 10, 4
    x = jnp.asarray(rng.standard_normal((1, h, w, c)).astype(np.float32))
    wk = jnp.asarray(0.2 * rng.standard_normal((3, 3, c, c)).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (c,)).astype(np.float32))
    shift = jnp.asarray(0.1 * rng.standard_normal((c,)).astype(np.float32))

    conv = _xla_conv(x, wk).astype(jnp.float32)

    for act, fn in [
        ("relu", lambda v: jnp.maximum(v, 0.0)),
        ("leaky", lambda v: jnp.where(v >= 0, v, 0.2 * v)),
        ("sigmoid_clip", lambda v: jnp.clip(jax.nn.sigmoid(v), 1e-4, 1.0)),
    ]:
        ref = fn(conv * scale + shift)
        out = conv3x3_packed(
            pack(x), build_weight_blocks(wk),
            pair_params(scale), pair_params(shift),
            h=h, w=w, act=act, interpret=True,
        )
        got = unpack(out, h, w).astype(jnp.float32)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-2, rtol=2e-2,
        ), act

    # residual: out = x + relu(conv*scale+shift), the Enhancer shared block
    ref = x + jnp.maximum(conv * scale + shift, 0.0)
    out = conv3x3_packed(
        pack(x), build_weight_blocks(wk),
        pair_params(scale), pair_params(shift),
        h=h, w=w, act="relu", residual=True, interpret=True,
    )
    got = unpack(out, h, w).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_conv3x3_packed_chains_ring_zero(rng):
    """Chained layers see a zeroed ring == fresh zero padding."""
    h, w, c = 8, 10, 4
    x = jnp.asarray(rng.standard_normal((1, h, w, c)).astype(np.float32))
    w1 = jnp.asarray(0.2 * rng.standard_normal((3, 3, c, c)).astype(np.float32))
    w2 = jnp.asarray(0.2 * rng.standard_normal((3, 3, c, c)).astype(np.float32))
    one, zero = pair_params(jnp.ones((c,))), pair_params(jnp.zeros((c,)))

    ref = _xla_conv(_xla_conv(x, w1).astype(jnp.float32), w2)

    p1 = conv3x3_packed(pack(x), build_weight_blocks(w1), one, zero,
                        h=h, w=w, interpret=True)
    p2 = conv3x3_packed(p1, build_weight_blocks(w2), one, zero,
                        h=h, w=w, interpret=True)
    got = unpack(p2, h, w).astype(jnp.float32)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref.astype(jnp.float32)),
        atol=5e-2, rtol=5e-2,
    )


def test_matmul1x1_packed(rng):
    h, w, cin, cout = 6, 8, 5, 3
    x = jnp.asarray(rng.standard_normal((1, h, w, cin)).astype(np.float32))
    wk = jnp.asarray(0.2 * rng.standard_normal((cin, cout)).astype(np.float32))
    b = jnp.asarray(0.1 * rng.standard_normal((cout,)).astype(np.float32))

    ref = jnp.einsum("bhwc,cd->bhwd", x.astype(jnp.bfloat16),
                     wk.astype(jnp.bfloat16)).astype(jnp.float32) + b
    got = unpack(matmul1x1_packed(pack(x), wk, b), h, w).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_forward_inference_packed_matches_xla_fast(rng):
    """The packed-pair fast path == the XLA fast path on the full inference
    forward (same bf16 math, different op order)."""
    from zero_tig_tpu.core import precision
    from zero_tig_tpu.models import init_network_variables, init_raft_variables
    from zero_tig_tpu.models.network import forward_inference

    net_vars = init_network_variables(jax.random.PRNGKey(0))
    raft_vars = init_raft_variables(jax.random.PRNGKey(1))
    frame = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32) * 0.4)
    carry = {
        "last_H3": jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32)),
        "last_s3": jnp.asarray(
            rng.random((1, 64, 64, 3)).astype(np.float32) * 0.5 + 0.3
        ),
    }

    def run():
        jax.clear_caches()
        (H2, H3, s3), new_carry = forward_inference(
            net_vars, raft_vars, frame, dict(carry), jnp.asarray(False),
            of_scale=2, raft_iters=2,
        )
        return np.asarray(H2), np.asarray(H3), np.asarray(s3)

    precision.set_precision("fast")
    try:
        precision.set_pack_conv(True)
        packed = run()
        precision.set_pack_conv(False)
        xla = run()
    finally:
        precision.set_precision("highest")
        precision.set_pack_conv(False)  # experimental default
        jax.clear_caches()

    for a, b, name in zip(packed, xla, ("H2", "H3", "s3")):
        np.testing.assert_allclose(a, b, atol=2e-2, rtol=2e-2, err_msg=name)
