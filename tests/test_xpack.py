"""XLA packed-pair conv layout (ops/xpack.py): numerical equivalence with
the plain NHWC convs, and the packed fast inference path vs the plain one."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zero_tig_tpu.core import precision
from zero_tig_tpu.ops.xpack import (
    blocks1x1,
    blocks3x3,
    cat_packed,
    conv1x1p,
    conv3x3p,
    pack2,
    pairc,
    unpack2,
)


@pytest.fixture(autouse=True)
def _restore_precision():
    yield
    precision.set_precision("highest")
    precision.set_xpack(True)
    jax.clear_caches()


def _xla_conv(x, w, pad=1):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def test_pack2_roundtrip_and_cat(rng):
    x = jnp.asarray(rng.standard_normal((2, 5, 8, 3)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((2, 5, 8, 4)).astype(np.float32))
    assert pack2(x).shape == (2, 5, 4, 6)
    np.testing.assert_array_equal(np.asarray(unpack2(pack2(x))), np.asarray(x))
    cat = cat_packed([pack2(x), pack2(y)])
    ref = pack2(jnp.concatenate([x, y], axis=-1))
    np.testing.assert_array_equal(np.asarray(cat), np.asarray(ref))


@pytest.mark.parametrize("h,w,cin,cout", [(8, 12, 3, 5), (5, 10, 4, 4), (12, 8, 9, 7)])
def test_conv3x3p_matches_xla(rng, h, w, cin, cout):
    x = jnp.asarray(rng.standard_normal((1, h, w, cin)).astype(np.float32))
    wk = jnp.asarray(0.2 * rng.standard_normal((3, 3, cin, cout)).astype(np.float32))
    b = jnp.asarray(0.1 * rng.standard_normal((cout,)).astype(np.float32))

    ref = _xla_conv(x, wk) + b
    got = unpack2(conv3x3p(pack2(x), blocks3x3(wk, jnp.float32), pairc(b)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_conv3x3p_acts_scale_residual(rng):
    h, w, c = 6, 10, 4
    x = jnp.asarray(rng.standard_normal((1, h, w, c)).astype(np.float32))
    wk = jnp.asarray(0.2 * rng.standard_normal((3, 3, c, c)).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (c,)).astype(np.float32))
    shift = jnp.asarray(0.1 * rng.standard_normal((c,)).astype(np.float32))
    conv = _xla_conv(x, wk)

    wp = blocks3x3(wk, jnp.float32)
    scale2, shift2 = pairc(scale), pairc(shift)
    for act, fn in [
        ("relu", lambda v: jnp.maximum(v, 0.0)),
        ("leaky", lambda v: jnp.where(v >= 0, v, 0.2 * v)),
        ("sigmoid_clip", lambda v: jnp.clip(jax.nn.sigmoid(v), 1e-4, 1.0)),
    ]:
        ref = fn(conv * scale + shift)
        got = unpack2(conv3x3p(pack2(x), wp, scale2=scale2, shift2=shift2, act=act))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-4
        ), act

    # Enhancer shared block: out = x + relu(conv*scale + shift)
    ref = x + jnp.maximum(conv * scale + shift, 0.0)
    got = unpack2(
        conv3x3p(
            pack2(x), wp, scale2=scale2, shift2=shift2, act="relu", residual=True
        )
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-4)


def test_conv1x1p_matches_matmul(rng):
    h, w, cin, cout = 6, 8, 48, 3
    x = jnp.asarray(rng.standard_normal((1, h, w, cin)).astype(np.float32))
    wk = jnp.asarray(0.2 * rng.standard_normal((cin, cout)).astype(np.float32))
    b = jnp.asarray(0.1 * rng.standard_normal((cout,)).astype(np.float32))
    ref = jnp.einsum("bhwi,io->bhwo", x, wk) + b
    got = unpack2(conv1x1p(pack2(x), blocks1x1(wk, jnp.float32), pairc(b)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_blocks3x3_zero_structure():
    w = jnp.ones((3, 3, 2, 2), jnp.float32)
    bl = np.asarray(blocks3x3(w, jnp.float32))
    # side taps (s = +-1) keep only one quadrant (|dx| <= 1)
    assert bl[0, 0, :2, :2].sum() == 0 and bl[0, 0, 2:, :2].sum() != 0
    assert bl[0, 2, 2:, 2:].sum() == 0 and bl[0, 2, :2, 2:].sum() != 0
    # center taps are fully populated
    assert (np.abs(bl[1, 1]).sum(axis=0) > 0).all()


@pytest.mark.parametrize(
    "parts", [("enh",), ("d1", "enh", "d2")], ids=["enh", "all"]
)
def test_xpack_inference_matches_plain_fast(rng, parts):
    """The packed-layout fast path equals the plain fast path (same bf16
    products, accumulation-order differences only), recurrence included --
    for the default enh-only selection and the all-packed one."""
    from zero_tig_tpu.models import (
        forward_inference,
        init_network_variables,
        init_raft_variables,
    )

    net_vars = init_network_variables(jax.random.PRNGKey(0))
    raft_vars = init_raft_variables(jax.random.PRNGKey(1))
    frames = [
        jnp.asarray(rng.random((1, 48, 64, 3)).astype(np.float32) * 0.2)
        for _ in range(2)
    ]

    outs = {}
    precision.set_precision("fast")
    for xpack in (False, parts):
        precision.set_xpack(xpack)
        jax.clear_caches()
        carry = {
            "last_H3": jnp.zeros_like(frames[0]),
            "last_s3": jnp.zeros_like(frames[0]),
        }
        seq = []
        for i, f in enumerate(frames):
            (H2, H3, s3), carry = forward_inference(
                net_vars, raft_vars, f, carry, jnp.asarray(i == 0),
                of_scale=2, raft_iters=2,
            )
            seq.append((np.asarray(H2), np.asarray(H3), np.asarray(s3)))
        outs[xpack] = seq

    for (a2, a3, as3), (b2, b3, bs3) in zip(outs[False], outs[parts]):
        np.testing.assert_allclose(a2, b2, atol=1e-2)
        np.testing.assert_allclose(a3, b3, atol=1e-2)
        np.testing.assert_allclose(as3, bs3, atol=1e-2)


def test_xpack_chunk_hoisted_pre_matches_loop(rng):
    """The weight-packing hoist is purely structural: forward_inference with
    a precomputed xpack_pre is BIT-identical to inline packing, and
    predict_chunk (which hoists, pipeline/steps.py) matches the per-frame
    loop to bf16 accumulation tolerance (the scan program fuses differently
    from the unrolled one, so exact equality is not expected in fast mode)."""
    from zero_tig_tpu.models import (
        forward_inference,
        init_network_variables,
        init_raft_variables,
    )
    from zero_tig_tpu.models.network import xpack_precompute
    from zero_tig_tpu.pipeline import predict_chunk

    net_vars = init_network_variables(jax.random.PRNGKey(0))
    raft_vars = init_raft_variables(jax.random.PRNGKey(1))
    frames = jnp.asarray(rng.random((3, 1, 48, 64, 3)).astype(np.float32) * 0.2)
    news = jnp.asarray([True, False, False])
    carry = {
        "last_H3": jnp.zeros_like(frames[0]),
        "last_s3": jnp.zeros_like(frames[0]),
    }

    precision.set_precision("fast")
    precision.set_xpack(True)
    jax.clear_caches()

    pre = xpack_precompute(net_vars, frames.shape[3], 1)
    assert pre is not None
    (a2, a3, as3), _ = forward_inference(
        net_vars, raft_vars, frames[0], carry, news[0],
        of_scale=2, raft_iters=2,
    )
    (b2, b3, bs3), _ = forward_inference(
        net_vars, raft_vars, frames[0], carry, news[0],
        of_scale=2, raft_iters=2, xpack_pre=pre,
    )
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(b2))
    np.testing.assert_array_equal(np.asarray(a3), np.asarray(b3))
    np.testing.assert_array_equal(np.asarray(as3), np.asarray(bs3))

    (h2s, h3s, s3s), _ = predict_chunk(
        net_vars, raft_vars, frames, carry, news, of_scale=2, raft_iters=2
    )
    c = carry
    for i in range(3):
        (H2, H3, s3), c = forward_inference(
            net_vars, raft_vars, frames[i], c, news[i],
            of_scale=2, raft_iters=2,
        )
        np.testing.assert_allclose(np.asarray(h2s[i]), np.asarray(H2), atol=1e-2)
        np.testing.assert_allclose(np.asarray(h3s[i]), np.asarray(H3), atol=1e-2)
        np.testing.assert_allclose(np.asarray(s3s[i]), np.asarray(s3), atol=1e-2)


def test_xpack_odd_width_falls_back(rng):
    """Odd frame width routes through the plain path (no crash)."""
    from zero_tig_tpu.models import (
        forward_inference,
        init_network_variables,
        init_raft_variables,
    )

    net_vars = init_network_variables(jax.random.PRNGKey(0))
    raft_vars = init_raft_variables(jax.random.PRNGKey(1))
    frame = jnp.asarray(rng.random((1, 48, 63, 3)).astype(np.float32) * 0.2)
    precision.set_precision("fast")
    jax.clear_caches()
    (H2, H3, s3), _ = forward_inference(
        net_vars, raft_vars, frame, carry={
            "last_H3": jnp.zeros_like(frame),
            "last_s3": jnp.zeros_like(frame),
        }, is_new_seq=jnp.asarray(True), of_scale=2, raft_iters=2,
    )
    assert H3.shape == frame.shape and np.isfinite(np.asarray(H3)).all()


def test_block_packed_warp_matches_nhwc(rng):
    """grid_sample_pixel_block_packed == pack2(grid_sample_pixel_block):
    same gather, same hat weights, packed-pair output order."""
    from zero_tig_tpu.ops.sampling import (
        grid_sample_pixel_block,
        grid_sample_pixel_block_packed,
    )
    from zero_tig_tpu.ops.xpack import pack2

    img = jnp.asarray(rng.random((1, 16, 24, 6)).astype(np.float32))
    # smooth sub-pixel warp field (block path's exactness envelope)
    gy, gx = jnp.meshgrid(jnp.arange(16.0), jnp.arange(24.0), indexing="ij")
    x = (gx + 0.3 + 0.01 * gy)[None]
    y = (gy - 0.7 + 0.02 * gx)[None]
    a = pack2(grid_sample_pixel_block(img, x, y))
    b = grid_sample_pixel_block_packed(img, x, y)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_warp_packed_inference_matches_default(rng):
    """precision.set_warp_packed(True): identical fast xpack outputs
    (packed warp emit + cat_packed glue vs NHWC seam), recurrence and the
    new-sequence quirk included."""
    from zero_tig_tpu.models import (
        forward_inference,
        init_network_variables,
        init_raft_variables,
    )

    net_vars = init_network_variables(jax.random.PRNGKey(0))
    raft_vars = init_raft_variables(jax.random.PRNGKey(1))
    frames = [
        jnp.asarray(rng.random((1, 48, 64, 3)).astype(np.float32) * 0.2)
        for _ in range(2)
    ]

    outs = {}
    precision.set_precision("fast")
    precision.set_xpack(("d1", "enh", "d2"))
    try:
        for wp in (False, True):
            precision.set_warp_packed(wp)
            jax.clear_caches()
            carry = {
                "last_H3": jnp.zeros_like(frames[0]),
                "last_s3": jnp.zeros_like(frames[0]),
            }
            seq = []
            for i, f in enumerate(frames):
                (H2, H3, s3), carry = forward_inference(
                    net_vars, raft_vars, f, carry, jnp.asarray(i == 0),
                    of_scale=2, raft_iters=2,
                )
                seq.append((np.asarray(H2), np.asarray(H3), np.asarray(s3)))
            outs[wp] = seq
    finally:
        precision.set_warp_packed(None)
        precision.set_xpack(None)

    for (a2, a3, as3), (b2, b3, bs3) in zip(outs[False], outs[True]):
        np.testing.assert_allclose(a2, b2, atol=2e-3)
        np.testing.assert_allclose(a3, b3, atol=2e-3)
        np.testing.assert_allclose(as3, bs3, atol=2e-3)
