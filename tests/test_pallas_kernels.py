"""Pallas TPU kernels, validated in interpreter mode on CPU (the same
kernels are additionally verified bit-exact on real TPU hardware; see
ops/pallas_equalize.py docstring)."""

import numpy as np
import pytest

import jax.numpy as jnp

from zero_tig_tpu.ops.equalize import equalize_uint8
from zero_tig_tpu.ops.pallas_equalize import equalize_uint8_pallas


@pytest.mark.parametrize("shape", [(1, 24, 33, 3), (2, 16, 128, 3)])
def test_pallas_equalize_matches_xla(rng, shape):
    img = (rng.random(shape) ** 2 * 255).astype(np.uint8)
    a = np.asarray(equalize_uint8(jnp.asarray(img)))
    b = np.asarray(equalize_uint8_pallas(jnp.asarray(img), interpret=True))
    np.testing.assert_array_equal(a, b)


def test_pallas_equalize_constant_channel(rng):
    img = np.full((1, 16, 16, 3), 123, np.uint8)
    out = np.asarray(equalize_uint8_pallas(jnp.asarray(img), interpret=True))
    np.testing.assert_array_equal(out, img)


def test_pallas_equalize_extremes(rng):
    img = np.zeros((1, 16, 16, 3), np.uint8)
    img[0, :8] = 255
    a = np.asarray(equalize_uint8(jnp.asarray(img)))
    b = np.asarray(equalize_uint8_pallas(jnp.asarray(img), interpret=True))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("cin,cout", [(3, 48), (9, 16), (64, 64)])
def test_pallas_conv3x3_matches_xla(rng, cin, cout):
    """conv3x3_bf16 == XLA conv at bf16-rounding tolerance (interpret mode;
    the TPU-compiled kernel was verified on hardware, see module doc)."""
    import jax
    from jax import lax

    from zero_tig_tpu.ops.pallas_conv import conv3x3_bf16

    x = jnp.asarray(rng.random((2, 12, 128, cin)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((cout,)) * 0.01, jnp.float32)
    ref = lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b.astype(jnp.bfloat16)
    out = conv3x3_bf16(x, w, b, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=0.06, rtol=0.02,
    )
