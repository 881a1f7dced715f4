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
