"""Padding utilities (replicate / reflect) and the divisible-by-8 padder.

Parity: ``InputPadder`` / ``RAFT.pad`` (utils/utils.py:233-251,
model/RAFT/raft.py:132-138) -- sintel-style centered replicate padding to the
next multiple of 8. Pad amounts are static functions of the input shape, so
everything stays shape-static under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pad8_amounts(ht: int, wd: int) -> tuple[int, int, int, int]:
    """(top, bottom, left, right) replicate-pad to multiples of 8, centered."""
    pad_ht = (((ht // 8) + 1) * 8 - ht) % 8
    pad_wd = (((wd // 8) + 1) * 8 - wd) % 8
    return pad_ht // 2, pad_ht - pad_ht // 2, pad_wd // 2, pad_wd - pad_wd // 2


def pad8_replicate(x: jax.Array) -> jax.Array:
    """Pad (B, H, W, C) to /8 dims with edge replication (sintel centering)."""
    t, b, l, r = pad8_amounts(x.shape[-3], x.shape[-2])
    if t == b == l == r == 0:
        return x
    return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode="edge")


def unpad8(x: jax.Array, orig_ht: int, orig_wd: int) -> jax.Array:
    """Remove the centered /8 padding given the original dims."""
    t, b, l, r = pad8_amounts(orig_ht, orig_wd)
    return x[..., t : x.shape[-3] - b, l : x.shape[-2] - r, :]


class InputPadder:
    """Class-API parity with the reference InputPadder (utils/utils.py:233-251).

    mode 'sintel': centered padding; otherwise bottom/right-heavy. Operates
    on NHWC arrays.
    """

    def __init__(self, dims, mode: str = "sintel"):
        self.ht, self.wd = dims[-3], dims[-2]
        pad_ht = (((self.ht // 8) + 1) * 8 - self.ht) % 8
        pad_wd = (((self.wd // 8) + 1) * 8 - self.wd) % 8
        if mode == "sintel":
            self._pad = (
                pad_ht // 2, pad_ht - pad_ht // 2,
                pad_wd // 2, pad_wd - pad_wd // 2,
            )
        else:
            self._pad = (0, pad_ht, pad_wd // 2, pad_wd - pad_wd // 2)

    def pad(self, *inputs):
        t, b, l, r = self._pad
        return [
            jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode="edge")
            for x in inputs
        ]

    def unpad(self, x):
        t, b, l, r = self._pad
        return x[..., t : x.shape[-3] - b, l : x.shape[-2] - r, :]
