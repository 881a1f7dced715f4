"""Pallas TPU kernel: per-channel uint8 histogram equalization.

The XLA formulation of torchvision-equalize (compare/one-hot + matvec,
ops/equalize.py) costs ~20 ms/frame at the 1/3-1080p operating point because
the (N, 256) one-hot round-trips HBM. This kernel keeps the channel
VMEM-resident and streams it in (8, 128) chunks through registers:

  1. histogram: fori_loop over chunks; each chunk expands to a transient
     (8, 128, 256) one-hot reduced on the VPU into a (1, 256) register
     accumulator (no dynamic lane indexing, tiny live set),
  2. LUT build: cumulative histogram via an exact-f32 Hillis-Steele
     doubling scan (8 roll+select+add VPU steps), then the torchvision
     step/offset arithmetic -- all in registers,
  3. apply: second chunk loop; out_chunk = sum_b onehot * lut[b] fused on
     the VPU.

Grid: one program per (batch*channel). Channels are padded host-side to a
multiple of 8*128 with the sentinel 256, which hits no bin and is cropped
after the call. Bit-exact vs ops.equalize.equalize_uint8 (tested, incl.
compiled on a real v5e).

Status: NOT wired into update_cache -- measured equal to the XLA one-hot
path compiled on TPU (2.44 vs 2.51 ms at the 1/3-1080p operating point,
round 2); the round-1 "~20 ms XLA" figure was a stale profile attribution.
Kept as the reference VMEM-resident formulation (and the template for
kernels this platform's remote Mosaic compiler accepts).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_SUB = 8  # chunk sublanes


def _equalize_kernel(x_ref, out_ref, *, total: float):
    rows = x_ref.shape[1]
    n_chunks = rows // _SUB
    bins1 = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
    bins3 = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANES, 256), 2)

    # 1. histogram: chunked one-hot reduce into a (1, 256) register vector
    def hist_body(i, hist):
        chunk = x_ref[0, pl.ds(i * _SUB, _SUB), :]
        oh = (chunk[:, :, None] == bins3).astype(jnp.float32)
        return hist + jnp.sum(oh, axis=(0, 1))[None, :]

    hist = jax.lax.fori_loop(
        0, n_chunks, hist_body, jnp.zeros((1, 256), jnp.float32)
    )

    # last nonzero bin and the torchvision 'step'
    last_nz = jnp.max(jnp.where(hist > 0, bins1, -1))
    last_count = jnp.sum(jnp.where(bins1 == last_nz, hist, 0.0))
    step = jnp.floor((total - last_count) / 255.0)

    # 2. cumulative histogram via a Hillis-Steele doubling scan: 8 exact-f32
    # VPU steps (an MXU matmul would truncate counts > 2^8 to bf16 mantissa)
    cum = hist
    for s in (1, 2, 4, 8, 16, 32, 64, 128):
        cum = cum + jnp.where(bins1 >= s, jnp.roll(cum, s, axis=1), 0.0)

    safe_step = jnp.maximum(step, 1.0)
    # exact integer floor-division in f32: correct the quotient so that
    # q*b <= a < (q+1)*b (a, b and products are integer-valued < 2^24, so
    # every multiply below is exact; bare f32 division rounds 0.3% of
    # quotients across the floor)
    a = cum + jnp.floor(step / 2.0)
    q = jnp.floor(a / safe_step)
    q = jnp.where(q * safe_step > a, q - 1.0, q)
    q = jnp.where((q + 1.0) * safe_step <= a, q + 1.0, q)
    lut = q
    # shift right by one, insert 0 (torchvision pad [1,0]) and clamp
    lut = jnp.where(
        bins1 == 0, 0.0, jnp.clip(jnp.roll(lut, 1, axis=1), 0.0, 255.0)
    )
    lut = jnp.where(step == 0, bins1.astype(jnp.float32), lut)  # identity

    # 3. apply: out_chunk = sum_b onehot[..., b] * lut[b]
    lut3 = lut[0][None, None, :]  # (1, 1, 256)

    def apply_body(i, _):
        chunk = x_ref[0, pl.ds(i * _SUB, _SUB), :]
        oh = (chunk[:, :, None] == bins3).astype(jnp.float32)
        out_ref[0, pl.ds(i * _SUB, _SUB), :] = jnp.sum(
            oh * lut3, axis=2
        ).astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, n_chunks, apply_body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def equalize_uint8_pallas(img: jax.Array, *, interpret: bool = False) -> jax.Array:
    """Pallas port of ops.equalize.equalize_uint8: (B, H, W, C) uint8."""
    b, h, w, c = img.shape
    n = h * w
    chunk = _SUB * _LANES
    rows = _SUB * (-(-n // chunk))  # rows multiple of _SUB
    pad = rows * _LANES - n

    flat = img.transpose(0, 3, 1, 2).reshape(b * c, n).astype(jnp.int32)
    flat = jnp.pad(flat, ((0, 0), (0, pad)), constant_values=256)
    blocks = flat.reshape(b * c, rows, _LANES)

    out = pl.pallas_call(
        functools.partial(_equalize_kernel, total=float(n)),
        grid=(b * c,),
        in_specs=[
            pl.BlockSpec(
                (1, rows, _LANES), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, rows, _LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * c, rows, _LANES), jnp.int32),
        interpret=interpret,
    )(blocks)

    out = out.reshape(b * c, rows * _LANES)[:, :n]
    return out.reshape(b, c, h, w).transpose(0, 2, 3, 1).astype(jnp.uint8)
