"""Small-RAFT: the reference's compact flow-model configuration.

Parity: the ``args.small`` RAFT variant the reference defines but never
instantiates in the enhancement pipeline (model/RAFT/extractor.py:59-115
BottleneckBlock, :194-266 SmallEncoder; model/RAFT/update.py:16-31
SmallMotionEncoder, :33-47 ConvGRU, :99-112 SmallUpdateBlock). It exists
here to make the flow-model sidecar non-vacuous: benchmark/validate/submit
sweep real architecture alternatives like the reference's ptlflow zoo
(ptlflow_scripts/model_benchmark.py:1-17).

Configuration (RAFT paper / upstream raft.py small branch):
    fnet   = SmallEncoder(output_dim=128, norm='instance')
    cnet   = SmallEncoder(output_dim=hdim+cdim=96+64, norm='none')
    update = SmallUpdateBlock(hidden_dim=96), corr_levels=4, corr_radius=3
    no convex-upsample mask -> bilinear ``upflow8``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from ...ops.padding import pad8_replicate
from ...ops.resize import upflow8
from ...ops.sampling import coords_grid
from ..layers import Conv, instance_norm
from .corr import build_corr_pyramid, lookup_corr
from .update import FlowHead

CORR_LEVELS = 4
CORR_RADIUS = 3
HIDDEN_DIM = 96
CONTEXT_DIM = 64


class _Norm(nn.Module):
    """'instance' (parameter-free) or 'none' -- the two norms small-RAFT uses."""

    norm_fn: str

    @nn.compact
    def __call__(self, x):
        if self.norm_fn == "instance":
            return instance_norm(x)
        if self.norm_fn == "none":
            return x
        raise ValueError(f"unsupported norm_fn {self.norm_fn}")


class BottleneckBlock(nn.Module):
    """1x1 down / 3x3 (strided) / 1x1 up residual bottleneck.

    Parity: model/RAFT/extractor.py:59-115.
    """

    planes: int
    norm_fn: str
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        q = self.planes // 4
        y = nn.relu(_Norm(self.norm_fn, name="norm1")(
            Conv(q, (1, 1), name="conv1")(x)))
        y = nn.relu(_Norm(self.norm_fn, name="norm2")(
            Conv(q, (3, 3), strides=(self.stride, self.stride), padding=1,
                 name="conv2")(y)))
        y = nn.relu(_Norm(self.norm_fn, name="norm3")(
            Conv(self.planes, (1, 1), name="conv3")(y)))
        if self.stride != 1:
            x = Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                name="downsample",
            )(x)
            x = _Norm(self.norm_fn, name="norm4")(x)
        return nn.relu(x + y)


class SmallEncoder(nn.Module):
    """7x7/s2 stem (32ch) + three 2-bottleneck stages (32/64/96) + 1x1 head.

    Parity: model/RAFT/extractor.py:194-266.
    """

    output_dim: int = 128
    norm_fn: str = "instance"

    @nn.compact
    def __call__(self, x):
        x = Conv(32, (7, 7), strides=(2, 2), padding=3, name="conv1")(x)
        x = nn.relu(_Norm(self.norm_fn, name="norm1")(x))
        for stage, (dim, stride) in enumerate(
            [(32, 1), (64, 2), (96, 2)], start=1
        ):
            x = BottleneckBlock(
                dim, self.norm_fn, stride, name=f"layer{stage}_0"
            )(x)
            x = BottleneckBlock(dim, self.norm_fn, 1, name=f"layer{stage}_1")(x)
        return Conv(self.output_dim, (1, 1), name="conv2")(x)


class SmallMotionEncoder(nn.Module):
    """Fuses 196-ch correlation features and flow into 82ch.

    Parity: model/RAFT/update.py:16-31 (conv shapes incl. the 128->80 fuse).
    """

    @nn.compact
    def __call__(self, flow, corr):
        cor = nn.relu(Conv(96, (1, 1), name="convc1")(corr))
        flo = nn.relu(Conv(64, (7, 7), padding=3, name="convf1")(flow))
        flo = nn.relu(Conv(32, (3, 3), padding=1, name="convf2")(flo))
        out = nn.relu(
            Conv(80, (3, 3), padding=1, name="conv")(
                jnp.concatenate([cor, flo], axis=-1)
            )
        )
        return jnp.concatenate([out, flow], axis=-1)


class ConvGRU(nn.Module):
    """Plain 3x3 gated conv GRU. Parity: model/RAFT/update.py:33-47."""

    hidden_dim: int = 96

    @nn.compact
    def __call__(self, h, x):
        hd = self.hidden_dim
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(Conv(hd, (3, 3), padding=1, name="convz")(hx))
        r = nn.sigmoid(Conv(hd, (3, 3), padding=1, name="convr")(hx))
        q = nn.tanh(
            Conv(hd, (3, 3), padding=1, name="convq")(
                jnp.concatenate([r * h, x], axis=-1)
            )
        )
        return (1 - z) * h + z * q


class SmallUpdateBlock(nn.Module):
    """Parity: model/RAFT/update.py:99-112 (no upsample-mask head)."""

    hidden_dim: int = 96

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = SmallMotionEncoder(name="encoder")(flow, corr)
        x = jnp.concatenate([inp, motion], axis=-1)
        net = ConvGRU(self.hidden_dim, name="gru")(net, x)
        delta_flow = FlowHead(128, name="flow_head")(net)
        return net, delta_flow


_FNET = SmallEncoder(output_dim=128, norm_fn="instance")
_CNET = SmallEncoder(output_dim=HIDDEN_DIM + CONTEXT_DIM, norm_fn="none")
_UPDATE = SmallUpdateBlock(hidden_dim=HIDDEN_DIM)


def raft_small_forward(
    variables: Any,
    image1: jax.Array,
    image2: jax.Array,
    *,
    iters: int = 12,
    return_predictions: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """(flow_low, flow_up) between two (B, H, W, 3) frames in [0, 255].

    Same contract as raft.raft_forward; the final x8 upsample is bilinear
    (upflow8) because small-RAFT has no convex-upsample mask head.
    """
    image1 = pad8_replicate(image1)
    image2 = pad8_replicate(image2)
    image1 = 2.0 * (image1 / 255.0) - 1.0
    image2 = 2.0 * (image2 / 255.0) - 1.0

    b = image1.shape[0]
    fmaps = _FNET.apply(
        {"params": variables["params"]["fnet"]},
        jnp.concatenate([image1, image2], 0),
    )
    fmap1, fmap2 = fmaps[:b], fmaps[b:]

    pyramid = build_corr_pyramid(
        fmap1.astype(jnp.float32), fmap2.astype(jnp.float32), CORR_LEVELS
    )

    cnet = _CNET.apply({"params": variables["params"]["cnet"]}, image1)
    net0 = jnp.tanh(cnet[..., :HIDDEN_DIM])
    inp = jax.nn.relu(cnet[..., HIDDEN_DIM:])

    h8, w8 = fmap1.shape[1], fmap1.shape[2]
    coords0 = coords_grid(b, h8, w8, dtype=jnp.float32)
    update_vars = {"params": variables["params"]["update_block"]}

    def body(carry, _):
        net, coords1 = carry
        coords1 = jax.lax.stop_gradient(coords1)
        corr = lookup_corr(pyramid, coords1, CORR_RADIUS)
        flow = coords1 - coords0
        net, delta = _UPDATE.apply(update_vars, net, inp, corr, flow)
        new_coords1 = coords1 + delta
        ys = new_coords1 - coords0 if return_predictions else None
        return (net, new_coords1), ys

    (net, coords1), ys = lax.scan(body, (net0, coords0), None, length=iters)

    flow_low = coords1 - coords0
    if return_predictions:
        return flow_low, jax.vmap(upflow8)(ys)
    return flow_low, upflow8(flow_low)


def init_raft_small_variables(key: jax.Array, h: int = 64, w: int = 64) -> Any:
    kf, kc, ku = jax.random.split(key, 3)
    dummy = jnp.zeros((2, h, w, 3), jnp.float32)
    fnet_v = _FNET.init(kf, dummy)
    cnet_v = _CNET.init(kc, dummy[:1])
    h8, w8 = h // 8, w // 8
    net = jnp.zeros((1, h8, w8, HIDDEN_DIM), jnp.float32)
    inp = jnp.zeros((1, h8, w8, CONTEXT_DIM), jnp.float32)
    corr = jnp.zeros(
        (1, h8, w8, CORR_LEVELS * (2 * CORR_RADIUS + 1) ** 2), jnp.float32
    )
    flow = jnp.zeros((1, h8, w8, 2), jnp.float32)
    upd_v = _UPDATE.init(ku, net, inp, corr, flow)
    return {
        "params": {
            "fnet": fnet_v["params"],
            "cnet": cnet_v["params"],
            "update_block": upd_v["params"],
        }
    }
