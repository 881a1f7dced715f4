"""RAFT iterative update machinery.

Parity: ``BasicMotionEncoder`` / ``SepConvGRU`` / ``FlowHead`` /
``BasicUpdateBlock`` (model/RAFT/update.py:6-136).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import Conv


class FlowHead(nn.Module):
    hidden_dim: int = 256

    @nn.compact
    def __call__(self, x):
        x = nn.relu(Conv(self.hidden_dim, (3, 3), padding=1, name="conv1")(x))
        return Conv(2, (3, 3), padding=1, name="conv2")(x)


class SepConvGRU(nn.Module):
    """Separable (1x5 then 5x1) gated conv GRU, hidden 128."""

    hidden_dim: int = 128

    @nn.compact
    def __call__(self, h, x):
        hd = self.hidden_dim
        # horizontal pass
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(Conv(hd, (1, 5), padding=(0, 2), name="convz1")(hx))
        r = nn.sigmoid(Conv(hd, (1, 5), padding=(0, 2), name="convr1")(hx))
        q = nn.tanh(
            Conv(hd, (1, 5), padding=(0, 2), name="convq1")(
                jnp.concatenate([r * h, x], axis=-1)
            )
        )
        h = (1 - z) * h + z * q
        # vertical pass
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(Conv(hd, (5, 1), padding=(2, 0), name="convz2")(hx))
        r = nn.sigmoid(Conv(hd, (5, 1), padding=(2, 0), name="convr2")(hx))
        q = nn.tanh(
            Conv(hd, (5, 1), padding=(2, 0), name="convq2")(
                jnp.concatenate([r * h, x], axis=-1)
            )
        )
        return (1 - z) * h + z * q


class BasicMotionEncoder(nn.Module):
    """Fuses correlation cost features (324ch) and current flow into 128ch."""

    @nn.compact
    def __call__(self, flow, corr):
        cor = nn.relu(Conv(256, (1, 1), name="convc1")(corr))
        cor = nn.relu(Conv(192, (3, 3), padding=1, name="convc2")(cor))
        flo = nn.relu(Conv(128, (7, 7), padding=3, name="convf1")(flow))
        flo = nn.relu(Conv(64, (3, 3), padding=1, name="convf2")(flo))
        out = nn.relu(
            Conv(126, (3, 3), padding=1, name="conv")(
                jnp.concatenate([cor, flo], axis=-1)
            )
        )
        return jnp.concatenate([out, flow], axis=-1)


class BasicUpdateBlock(nn.Module):
    """One refinement step. Parity: BasicUpdateBlock (update.py:108-136).

    The upsample-mask head is exposed separately (``mask_head``) because it
    is a pure function of the updated hidden state: the reference computes
    the mask every iteration and uses only the last (raft.py:111-130), so
    the inference scan calls ``__call__(..., with_mask=False)`` and runs the
    mask head ONCE on the final ``net`` -- identical output, 2 fewer convs
    (one of them the 3x3 128->256, the costliest conv in the update block)
    per discarded iteration.
    """

    hidden_dim: int = 128

    def setup(self):
        self.encoder = BasicMotionEncoder(name="encoder")
        self.gru = SepConvGRU(self.hidden_dim, name="gru")
        self.flow_head = FlowHead(256, name="flow_head")
        self.mask_0 = Conv(256, (3, 3), padding=1, name="mask_0")
        self.mask_2 = Conv(64 * 9, (1, 1), name="mask_2")

    def mask_head(self, net):
        """Convex-upsample mask from the (updated) hidden state; the 0.25
        scale balances gradients vs the flow head (reference update.py:131)."""
        return 0.25 * self.mask_2(nn.relu(self.mask_0(net)))

    def __call__(self, net, inp, corr, flow, with_mask: bool = True):
        motion = self.encoder(flow, corr)
        x = jnp.concatenate([inp, motion], axis=-1)
        net = self.gru(net, x)
        delta_flow = self.flow_head(net)
        mask = self.mask_head(net) if with_mask else None
        return net, mask, delta_flow


def _conv(x, p, pad):
    """Raw NHWC conv + bias with the fast-mode dtype policy of layers.Conv."""
    from ...core.precision import conv_precision, get_mode

    cdt = jnp.bfloat16 if get_mode() == "fast" else x.dtype
    out = jax.lax.conv_general_dilated(
        x.astype(cdt),
        p["kernel"].astype(cdt),
        window_strides=(1, 1),
        padding=[(pad[0], pad[0]), (pad[1], pad[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=conv_precision(),
    )
    return out + p["bias"].astype(cdt)


def _cat2(pa, pb):
    """Fuse two convs that read the SAME input into one: concatenate their
    output channels. Bit-exact (each output channel's products are
    untouched); the kernel concat is loop-invariant, XLA hoists it out of
    the refinement scan."""
    return {
        "kernel": jnp.concatenate([pa["kernel"], pb["kernel"]], axis=-1),
        "bias": jnp.concatenate([pa["bias"], pb["bias"]], axis=-1),
    }


def update_block_apply_fast(params, net, inp, corr, flow):
    """BasicUpdateBlock.__call__(with_mask=False) on the raw param pytree
    with the z/r gate convs of each GRU direction FUSED into one conv
    (same shared input; exact). Raw-jnp fast path for the inference
    refinement scan -- Flax module calls can't concatenate sibling
    kernels, and the per-iteration op count is what the 45x80 RAFT loop
    is bound by. Parity: update.py:108-136 composition, certified
    bit-exact vs the module path by tests/test_models.py."""
    enc, gru = params["encoder"], params["gru"]
    hd = net.shape[-1]

    cor = jax.nn.relu(_conv(corr, enc["convc1"], (0, 0)))
    cor = jax.nn.relu(_conv(cor, enc["convc2"], (1, 1)))
    flo = jax.nn.relu(_conv(flow, enc["convf1"], (3, 3)))
    flo = jax.nn.relu(_conv(flo, enc["convf2"], (1, 1)))
    out = jax.nn.relu(
        _conv(jnp.concatenate([cor, flo], axis=-1), enc["conv"], (1, 1))
    )
    motion = jnp.concatenate([out, flow], axis=-1)
    x = jnp.concatenate([inp, motion], axis=-1)

    # horizontal GRU pass: z|r in one 1x5 conv
    hx = jnp.concatenate([net, x], axis=-1)
    zr = jax.nn.sigmoid(_conv(hx, _cat2(gru["convz1"], gru["convr1"]), (0, 2)))
    z, r = zr[..., :hd], zr[..., hd:]
    q = jnp.tanh(
        _conv(jnp.concatenate([r * net, x], axis=-1), gru["convq1"], (0, 2))
    )
    net = (1 - z) * net + z * q
    # vertical GRU pass: z|r in one 5x1 conv
    hx = jnp.concatenate([net, x], axis=-1)
    zr = jax.nn.sigmoid(_conv(hx, _cat2(gru["convz2"], gru["convr2"]), (2, 0)))
    z, r = zr[..., :hd], zr[..., hd:]
    q = jnp.tanh(
        _conv(jnp.concatenate([r * net, x], axis=-1), gru["convq2"], (2, 0))
    )
    net = (1 - z) * net + z * q

    fh = params["flow_head"]
    delta = _conv(jax.nn.relu(_conv(net, fh["conv1"], (1, 1))), fh["conv2"], (1, 1))
    return net, delta
