"""Fused Pallas kernel for the RAFT update block's per-iteration core.

The refinement loop at the pipeline's operating point runs on tiny
(45, 80, C) tensors: every conv is a handful of microseconds of MXU work
wrapped in per-HLO-op overhead, and the scan body dispatches ~25 of them
per iteration (profiled ~3.5 ms/frame across the 12 iterations at 1080p).
Every operand -- activations AND weights -- fits VMEM simultaneously, so
the whole chain

    cor  = relu(convc1_1x1(corr)); cor = relu(convc2_3x3(cor))
    mot  = relu(conv_3x3([cor | flo]));  x = [inp | mot | flow]
    GRU horizontal (1x5, z|r fused) -> GRU vertical (5x1, z|r fused)
    delta = flowhead_conv2_3x3(relu(flowhead_conv1_3x3(net)))

lowers to ONE pallas_call (grid=1) of in-VMEM shifted dot_generals: a
KxK conv is K*K (or K, separable) slices of a zero-col/row-padded buffer
against per-tap weight blocks, exactly the pack_conv.py recipe minus the
pair packing (channels here are already >= 128 lanes).

Kept OUTSIDE the kernel: the correlation lookup (batched einsums Mosaic
can't express), the flow path convf1 7x7 on 2 channels / convf2
(degenerate contraction dims), and the mask head (runs once post-scan).

Numerics match the fast-mode module path: bf16 operands into every dot,
f32 accumulation, epilogues in f32 (the module path's bf16 epilogues are
strictly less precise; the quality gate covers the delta).

Parity: BasicMotionEncoder / SepConvGRU / FlowHead composition,
reference model/RAFT/update.py:6-136. Certified against the Flax module
path by tests/test_update_kernel.py (interpret mode on CPU; the TPU
number gates whether the dispatch defaults on).

TPU measurements (round 4, one v5e, after the concat-padding rewrite that
made Mosaic accept the kernel -- it has no dynamic_update_slice lowering):
standalone at (45, 80) the kernel runs 0.702 ms/iter vs 0.808 for the raw
fused-gate apply (13% faster). END-TO-END at the 1080p chunk-32 operating
point it LOSES: 50.10 ms/frame plain, 49.99 with input_output_aliases on
the net buffer, vs 49.52 base -- the buffer/layout tax XLA charges at the
custom-call boundary inside the scan exceeds the in-kernel win, the same
mechanism that retired the packed-conv engine (NOTES_ROUND3/4). Stays
OPT-IN (precision.set_raft_kernel) for shapes where the balance differs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dotf(a, b):
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16),
        b.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _conv3x3_flat(xf, h, w, wtaps, bias):
    """3x3 SAME conv on a flat (h*w, Cin) buffer via 9 shifted dots.

    wtaps: (9, Cin, Cout) tap-major weights; bias: (1, Cout) f32.
    Zero padding is built with CONCATENATION only -- Mosaic has no
    dynamic_update_slice lowering (probed on TPU this round), and
    sublane-axis concat segments must be multiples of 8, so the column
    border is an 8-wide zero block on each side (reads start at offset
    7+dx; arbitrary sublane slice offsets DO compile). Rows concat on the
    untiled outer axis.
    """
    cin = xf.shape[-1]
    cout = wtaps.shape[-1]
    x3 = xf.reshape(h, w, cin)
    zc = jnp.zeros((h, 8, cin), xf.dtype)
    xw = jnp.concatenate([zc, x3, zc], axis=1)
    zr = jnp.zeros((1, w + 16, cin), xf.dtype)
    xp = jnp.concatenate([zr, xw, zr], axis=0)
    acc = jnp.zeros((h * w, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            win = xp[dy:dy + h, 7 + dx:7 + dx + w, :].reshape(h * w, cin)
            acc += _dotf(win, wtaps[dy * 3 + dx])
    return acc + bias


def _conv1d_flat(xf, h, w, wtaps, bias, axis):
    """1x5 (axis=1) or 5x1 (axis=0) SAME conv on flat (h*w, Cin).

    Same concat-only padding scheme as _conv3x3_flat (see there)."""
    cin = xf.shape[-1]
    cout = wtaps.shape[-1]
    x3 = xf.reshape(h, w, cin)
    if axis == 1:
        zc = jnp.zeros((h, 8, cin), xf.dtype)
        xp = jnp.concatenate([zc, x3, zc], axis=1)
        wins = [xp[:, 6 + k:6 + k + w, :] for k in range(5)]
    else:
        zr = jnp.zeros((2, w, cin), xf.dtype)
        xp = jnp.concatenate([zr, x3, zr], axis=0)
        wins = [xp[k:k + h, :, :] for k in range(5)]
    acc = jnp.zeros((h * w, cout), jnp.float32)
    for k, win in enumerate(wins):
        acc += _dotf(win.reshape(h * w, cin), wtaps[k])
    return acc + bias


def _gru_dir(net, x, wzr, bzr, wq, bq, h, w, axis, hd):
    """One GRU direction with the z/r gate convs fused (exact: channel
    concat of kernels that read the same input)."""
    hx = jnp.concatenate([net.astype(jnp.bfloat16), x], axis=-1)
    zr = jax.nn.sigmoid(_conv1d_flat(hx, h, w, wzr, bzr, axis))
    z, r = zr[:, :hd], zr[:, hd:]
    rh = (r * net).astype(jnp.bfloat16)
    q = jnp.tanh(
        _conv1d_flat(jnp.concatenate([rh, x], axis=-1), h, w, wq, bq, axis)
    )
    return (1.0 - z) * net + z * q


def _kernel(
    net_ref, inp_ref, corr_ref, flo_ref, flow_ref,
    wc1_ref, bc1_ref, wc2_ref, bc2_ref, wcv_ref, bcv_ref,
    wzr1_ref, bzr1_ref, wq1_ref, bq1_ref,
    wzr2_ref, bzr2_ref, wq2_ref, bq2_ref,
    wf1_ref, bf1_ref, wf2_ref, bf2_ref,
    net_out_ref, delta_out_ref,
    *, h: int, w: int, hd: int,
):
    n = h * w
    wc2, bc2 = wc2_ref[...], bc2_ref[...]
    wcv, bcv = wcv_ref[...], bcv_ref[...]
    wzr1, bzr1 = wzr1_ref[...], bzr1_ref[...]
    wq1, bq1 = wq1_ref[...], bq1_ref[...]
    wzr2, bzr2 = wzr2_ref[...], bzr2_ref[...]
    wq2, bq2 = wq2_ref[...], bq2_ref[...]
    wf1, bf1 = wf1_ref[...], bf1_ref[...]
    wf2, bf2 = wf2_ref[...], bf2_ref[...]
    # motion encoder, cor path (flo path arrives precomputed: convf1 is a
    # 7x7 conv on 2 channels -- a degenerate contraction XLA handles fine)
    cor = jax.nn.relu(_dotf(corr_ref[...].reshape(n, -1), wc1_ref[...])
                      + bc1_ref[...])
    cor = jax.nn.relu(
        _conv3x3_flat(cor.astype(jnp.bfloat16), h, w, wc2, bc2)
    )
    mot_in = jnp.concatenate(
        [cor.astype(jnp.bfloat16), flo_ref[...].reshape(n, -1)], axis=-1
    )
    mot = jax.nn.relu(_conv3x3_flat(mot_in, h, w, wcv, bcv))
    # x = [inp | motion | flow]
    x = jnp.concatenate(
        [
            inp_ref[...].reshape(n, -1),
            mot.astype(jnp.bfloat16),
            flow_ref[...].reshape(n, -1).astype(jnp.bfloat16),
        ],
        axis=-1,
    )
    net = net_ref[...].reshape(n, hd).astype(jnp.float32)
    net = _gru_dir(net, x, wzr1, bzr1, wq1, bq1, h, w, 1, hd)
    net = _gru_dir(net, x, wzr2, bzr2, wq2, bq2, h, w, 0, hd)
    netb = net.astype(jnp.bfloat16)
    fh = jax.nn.relu(_conv3x3_flat(netb, h, w, wf1, bf1))
    delta = _conv3x3_flat(fh.astype(jnp.bfloat16), h, w, wf2, bf2)
    net_out_ref[...] = netb.reshape(h, w, hd)
    delta_out_ref[...] = delta.astype(jnp.float32).reshape(h, w, -1)


def _taps3(kernel_hwio):
    """(3, 3, Cin, Cout) -> (9, Cin, Cout) tap-major, bf16."""
    kh, kw, cin, cout = kernel_hwio.shape
    return kernel_hwio.reshape(kh * kw, cin, cout).astype(jnp.bfloat16)


def _taps1d(kernel_hwio):
    """(1, 5, Cin, Cout) or (5, 1, Cin, Cout) -> (5, Cin, Cout) bf16."""
    k = kernel_hwio.reshape(-1, *kernel_hwio.shape[2:])
    return k.astype(jnp.bfloat16)


def _b(v):
    return v.astype(jnp.float32).reshape(1, -1)


def _cat2(pa, pb):
    return {
        "kernel": jnp.concatenate([pa["kernel"], pb["kernel"]], axis=-1),
        "bias": jnp.concatenate([pa["bias"], pb["bias"]], axis=-1),
    }


def update_core_kernel(
    params: dict,
    net: jax.Array,
    inp: jax.Array,
    corr: jax.Array,
    flo: jax.Array,
    flow: jax.Array,
    *,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused update-block core (see module docstring).

    net/inp: (1, h, w, 128); corr: (1, h, w, 324); flo: (1, h, w, 64) --
    the motion encoder's convf2 output computed outside; flow: (1, h, w, 2).
    Returns (net', delta) with net' (1, h, w, 128) bf16 and delta
    (1, h, w, 2) f32.
    """
    b, h, w, hd = net.shape
    assert b == 1, "kernel path is per-scene (B=1); caller falls back"
    enc, gru, fhp = params["encoder"], params["gru"], params["flow_head"]

    zr1 = _cat2(gru["convz1"], gru["convr1"])
    zr2 = _cat2(gru["convz2"], gru["convr2"])

    args = [
        net.reshape(h, w, hd).astype(jnp.bfloat16),
        inp.reshape(h, w, -1).astype(jnp.bfloat16),
        corr.reshape(h, w, -1).astype(jnp.bfloat16),
        flo.reshape(h, w, -1).astype(jnp.bfloat16),
        flow.reshape(h, w, -1).astype(jnp.float32),
        enc["convc1"]["kernel"][0, 0].astype(jnp.bfloat16),
        _b(enc["convc1"]["bias"]),
        _taps3(enc["convc2"]["kernel"]),
        _b(enc["convc2"]["bias"]),
        _taps3(enc["conv"]["kernel"]),
        _b(enc["conv"]["bias"]),
        _taps1d(zr1["kernel"]),
        _b(zr1["bias"]),
        _taps1d(gru["convq1"]["kernel"]),
        _b(gru["convq1"]["bias"]),
        _taps1d(zr2["kernel"]),
        _b(zr2["bias"]),
        _taps1d(gru["convq2"]["kernel"]),
        _b(gru["convq2"]["bias"]),
        _taps3(fhp["conv1"]["kernel"]),
        _b(fhp["conv1"]["bias"]),
        _taps3(fhp["conv2"]["kernel"]),
        _b(fhp["conv2"]["bias"]),
    ]
    kern = functools.partial(_kernel, h=h, w=w, hd=hd)

    def full(a):
        nd = a.ndim
        return pl.BlockSpec(a.shape, lambda *_, n=nd: (0,) * n)
    net_out, delta = pl.pallas_call(
        kern,
        grid=(),
        in_specs=[full(a) for a in args],
        out_specs=[
            pl.BlockSpec((h, w, hd), lambda *_: (0, 0, 0)),
            pl.BlockSpec((h, w, 2), lambda *_: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h, w, hd), jnp.bfloat16),
            jax.ShapeDtypeStruct((h, w, 2), jnp.float32),
        ],
        # net is dead after the call inside the refinement scan: aliasing
        # it onto the net' output removes the copy XLA otherwise inserts
        # around pallas results it cannot prove in-place (the round-3
        # scan-boundary buffer-copy tax on every custom-call output).
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return net_out.reshape(1, h, w, hd), delta.reshape(1, h, w, 2)


def update_block_apply_kernel(
    params: dict,
    net: jax.Array,
    inp: jax.Array,
    corr: jax.Array,
    flow: jax.Array,
    *,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """update_block_apply_fast with the core fused into one Pallas kernel;
    the flow path (convf1 7x7 on 2ch, convf2) runs as XLA convs.

    interpret=None auto-selects the Pallas interpreter off-TPU so the
    dispatch stays runnable in CPU tests and the virtual-mesh dryrun.
    """
    from .update import _conv

    if interpret is None:
        # same backend probe the fast warp uses (sampling.py): anything
        # that isn't the host CPU platform is a real Mosaic target
        interpret = jax.default_backend() == "cpu"
    if not interpret and flow.shape[2] % 8 != 0:
        # the in-kernel (h*w, C) <-> (h, w, C) reshapes are tile-aligned
        # only when w is a multiple of 8 sublanes (true at the pipeline's
        # /8-padded operating points, e.g. 45x80); odd widths fall back
        from .update import update_block_apply_fast

        return update_block_apply_fast(params, net, inp, corr, flow)
    enc = params["encoder"]
    flo = jax.nn.relu(_conv(flow, enc["convf1"], (3, 3)))
    flo = jax.nn.relu(_conv(flo, enc["convf2"], (1, 1)))
    return update_core_kernel(
        params, net, inp, corr, flo, flow, interpret=interpret
    )
