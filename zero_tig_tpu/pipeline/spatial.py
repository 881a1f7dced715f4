"""Spatial gradient accumulation: full-res f32-faithful training on one chip.

The monolithic 1080p f32 train graph exceeds what this platform's compiler
and a single v5e's HBM can handle (BASELINE.md). This step exploits the
model's structure instead of downscaling (the reference's pressure valve,
model/model.py:223-227):

  * everything GLOBAL in the frame step -- RAFT flow, histogram equalize,
    backward warp, the loss's enhancement factor -- is gradient-free
    (torch.no_grad in the reference, stop_gradient here), so it runs ONCE
    on the full frame;
  * everything with gradients (Denoise_1/2, Enhancer, all 17 loss terms)
    is spatially local with a receptive field under ~24 rows, so the
    value_and_grad pass runs per horizontal band (band + halo rows), with
    the loss evaluated as owned-rows sums over full-frame denominators
    (losses.zero_tig_loss Region mode).

Summed band losses/gradients equal the monolithic step's exactly (same
f32 arithmetic up to sum association; equivalence-tested), then one
clip -> weight-decay -> Adam update applies. BatchNorm runs on running
statistics (bn_train=False): train-mode batch stats are a full-frame
reduction WITH gradients and cannot be banded -- epochs >= 1 of the
reference's own schedule (train.py:115-138 quirk) satisfy this; for
epoch 0 use the monolithic step at a fitting resolution or accept the
documented schedule deviation.

Each band reuses ONE compiled function (band geometry is passed as traced
scalars), and bands run as separate dispatches so peak memory is a single
band's backward.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..core.config import Config
from ..losses.zero_tig_loss import (
    Region,
    _rgb2ycbcr_scrambled,
    loss_factor,
    zero_tig_loss,
)
from ..models.network import (
    DENOISE_1,
    EPS as NET_EPS,
    forward_train_core,
    update_cache,
)
from .steps import TrainState, make_optimizer


@functools.partial(
    jax.jit, static_argnames=("of_scale", "raft_iters", "is_wb")
)
def _flow_phase(
    params: Any,
    raft_vars: Any,
    frame: jax.Array,
    carry: dict,
    is_new_seq: jax.Array,
    *,
    of_scale: int,
    raft_iters: int,
    is_wb: bool,
):
    """Full-frame gradient-free phase: denoised input -> flow -> warp,
    plus the loss's two global gradient-free quantities: the enhancement
    factor and the scrambled-yCbCr of the detached L2 (the smooth-loss
    weights; full-frame phase, see losses.smooth_loss)."""
    sg = jax.lax.stop_gradient
    inp = frame + NET_EPS
    L2 = jnp.clip(
        inp - DENOISE_1.apply({"params": params["denoise_1"]}, inp),
        NET_EPS, 1.0,
    )
    L2 = sg(L2)
    warped_H3, warped_s3 = update_cache(
        raft_vars, carry["last_H3"], carry["last_s3"], L2,
        of_scale=of_scale, raft_iters=raft_iters,
    )
    zero = jnp.zeros_like(L2)
    flag = jnp.reshape(is_new_seq, (-1, 1, 1, 1))
    wH3 = jnp.where(flag, zero, warped_H3)
    ws3 = jnp.where(flag, zero, warped_s3)
    # enh_in: the enhancer's (detached, model/model.py:168) full-frame input,
    # needed by the two-pass BN stats sweeps when bn_train=True
    enh_in = jnp.concatenate([wH3, ws3, L2], axis=-1)
    return wH3, ws3, loss_factor(L2, is_wb=is_wb), _rgb2ycbcr_scrambled(L2), enh_in


@functools.partial(
    jax.jit,
    static_argnames=("slice_h", "band_h", "full_h", "is_wb"),
)
def _band_grad(
    params: Any,
    batch_stats: Any,
    frame: jax.Array,
    wH3: jax.Array,
    ws3: jax.Array,
    factor: jax.Array,
    ycc: jax.Array,
    slice_start: jax.Array,
    own_start: jax.Array,
    own_end: jax.Array,
    *,
    slice_h: int,
    band_h: int,
    full_h: int,
    is_wb: bool,
):
    """Loss + grads for one band (traced geometry -> one compile)."""
    sl = functools.partial(
        jax.lax.dynamic_slice_in_dim, start_index=slice_start,
        slice_size=slice_h, axis=1,
    )
    frame_sl, wH3_sl, ws3_sl, ycc_sl = sl(frame), sl(wH3), sl(ws3), sl(ycc)

    def loss_fn(p):
        outputs, _, _ = forward_train_core(
            {"params": p, "batch_stats": batch_stats},
            frame_sl, wH3_sl, ws3_sl, bn_train=False,
            loss_tail="nhwc",  # region masking needs the per-map blurs
        )
        region = Region(slice_start, own_start, own_end, full_h)
        loss = zero_tig_loss(
            frame_sl, outputs, is_wb=is_wb, region=region, factor=factor,
            ycc=ycc_sl,
        )
        return loss, outputs

    (loss, outputs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    own_local = own_start - slice_start
    H3_band = jax.lax.dynamic_slice_in_dim(
        jax.lax.stop_gradient(outputs.H3), own_local, band_h, 1
    )
    s3_band = jax.lax.dynamic_slice_in_dim(
        jax.lax.stop_gradient(outputs.s3), own_local, band_h, 1
    )
    return loss, grads, H3_band, s3_band


# ---------------------------------------------------------- two-pass BN
# Train-mode BatchNorm normalizes with FULL-frame batch moments of each
# shared-block stage's pre-BN conv output -- a full-frame reduction WITH
# gradients, which a naive band split cannot reproduce. Exact banded
# formulation (VERDICT round-2 item 4):
#   pass A: banded owned-row sums give each stage's (mean, var) exactly
#           (sequential in stages: stage k's input depends on stats_{<k}).
#           INCREMENTAL since round 4: each band carries its (fea, pre-BN)
#           activations from stage to stage, so the whole pass costs one
#           enhancer-prefix forward per band (in_conv + 3 block convs)
#           plus three conv-free centered-square reductions over the
#           cached pre-BN tensors -- instead of re-running the prefix
#           from the slice twice per stage (6 partial forwards, ~4x the
#           conv work). Arithmetic is unchanged: the cached chain IS the
#           slice-forward chain, split across dispatches, and the second
#           (variance) sweep keeps the exact centered sum(x - mean)^2 of
#           TorchBatchNorm rather than a one-pass E[x^2] - mean^2.
#   pass B: banded value_and_grad with the stats as DIFFERENTIABLE inputs
#           -> parameter grads at fixed stats, plus dL/d(mean_k, var_k);
#   pass C: back-substituted adjoints: for k = 3..1, the vjp of the banded
#           stats function S_k(enh_params, stats_{<k}) with the TOTAL
#           cotangent c_k adds the stats->params chain term and propagates
#           c_j += dS_k adjoints for j < k.
# The only deviation from monolithic autodiff is treating mean_k as a
# constant inside var_k's vjp, whose dropped term is analytically zero
# (sum of centered values); equivalence is tested at f32-noise level.
# The enhancer input is detached (model/model.py:168), so stats depend on
# enhancer params only.

_BN_EPS = 1e-5  # TorchBatchNorm.eps


def _own_mask(slice_h: int, slice_start, own_start, own_end, dtype):
    rows = jax.lax.iota(jnp.int32, slice_h) + slice_start
    mask = ((rows >= own_start) & (rows < own_end)).astype(dtype)
    return mask[None, :, None, None]


def _bn_fwd0_band(
    enh_params, enh_in, slice_start, own_start, own_end, *, slice_h: int
):
    """Incremental pass-A stage 0: slice -> (fea_0, pre_0, owned-row sum).

    fea_0 = relu(in_conv(slice)) and pre_0 = block.conv(fea_0) exactly as
    Enhancer.__call__ computes them (models/enhancer.py:60-69); the Conv
    module is applied directly so the band's activations can be CACHED and
    threaded to the next stage instead of recomputed from the slice."""
    from ..models.layers import Conv

    C = enh_params["block"]["bn"]["scale"].shape[0]
    sl = jax.lax.dynamic_slice_in_dim(enh_in, slice_start, slice_h, 1)
    fea = jax.nn.relu(
        Conv(C, (3, 3), padding=1).apply({"params": enh_params["in_conv"]}, sl)
    )
    pre = Conv(C, (3, 3), padding=1).apply(
        {"params": enh_params["block"]["conv"]}, fea
    )
    # statistics accumulate in f32 regardless of precision mode (in fast
    # mode the Conv outputs are bf16; a bf16 reduction here would silently
    # degrade the "exact" pass-A stats -- ADVICE r4)
    m = _own_mask(slice_h, slice_start, own_start, own_end, jnp.float32)
    return fea, pre, jnp.sum(pre.astype(jnp.float32) * m, axis=(0, 1, 2))


def _bn_fwdk_band(
    enh_params, fea, pre, mean, var,
    slice_start, own_start, own_end, *, slice_h: int,
):
    """Incremental pass-A stage k >= 1: finish stage k-1 on the cached
    (fea, pre) -- BN with the just-computed stage-(k-1) stats, relu,
    residual add (models/enhancer.py:70, TorchBatchNorm arithmetic) --
    then stage k's pre-BN conv and its owned-row sum."""
    from ..models.layers import Conv

    C = enh_params["block"]["bn"]["scale"].shape[0]
    scale = enh_params["block"]["bn"]["scale"]
    bias = enh_params["block"]["bn"]["bias"]
    inv = jax.lax.rsqrt(var + _BN_EPS) * scale
    fea = fea + jax.nn.relu(
        ((pre - mean) * inv + bias).astype(pre.dtype)
    )
    pre2 = Conv(C, (3, 3), padding=1).apply(
        {"params": enh_params["block"]["conv"]}, fea
    )
    m = _own_mask(slice_h, slice_start, own_start, own_end, jnp.float32)
    return fea, pre2, jnp.sum(pre2.astype(jnp.float32) * m, axis=(0, 1, 2))


def _bn_s2_band(
    pre, mean, slice_start, own_start, own_end, *, slice_h: int
):
    """Centered-variance partial sum over the cached pre-BN tensor: the
    exact sum((x - mean)^2) second sweep, now conv-free."""
    m = _own_mask(slice_h, slice_start, own_start, own_end, jnp.float32)
    return jnp.sum(
        jnp.square(pre.astype(jnp.float32) - mean) * m, axis=(0, 1, 2)
    )


def _bn_sweep_bnpath(enh_params, pre, mean, var, cot_fea_next):
    """Pass-C phase 1 at one stage for one band: cotangents of the
    BN+residual path fea_{k+1} = fea_k + relu(BN(pre_k; mean_k, var_k)).

    Elementwise only -- no convolution. Returns (d_mean, d_var, d_scale,
    d_bias, cot_pre_bn): the first two are this band's increments to the
    global dL/dstats_k (summed across bands BEFORE phase 2, because
    stats_k are full-frame reductions), the rest feed phase 2."""
    scale = enh_params["block"]["bn"]["scale"]
    bias = enh_params["block"]["bn"]["bias"]

    def f(mean, var, scale, bias, pre):
        inv = jax.lax.rsqrt(var + _BN_EPS) * scale
        return jax.nn.relu(((pre - mean) * inv + bias).astype(pre.dtype))

    _, vjp = jax.vjp(f, mean, var, scale, bias, pre)
    return vjp(cot_fea_next)


def _bn_sweep_convpath(
    enh_params, fea, pre, mean, cot_pre_bn, cot_fea_next, cot_s1, cot_s2,
    slice_start, own_start, own_end, *, slice_h: int,
):
    """Pass-C phase 2 at one stage for one band: ONE conv backward under
    the TOTAL pre_k cotangent -- the BN-path part (phase 1) plus the
    owned-row sum cotangents cot_s1 (on sum pre_k) and cot_s2 (on the
    centered sum (pre_k - mean_k)^2; mean_k constant there, its dropped
    global term is analytically zero -- see the two-pass BN block
    comment). Returns (d_conv_params, cot_fea_k) where cot_fea_k already
    includes the residual identity path."""
    from ..models.layers import Conv

    C = enh_params["block"]["bn"]["scale"].shape[0]
    m = _own_mask(slice_h, slice_start, own_start, own_end, jnp.float32)
    cot_pre = (
        cot_pre_bn.astype(jnp.float32)
        + m * (cot_s1 + 2.0 * (pre.astype(jnp.float32) - mean) * cot_s2)
    ).astype(pre.dtype)

    def g(conv_params, fea):
        return Conv(C, (3, 3), padding=1).apply({"params": conv_params}, fea)

    _, vjp = jax.vjp(g, enh_params["block"]["conv"], fea)
    d_conv, d_fea = vjp(cot_pre)
    return d_conv, d_fea + cot_fea_next


def _bn_sweep_inconv(
    enh_params, enh_in, cot_fea0, slice_start, *, slice_h: int
):
    """Pass-C final step for one band: vjp of fea_0 = relu(in_conv(slice))
    under the accumulated fea_0 cotangent -> d in_conv params."""
    from ..models.layers import Conv

    C = enh_params["block"]["bn"]["scale"].shape[0]
    sl = jax.lax.dynamic_slice_in_dim(enh_in, slice_start, slice_h, 1)

    def f0(in_conv_params):
        return jax.nn.relu(
            Conv(C, (3, 3), padding=1).apply({"params": in_conv_params}, sl)
        )

    _, vjp = jax.vjp(f0, enh_params["in_conv"])
    (d_in_conv,) = vjp(cot_fea0)
    return d_in_conv


@functools.partial(
    jax.jit,
    static_argnames=("slice_h", "band_h", "full_h", "is_wb"),
)
def _band_grad_bn(
    params, batch_stats, frame, wH3, ws3, factor, ycc, stats,
    slice_start, own_start, own_end,
    *, slice_h: int, band_h: int, full_h: int, is_wb: bool,
):
    """Band loss + grads wrt (params, stats) with BN stats supplied."""
    sl = functools.partial(
        jax.lax.dynamic_slice_in_dim, start_index=slice_start,
        slice_size=slice_h, axis=1,
    )
    frame_sl, wH3_sl, ws3_sl, ycc_sl = sl(frame), sl(wH3), sl(ws3), sl(ycc)

    def loss_fn(p, st):
        outputs, _, _ = forward_train_core(
            {"params": p, "batch_stats": batch_stats},
            frame_sl, wH3_sl, ws3_sl, bn_train=False, bn_overrides=st,
            loss_tail="nhwc",
        )
        region = Region(slice_start, own_start, own_end, full_h)
        loss = zero_tig_loss(
            frame_sl, outputs, is_wb=is_wb, region=region, factor=factor,
            ycc=ycc_sl,
        )
        return loss, outputs

    (loss, outputs), (g_params, g_stats) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(params, stats)
    own_local = own_start - slice_start
    H3_band = jax.lax.dynamic_slice_in_dim(
        jax.lax.stop_gradient(outputs.H3), own_local, band_h, 1
    )
    s3_band = jax.lax.dynamic_slice_in_dim(
        jax.lax.stop_gradient(outputs.s3), own_local, band_h, 1
    )
    return loss, g_params, g_stats, H3_band, s3_band


@functools.partial(jax.jit, static_argnames=("slice_h", "n_el"))
def _bn_pass_a(enh_params, enh_in, geoms, *, slice_h: int, n_el: int):
    """Pass A in ONE dispatch: all three stages' exact full-frame batch
    moments, bands and stages unrolled in-graph.

    geoms: int32 (bands, 3) of (slice_start, own_start, own_end). Through
    the axon relay every dispatch costs ~25-40 ms regardless of payload
    (CLAUDE.md), so the round-4 formulation's 12 per-band/per-stage
    dispatches paid more in relay latency than in compute; the arithmetic
    here is IDENTICAL (same body helpers, same f32 accumulation and
    centered second sweep). Returns the three (mean, biased-var) pairs."""
    bands = geoms.shape[0]
    feas = [None] * bands
    pres = [None] * bands
    stats = []
    for k in range(3):
        s1_tot = jnp.zeros((64,), jnp.float32)
        for b in range(bands):
            g = (geoms[b, 0], geoms[b, 1], geoms[b, 2])
            if k == 0:
                fea, pre, s1 = _bn_fwd0_band(
                    enh_params, enh_in, *g, slice_h=slice_h
                )
            else:
                fea, pre, s1 = _bn_fwdk_band(
                    enh_params, feas[b], pres[b], *stats[k - 1], *g,
                    slice_h=slice_h,
                )
            feas[b], pres[b] = fea, pre
            s1_tot = s1_tot + s1
        mean_k = s1_tot / n_el
        s2_tot = jnp.zeros((64,), jnp.float32)
        for b in range(bands):
            g = (geoms[b, 0], geoms[b, 1], geoms[b, 2])
            s2_tot = s2_tot + _bn_s2_band(
                pres[b], mean_k, *g, slice_h=slice_h
            )
        stats.append((mean_k, s2_tot / n_el))
    return tuple(stats)


@functools.partial(jax.jit, static_argnames=("slice_h", "n_el"))
def _bn_pass_c(enh_params, enh_in, stats, e_stats, geoms, *, slice_h: int,
               n_el: int):
    """Pass C in ONE dispatch: the descending one-sweep stats->params
    chain over the incremental stage functions, bands/stages/phases
    unrolled in-graph (same arithmetic as the per-dispatch form; fused
    for the relay's per-dispatch cost). Returns the enhancer-prefix grad
    increments {in_conv, block: {conv, bn: {scale, bias}}}."""
    bands = geoms.shape[0]
    # chain recompute: one enhancer prefix per band, caching (fea_k, pre_k)
    feas = [[None] * 3 for _ in range(bands)]
    pres = [[None] * 3 for _ in range(bands)]
    for b in range(bands):
        g = (geoms[b, 0], geoms[b, 1], geoms[b, 2])
        fea, pre, _ = _bn_fwd0_band(enh_params, enh_in, *g, slice_h=slice_h)
        feas[b][0], pres[b][0] = fea, pre
        for k in (1, 2):
            fea, pre, _ = _bn_fwdk_band(
                enh_params, fea, pre, *stats[k - 1], *g, slice_h=slice_h
            )
            feas[b][k], pres[b][k] = fea, pre
    cot_fea = [jnp.zeros_like(feas[b][0]) for b in range(bands)]
    d_scale = jnp.zeros_like(enh_params["block"]["bn"]["scale"])
    d_bias = jnp.zeros_like(enh_params["block"]["bn"]["bias"])
    d_conv_acc = None
    for k in (2, 1, 0):
        mean_k, var_k = stats[k]
        c_mean, c_var = e_stats[k]
        cot_pre_bns = []
        for b in range(bands):
            dm, dv, ds, db, cot_pre_bn = _bn_sweep_bnpath(
                enh_params, pres[b][k], mean_k, var_k, cot_fea[b]
            )
            c_mean = c_mean + dm
            c_var = c_var + dv
            d_scale = d_scale + ds
            d_bias = d_bias + db
            cot_pre_bns.append(cot_pre_bn)
        cot_s1 = c_mean / n_el
        cot_s2 = c_var / n_el
        for b in range(bands):
            g = (geoms[b, 0], geoms[b, 1], geoms[b, 2])
            d_conv, cot_fea[b] = _bn_sweep_convpath(
                enh_params, feas[b][k], pres[b][k], mean_k,
                cot_pre_bns[b], cot_fea[b], cot_s1, cot_s2, *g,
                slice_h=slice_h,
            )
            d_conv_acc = (
                d_conv if d_conv_acc is None
                else jax.tree_util.tree_map(jnp.add, d_conv_acc, d_conv)
            )
    d_in_conv = None
    for b in range(bands):
        d_in = _bn_sweep_inconv(
            enh_params, enh_in, cot_fea[b], geoms[b, 0], slice_h=slice_h
        )
        d_in_conv = (
            d_in if d_in_conv is None
            else jax.tree_util.tree_map(jnp.add, d_in_conv, d_in)
        )
    return {
        "in_conv": d_in_conv,
        "block": {"conv": d_conv_acc, "bn": {"scale": d_scale,
                                             "bias": d_bias}},
    }


@functools.partial(jax.jit, static_argnames=())
def _apply_update(params, opt_state, grads, lr, grad_clip, weight_decay):
    cfg = Config(lr=lr, grad_clip=grad_clip, weight_decay=weight_decay)
    opt = make_optimizer(cfg)
    updates, new_opt_state = opt.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), new_opt_state


def spatial_loss_and_grads(
    state: TrainState,
    raft_vars: Any,
    frame: jax.Array,
    is_new_seq: jax.Array,
    *,
    bands: int = 2,
    halo: int = 32,
    of_scale: int = 3,
    raft_iters: int = 12,
    is_wb: bool = False,
    bn_train: bool = False,
):
    """Banded loss/gradients for one frame, pre-optimizer.

    Returns (loss_total, grads, new_batch_stats, new_carry). Exposed
    separately from train_step_spatial so the equivalence tests can compare
    GRADIENTS against the monolithic step directly (Adam amplifies f32
    noise on near-zero-gradient channels into full-size update differences,
    so post-update parameters are not a sharp equivalence signal).
    """
    h = frame.shape[1]
    if h % bands:
        raise ValueError(f"H={h} not divisible by bands={bands}")
    band_h = h // bands
    if band_h % 2 or halo % 2:
        raise ValueError("band height and halo must be even (pair maps)")
    slice_h = min(band_h + 2 * halo, h)

    wH3, ws3, factor, ycc, enh_in = _flow_phase(
        state.params, raft_vars, frame, state.carry, is_new_seq,
        of_scale=of_scale, raft_iters=raft_iters, is_wb=is_wb,
    )

    geoms = []
    for b_i in range(bands):
        own_start = b_i * band_h
        slice_start = min(max(own_start - halo, 0), h - slice_h)
        geoms.append(
            (
                jnp.asarray(slice_start),
                jnp.asarray(own_start),
                jnp.asarray(own_start + band_h),
            )
        )

    new_batch_stats = state.batch_stats
    stats = None
    geoms_arr = jnp.asarray(
        [[int(g[0]), int(g[1]), int(g[2])] for g in geoms], jnp.int32
    )
    if bn_train:
        # ---- pass A: full-frame batch stats per shared-BN stage,
        # incremental (see the two-pass BN block comment) and fused into
        # ONE dispatch (the relay charges ~25-40 ms per dispatch;
        # round-4's per-band/per-stage form paid 12 of those here).
        enh_params = state.params["enhance"]
        enh_bstats = state.batch_stats["enhance"]
        b_sz = frame.shape[0]
        n_el = b_sz * h * frame.shape[2]
        stats = _bn_pass_a(
            enh_params, enh_in, geoms_arr, slice_h=slice_h, n_el=n_el
        )

        # running-stats update: torch semantics, three sequential blends
        # with the UNBIASED variance (models/layers.TorchBatchNorm)
        rm = enh_bstats["block"]["bn"]["mean"]
        rv = enh_bstats["block"]["bn"]["var"]
        for k in range(3):
            rm = 0.9 * rm + 0.1 * stats[k][0]
            rv = 0.9 * rv + 0.1 * stats[k][1] * (n_el / max(n_el - 1, 1))
        new_batch_stats = dict(state.batch_stats)
        new_batch_stats["enhance"] = {
            "block": {"bn": {"mean": rm, "var": rv}}
        }

    # ---- pass B: banded loss/grads (stats as differentiable inputs)
    loss_total = jnp.zeros((), jnp.float32)
    grads_acc = None
    e_stats = None
    h3_parts, s3_parts = [], []
    for g in geoms:
        if bn_train:
            loss, grads, g_st, H3_b, s3_b = _band_grad_bn(
                state.params, state.batch_stats, frame, wH3, ws3, factor,
                ycc, stats, *g,
                slice_h=slice_h, band_h=band_h, full_h=h, is_wb=is_wb,
            )
            e_stats = (
                g_st if e_stats is None
                else jax.tree_util.tree_map(jnp.add, e_stats, g_st)
            )
        else:
            loss, grads, H3_b, s3_b = _band_grad(
                state.params, state.batch_stats, frame, wH3, ws3, factor,
                ycc, *g,
                slice_h=slice_h, band_h=band_h, full_h=h, is_wb=is_wb,
            )
        loss_total = loss_total + loss
        grads_acc = (
            grads if grads_acc is None
            else jax.tree_util.tree_map(jnp.add, grads_acc, grads)
        )
        h3_parts.append(H3_b)
        s3_parts.append(s3_b)

    if bn_train:
        # ---- pass C: stats -> params chain, ONE descending sweep over the
        # incremental stage functions in ONE dispatch (round 5; replaces
        # per-stage PREFIX vjps costing in_conv + (k+1) convs each, across
        # 20 relay dispatches). The fea-cotangent stream carries the
        # cross-stage chain (stats_k is consumed only inside stage k's
        # BN); cross-band coupling (stats are global sums) is honored by
        # summing the cheap elementwise BN-path cotangents across bands
        # before each stage's conv-path vjp.
        b_sz = frame.shape[0]
        n_el = b_sz * h * frame.shape[2]
        d_enh = _bn_pass_c(
            state.params["enhance"], enh_in, stats, e_stats, geoms_arr,
            slice_h=slice_h, n_el=n_el,
        )
        eg = grads_acc["enhance"]
        grads_acc["enhance"] = {
            **eg,
            "in_conv": jax.tree_util.tree_map(
                jnp.add, eg["in_conv"], d_enh["in_conv"]
            ),
            "block": {
                **eg["block"],
                "conv": jax.tree_util.tree_map(
                    jnp.add, eg["block"]["conv"], d_enh["block"]["conv"]
                ),
                "bn": {
                    **eg["block"]["bn"],
                    "scale": eg["block"]["bn"]["scale"]
                    + d_enh["block"]["bn"]["scale"],
                    "bias": eg["block"]["bn"]["bias"]
                    + d_enh["block"]["bn"]["bias"],
                },
            },
        }

    new_carry = {
        "last_H3": jnp.concatenate(h3_parts, axis=1),
        "last_s3": jnp.concatenate(s3_parts, axis=1),
    }
    return loss_total, grads_acc, new_batch_stats, new_carry


def _band_scan(
    params, batch_stats, frame, wH3, ws3, factor, ycc, stats, geoms_arr,
    *, slice_h: int, band_h: int, is_wb: bool,
):
    """The band loop as an in-graph lax.scan over the traced geometry rows,
    accumulating loss/grads (and the stats cotangents when stats is not
    None) in the same band order as the host loop, from a zeros init --
    x + 0.0 is exact in f32. Returns (acc, (h3_stk, s3_stk))."""
    h = frame.shape[1]
    add = functools.partial(jax.tree_util.tree_map, jnp.add)
    zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    bn_train = stats is not None

    def body(acc, geom):
        g = (geom[0], geom[1], geom[2])
        if bn_train:
            loss, grads, g_st, H3_b, s3_b = _band_grad_bn(
                params, batch_stats, frame, wH3, ws3, factor, ycc,
                stats, *g,
                slice_h=slice_h, band_h=band_h, full_h=h, is_wb=is_wb,
            )
            l_acc, g_acc, e_acc = acc
            acc = (l_acc + loss, add(g_acc, grads), add(e_acc, g_st))
        else:
            loss, grads, H3_b, s3_b = _band_grad(
                params, batch_stats, frame, wH3, ws3, factor, ycc, *g,
                slice_h=slice_h, band_h=band_h, full_h=h, is_wb=is_wb,
            )
            l_acc, g_acc = acc
            acc = (l_acc + loss, add(g_acc, grads))
        return acc, (H3_b, s3_b)

    loss0 = jnp.zeros((), jnp.float32)
    if bn_train:
        init = (
            loss0, zero_grads,
            jax.tree_util.tree_map(jnp.zeros_like, stats),
        )
    else:
        init = (loss0, zero_grads)
    return jax.lax.scan(body, init, geoms_arr)


def _stack_carry(h3_stk, s3_stk, frame):
    # (bands, B, band_h, W, 3) -> (B, bands*band_h, W, 3): bands partition
    # the rows contiguously in geometry order, so this IS the concat
    b_sz, h, w = frame.shape[0], frame.shape[1], frame.shape[2]
    return {
        "last_H3": jnp.moveaxis(h3_stk, 0, 1).reshape(b_sz, h, w, 3),
        "last_s3": jnp.moveaxis(s3_stk, 0, 1).reshape(b_sz, h, w, 3),
    }


@functools.partial(
    jax.jit,
    static_argnames=("slice_h", "band_h", "of_scale", "raft_iters", "is_wb"),
)
def _fused_spatial_step(
    state: TrainState,
    raft_vars: Any,
    frame: jax.Array,
    is_new_seq: jax.Array,
    geoms_arr: jax.Array,
    lr: jax.Array,
    grad_clip: jax.Array,
    weight_decay: jax.Array,
    *,
    slice_h: int,
    band_h: int,
    of_scale: int,
    raft_iters: int,
    is_wb: bool,
) -> tuple[TrainState, jax.Array]:
    """The whole banded bn_train=False frame step as ONE dispatched program.

    Same arithmetic as spatial_loss_and_grads + _apply_update (the jitted
    pieces inline under this trace; the band loop becomes a lax.scan, see
    _band_scan). Through the axon relay every dispatch costs ~25-40 ms
    regardless of payload; the per-band form pays 1 (flow) + bands (vjp)
    + the epilogue's per-leaf tree adds and optimizer call, all as
    separate host-driven dispatches. Peak memory stays one band's
    backward: the scan body is exactly the per-band vjp graph. Measured
    (one v5e, 1080p bands=2 f32): 1677.0 -> 1518.1 ms/frame same-session.
    """
    wH3, ws3, factor, ycc, _enh_in = _flow_phase(
        state.params, raft_vars, frame, state.carry, is_new_seq,
        of_scale=of_scale, raft_iters=raft_iters, is_wb=is_wb,
    )
    (loss_total, grads_acc), (h3_stk, s3_stk) = _band_scan(
        state.params, state.batch_stats, frame, wH3, ws3, factor, ycc,
        None, geoms_arr, slice_h=slice_h, band_h=band_h, is_wb=is_wb,
    )
    new_params, new_opt_state = _apply_update(
        state.params, state.opt_state, grads_acc, lr, grad_clip,
        weight_decay,
    )
    return (
        TrainState(
            new_params, state.batch_stats, new_opt_state,
            _stack_carry(h3_stk, s3_stk, frame),
        ),
        loss_total,
    )


# ---- bn_train=True fused phases: the single-program form OOMs at 1080p
# bands=2 (measured: 16.86G > 15.75G HBM -- one program holding the flow
# graph, pass A's cached prefixes, the band-scan vjp AND pass C's chain
# recompute keeps too much live at 42% padded utilization), so the exact
# epoch-0 step runs as THREE fused dispatches instead of the per-band
# form's ~40 host-driven ones: [flow + pass A] -> [band scan] -> [pass C
# + optimizer]. Each phase's liveness matches a dispatch that already
# compiled and ran standalone.


@functools.partial(
    jax.jit,
    static_argnames=("slice_h", "of_scale", "raft_iters", "is_wb", "n_el"),
)
def _fused_bn1_prep(
    params, batch_stats, raft_vars, frame, carry, is_new_seq, geoms_arr,
    *, slice_h: int, of_scale: int, raft_iters: int, is_wb: bool, n_el: int,
):
    """Phase 1: full-frame flow/warp + exact pass-A batch stats + the
    torch-semantics running-stats blend, one dispatch."""
    wH3, ws3, factor, ycc, enh_in = _flow_phase(
        params, raft_vars, frame, carry, is_new_seq,
        of_scale=of_scale, raft_iters=raft_iters, is_wb=is_wb,
    )
    stats = _bn_pass_a(
        params["enhance"], enh_in, geoms_arr, slice_h=slice_h, n_el=n_el
    )
    enh_bstats = batch_stats["enhance"]
    rm = enh_bstats["block"]["bn"]["mean"]
    rv = enh_bstats["block"]["bn"]["var"]
    for k in range(3):
        rm = 0.9 * rm + 0.1 * stats[k][0]
        rv = 0.9 * rv + 0.1 * stats[k][1] * (n_el / max(n_el - 1, 1))
    return wH3, ws3, factor, ycc, enh_in, stats, rm, rv


@functools.partial(
    jax.jit, static_argnames=("slice_h", "band_h", "is_wb")
)
def _fused_bn1_scan(
    params, batch_stats, frame, wH3, ws3, factor, ycc, stats, geoms_arr,
    *, slice_h: int, band_h: int, is_wb: bool,
):
    """Phase 2: the stats-as-inputs band vjps as one in-graph scan."""
    return _band_scan(
        params, batch_stats, frame, wH3, ws3, factor, ycc, stats,
        geoms_arr, slice_h=slice_h, band_h=band_h, is_wb=is_wb,
    )


@functools.partial(jax.jit, static_argnames=("slice_h", "n_el"))
def _fused_bn1_final(
    params, opt_state, frame, enh_in, stats, e_stats, grads_acc,
    h3_stk, s3_stk, geoms_arr, lr, grad_clip, weight_decay,
    *, slice_h: int, n_el: int,
):
    """Phase 3: pass C stats->params chain, grad merge, optimizer, carry
    assembly -- one dispatch."""
    add = functools.partial(jax.tree_util.tree_map, jnp.add)
    d_enh = _bn_pass_c(
        params["enhance"], enh_in, stats, e_stats, geoms_arr,
        slice_h=slice_h, n_el=n_el,
    )
    eg = grads_acc["enhance"]
    grads_acc = {
        **grads_acc,
        "enhance": {
            **eg,
            "in_conv": add(eg["in_conv"], d_enh["in_conv"]),
            "block": {
                **eg["block"],
                "conv": add(eg["block"]["conv"], d_enh["block"]["conv"]),
                "bn": {
                    **eg["block"]["bn"],
                    "scale": eg["block"]["bn"]["scale"]
                    + d_enh["block"]["bn"]["scale"],
                    "bias": eg["block"]["bn"]["bias"]
                    + d_enh["block"]["bn"]["bias"],
                },
            },
        },
    }
    new_params, new_opt_state = _apply_update(
        params, opt_state, grads_acc, lr, grad_clip, weight_decay
    )
    return new_params, new_opt_state, _stack_carry(h3_stk, s3_stk, frame)


def _fused_spatial_step_bn(
    state: TrainState,
    raft_vars: Any,
    frame: jax.Array,
    is_new_seq: jax.Array,
    geoms_arr: jax.Array,
    lr: jax.Array,
    grad_clip: jax.Array,
    weight_decay: jax.Array,
    *,
    slice_h: int,
    band_h: int,
    of_scale: int,
    raft_iters: int,
    is_wb: bool,
) -> tuple[TrainState, jax.Array]:
    """The exact epoch-0 (bn_train=True) banded step as THREE fused
    dispatches (see the phase block comment above)."""
    n_el = frame.shape[0] * frame.shape[1] * frame.shape[2]
    wH3, ws3, factor, ycc, enh_in, stats, rm, rv = _fused_bn1_prep(
        state.params, state.batch_stats, raft_vars, frame, state.carry,
        is_new_seq, geoms_arr,
        slice_h=slice_h, of_scale=of_scale, raft_iters=raft_iters,
        is_wb=is_wb, n_el=n_el,
    )
    (loss_total, grads_acc, e_stats), (h3_stk, s3_stk) = _fused_bn1_scan(
        state.params, state.batch_stats, frame, wH3, ws3, factor, ycc,
        stats, geoms_arr, slice_h=slice_h, band_h=band_h, is_wb=is_wb,
    )
    new_params, new_opt_state, new_carry = _fused_bn1_final(
        state.params, state.opt_state, frame, enh_in, stats, e_stats,
        grads_acc, h3_stk, s3_stk, geoms_arr, lr, grad_clip, weight_decay,
        slice_h=slice_h, n_el=n_el,
    )
    new_batch_stats = dict(state.batch_stats)
    new_batch_stats["enhance"] = {"block": {"bn": {"mean": rm, "var": rv}}}
    return (
        TrainState(new_params, new_batch_stats, new_opt_state, new_carry),
        loss_total,
    )


def train_step_spatial(
    state: TrainState,
    raft_vars: Any,
    frame: jax.Array,
    is_new_seq: jax.Array,
    *,
    bands: int = 2,
    halo: int = 32,
    of_scale: int = 3,
    raft_iters: int = 12,
    is_wb: bool = False,
    lr: float = 1e-4,
    grad_clip: float = 5.0,
    weight_decay: float = 3e-4,
    bn_train: bool = False,
    fused: bool = True,
) -> tuple[TrainState, jax.Array]:
    """One zero-shot training frame via per-band gradient accumulation.

    Exactly equivalent to pipeline.train_step (both bn_train modes) up to
    f32 summation order; fits full-res f32-faithful training in one band's
    memory. halo must cover the grad path's receptive field (d1 -> enhancer
    -> d2 -> 21x21 blur stack: ~24 rows; default 32). bn_train=True (the
    reference's epoch-0 schedule, train.py:115-138) runs the exact two-pass
    banded BN (see the two-pass BN block comment above).

    fused=True (default) minimizes dispatched programs -- bn_train=False
    runs the whole frame as ONE (_fused_spatial_step: in-graph band scan +
    optimizer), bn_train=True as THREE (_fused_spatial_step_bn: the
    single-program form OOMs HBM at 1080p, see its block comment) -- same
    arithmetic, same one-band peak backward memory, minus the relay's
    per-dispatch tax on the per-band/epilogue host loop. fused=False keeps
    the per-band dispatch form (smaller individual graphs for compilers
    that reject the fused ones; equivalence-tested against it).
    """
    h = frame.shape[1]
    if h % bands:
        raise ValueError(f"H={h} not divisible by bands={bands}")
    band_h = h // bands
    if band_h % 2 or halo % 2:
        raise ValueError("band height and halo must be even (pair maps)")
    slice_h = min(band_h + 2 * halo, h)

    if fused:
        geoms = []
        for b_i in range(bands):
            own_start = b_i * band_h
            slice_start = min(max(own_start - halo, 0), h - slice_h)
            geoms.append([slice_start, own_start, own_start + band_h])
        step = _fused_spatial_step_bn if bn_train else _fused_spatial_step
        return step(
            state, raft_vars, frame, is_new_seq,
            jnp.asarray(geoms, jnp.int32),
            jnp.asarray(lr), jnp.asarray(grad_clip),
            jnp.asarray(weight_decay),
            slice_h=slice_h, band_h=band_h, of_scale=of_scale,
            raft_iters=raft_iters, is_wb=is_wb,
        )

    loss_total, grads_acc, new_batch_stats, new_carry = spatial_loss_and_grads(
        state, raft_vars, frame, is_new_seq,
        bands=bands, halo=halo, of_scale=of_scale, raft_iters=raft_iters,
        is_wb=is_wb, bn_train=bn_train,
    )
    new_params, new_opt_state = _apply_update(
        state.params, state.opt_state, grads_acc,
        jnp.asarray(lr), jnp.asarray(grad_clip), jnp.asarray(weight_decay),
    )
    return (
        TrainState(new_params, new_batch_stats, new_opt_state, new_carry),
        loss_total,
    )
