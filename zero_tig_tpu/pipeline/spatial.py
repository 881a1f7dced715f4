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
    return wH3, ws3, loss_factor(L2, is_wb=is_wb), _rgb2ycbcr_scrambled(L2)


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


@functools.partial(jax.jit, static_argnames=())
def _apply_update(params, opt_state, grads, lr, grad_clip, weight_decay):
    cfg = Config(lr=lr, grad_clip=grad_clip, weight_decay=weight_decay)
    opt = make_optimizer(cfg)
    updates, new_opt_state = opt.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), new_opt_state


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
) -> tuple[TrainState, jax.Array]:
    """One zero-shot training frame via per-band gradient accumulation.

    Exactly equivalent to pipeline.train_step (bn_train=False) up to f32
    summation order; fits full-res f32-faithful training in one band's
    memory. halo must cover the grad path's receptive field (d1 -> enhancer
    -> d2 -> 21x21 blur stack: ~24 rows; default 32).
    """
    if bn_train:
        raise ValueError(
            "train_step_spatial requires bn_train=False: train-mode "
            "BatchNorm reduces over the full frame WITH gradients and "
            "cannot be split into bands (see module docstring)"
        )
    h = frame.shape[1]
    if h % bands:
        raise ValueError(f"H={h} not divisible by bands={bands}")
    band_h = h // bands
    if band_h % 2 or halo % 2:
        raise ValueError("band height and halo must be even (pair maps)")
    slice_h = min(band_h + 2 * halo, h)

    wH3, ws3, factor, ycc = _flow_phase(
        state.params, raft_vars, frame, state.carry, is_new_seq,
        of_scale=of_scale, raft_iters=raft_iters, is_wb=is_wb,
    )

    loss_total = jnp.zeros((), jnp.float32)
    grads_acc = None
    h3_parts, s3_parts = [], []
    for b_i in range(bands):
        own_start = b_i * band_h
        slice_start = min(max(own_start - halo, 0), h - slice_h)
        loss, grads, H3_b, s3_b = _band_grad(
            state.params, state.batch_stats, frame, wH3, ws3, factor, ycc,
            jnp.asarray(slice_start), jnp.asarray(own_start),
            jnp.asarray(own_start + band_h),
            slice_h=slice_h, band_h=band_h, full_h=h, is_wb=is_wb,
        )
        loss_total = loss_total + loss
        grads_acc = (
            grads if grads_acc is None
            else jax.tree_util.tree_map(jnp.add, grads_acc, grads)
        )
        h3_parts.append(H3_b)
        s3_parts.append(s3_b)

    new_params, new_opt_state = _apply_update(
        state.params, state.opt_state, grads_acc,
        jnp.asarray(lr), jnp.asarray(grad_clip), jnp.asarray(weight_decay),
    )
    new_carry = {
        "last_H3": jnp.concatenate(h3_parts, axis=1),
        "last_s3": jnp.concatenate(s3_parts, axis=1),
    }
    return (
        TrainState(new_params, state.batch_stats, new_opt_state, new_carry),
        loss_total,
    )
