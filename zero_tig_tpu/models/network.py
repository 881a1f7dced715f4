"""The composed Zero-TIG network: denoise -> (flow+warp) -> enhance -> refine.

Parity: ``Network`` (training forward, model/model.py:84-259) and
``Finetunemodel`` (inference forward, model/model.py:262-384), re-designed as
pure functions:

    forward_train(variables, raft_vars, frame, carry, is_new_seq) ->
        (TrainOutputs, new_batch_stats)
    forward_inference(variables, raft_vars, frame, carry, is_new_seq) ->
        (H2, H3, s3)

where ``carry = {'last_H3', 'last_s3'}`` replaces the reference's mutable
module attributes (model/model.py:99-103) and ``is_new_seq`` is a traced bool
(jnp.where select), so a single jitted graph serves every frame.

Gradient-stop placement mirrors the reference ``.detach()`` calls exactly:
the enhancer input (model/model.py:168), the H*_pred anchor terms
(model/model.py:179,184,189), and the whole flow+warp branch
(torch.no_grad(), model/model.py:243-245).
"""

from __future__ import annotations

import functools
import warnings
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..ops.equalize import equalize01
from ..ops.filters import (
    blur,
    blur_wminor,
    pair_downsampler,
    texture_difference,
)
from ..ops.resize import resize_bilinear
from ..ops.warp import warp_tensor
from .denoise import Denoise1, Denoise2
from .enhancer import Enhancer
from .raft.raft import raft_forward

EPS = 1e-4

ENHANCER = Enhancer(layers=3, channels=64)
DENOISE_1 = Denoise1(chan_embed=48)
DENOISE_2 = Denoise2(chan_embed=48)


class TrainOutputs(NamedTuple):
    """The reference's 23-tuple forward output (model/model.py:203).

    color_blur_diff (optional, fast loss tail only): blur(sg(H1) - H3) in
    W-minor (B, 3, H, W) layout. Blur is linear and the reference detaches
    blur(H1) (loss.py:64), so MSE(blur(H1).detach(), blur(H3)) ==
    mean(color_blur_diff^2) with the IDENTICAL gradient -- one full-res
    21x21 blur instead of two. When set, H2_blur/H3_blur are None and the
    loss consumes only this field (core.precision.set_loss_tail)."""

    L_pred1: jax.Array
    L_pred2: jax.Array
    L2: jax.Array
    s2: jax.Array
    s21: jax.Array
    s22: jax.Array
    H2: jax.Array
    H11: jax.Array
    H12: jax.Array
    H13: jax.Array
    s13: jax.Array
    H14: jax.Array
    s14: jax.Array
    H3: jax.Array
    s3: jax.Array
    H3_pred: jax.Array
    H4_pred: jax.Array
    L_pred1_L_pred2_diff: jax.Array
    H3_denoised1_H3_denoised2_diff: jax.Array
    H2_blur: jax.Array | None
    H3_blur: jax.Array | None
    H3_denoised1: jax.Array
    H3_denoised2: jax.Array
    color_blur_diff: jax.Array | None = None


def init_network_variables(key: jax.Array, h: int = 64, w: int = 64) -> dict:
    """Init {'params': {enhance, denoise_1, denoise_2}, 'batch_stats': ...}.

    Denoisers keep torch-default conv init; the enhancer is then re-drawn
    with the reference custom init (see reinit_enhancer) by train.py, exactly
    like train.py:82-84.
    """
    k1, k2, k3 = jax.random.split(key, 3)
    dummy9 = jnp.zeros((1, h, w, 9), jnp.float32)
    dummy3 = jnp.zeros((1, h, w, 3), jnp.float32)
    dummy12 = jnp.zeros((1, h, w, 12), jnp.float32)
    enh = ENHANCER.init(k1, dummy9, use_running_average=False)
    d1 = DENOISE_1.init(k2, dummy3)
    d2 = DENOISE_2.init(k3, dummy12)
    return {
        "params": {
            "enhance": enh["params"],
            "denoise_1": d1["params"],
            "denoise_2": d2["params"],
        },
        "batch_stats": {"enhance": enh["batch_stats"]},
    }


def reinit_enhancer(key: jax.Array, params: dict) -> dict:
    """Reference enhancer init (model/model.py:123-130, train.py:82-84):
    conv kernels ~ N(0, 0.02), conv biases = 0, BN scale ~ N(1, 0.02)."""
    flat = jax.tree_util.tree_flatten_with_path(params["enhance"])[0]
    new_enh = params["enhance"]

    leaves = {jax.tree_util.keystr(p): v for p, v in flat}
    keys = jax.random.split(key, len(leaves))
    out = {}
    for i, (path, v) in enumerate(sorted(leaves.items())):
        if path.endswith("['kernel']"):
            out[path] = 0.02 * jax.random.normal(keys[i], v.shape, v.dtype)
        elif "['bn']" in path and path.endswith("['scale']"):
            out[path] = 1.0 + 0.02 * jax.random.normal(keys[i], v.shape, v.dtype)
        elif path.endswith("['bias']"):
            out[path] = jnp.zeros_like(v)
        else:
            out[path] = v

    def rebuild(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: rebuild(v, prefix + f"['{k}']") for k, v in tree.items()}
        return out[prefix]

    new_enh = rebuild(params["enhance"])
    return {**params, "enhance": new_enh}


def update_cache(
    raft_vars: Any,
    last_H3: jax.Array,
    last_s3: jax.Array,
    L2: jax.Array,
    *,
    of_scale: int = 3,
    raft_iters: int = 12,
    emit: str = "nhwc",
) -> tuple[jax.Array, jax.Array] | jax.Array:
    """Flow from previous output to current frame, then backward warp.

    Parity: model/model.py:221-259. Runs entirely under stop_gradient
    (reference: torch.no_grad() around RAFT; warped tensors feed detached
    paths only).

    emit="packed" (fast mode, even H/W) returns ONE packed-pair tensor
    (B, H, W/2, 12) -- pack2 order [p0(H3, s3) | p1(H3, s3)] -- straight
    from the block gather, for packed-glue consumers (no NHWC round trip).
    """
    ht_org, wd_org = last_H3.shape[-3], last_H3.shape[-2]
    ht, wd = ht_org // of_scale, wd_org // of_scale
    last_tmp = resize_bilinear(last_H3, (ht, wd), align_corners=False)
    l2_tmp = resize_bilinear(L2, (ht, wd), align_corners=False)

    last_tmp = last_tmp * 255.0  # NOT equalized (model/model.py:230-232)
    l2_tmp = equalize01(l2_tmp)  # equalized   (model/model.py:234)

    _, flow_up = raft_forward(raft_vars, last_tmp, l2_tmp, iters=raft_iters)
    # both tensors share the flow grid: one fused 6-channel warp halves the
    # gather traffic vs the reference's two warp_tensor calls
    # (model/model.py:249-250); results identical per channel
    if emit == "packed":
        warped, _ = warp_tensor(
            flow_up, jnp.concatenate([last_H3, last_s3], axis=-1),
            emit="packed",
        )
        return jax.lax.stop_gradient(warped)
    warped, _ = warp_tensor(
        flow_up, jnp.concatenate([last_H3, last_s3], axis=-1)
    )
    warped = jax.lax.stop_gradient(warped)
    return warped[..., :3], warped[..., 3:]


def forward_train(
    variables: dict,
    raft_vars: Any,
    frame: jax.Array,
    carry: dict,
    is_new_seq: jax.Array,
    *,
    of_scale: int = 3,
    raft_iters: int = 12,
    bn_train: bool = True,
    warped: tuple[jax.Array, jax.Array] | None = None,
) -> tuple[TrainOutputs, dict, dict]:
    """Full training forward. Returns (outputs, new_batch_stats, new_carry).

    frame: (B, H, W, 3) in [0, 1]. carry: {'last_H3','last_s3'} same shape.
    is_new_seq: traced bool -- when True the warped previous state is zeroed
    (model/model.py:155-161).

    bn_train: reference schedule quirk (train.py:115-138): ``model.train()``
    runs once before the epoch loop and ``model.eval()`` -- called for the
    per-epoch image dump -- is never reverted, so only EPOCH 0 trains with
    batch-statistics BatchNorm; epochs >= 1 train against frozen running
    stats. Pass bn_train=(epoch == 0) for bug-faithful training.

    warped: optional precomputed (warped_H3, warped_s3) pair -- the raw
    update_cache outputs, computed in a SEPARATE dispatch (the flow phase
    is gradient-free, reference torch.no_grad, so splitting it off is
    semantics-preserving; pipeline.train_step_split uses this to keep the
    warp's patchify gather table out of the value_and_grad graph, where
    XLA's layout assignment materializes it through a channel-major
    zero-fill loop). None = compute update_cache inline (the default
    single-program step).
    """
    from ..core.precision import get_mode, get_xpack_train

    if (
        get_mode() == "fast"
        and get_xpack_train()
        and frame.shape[1] % 2 == 0
        and frame.shape[2] % 4 == 0
    ):
        return _forward_train_xpack(
            variables, raft_vars, frame, carry, is_new_seq,
            of_scale=of_scale, raft_iters=raft_iters, bn_train=bn_train,
            warped=warped,
        )
    params = variables["params"]
    sg = jax.lax.stop_gradient

    inp = frame + EPS
    if warped is not None:
        warped_H3, warped_s3 = warped
        L2_flow = warped_H3  # any same-shaped tensor: only zeros_like below
    else:
        L2_flow = jnp.clip(
            inp - DENOISE_1.apply({"params": params["denoise_1"]}, inp),
            EPS, 1.0,
        )
        warped_H3, warped_s3 = update_cache(
            raft_vars,
            carry["last_H3"],
            carry["last_s3"],
            sg(L2_flow),
            of_scale=of_scale,
            raft_iters=raft_iters,
        )
    zero = jnp.zeros_like(L2_flow)
    new_flag = jnp.reshape(is_new_seq, (-1, 1, 1, 1))  # scalar or per-scene
    last_H3_wp = jnp.where(new_flag, zero, warped_H3)
    last_s3_wp = jnp.where(new_flag, zero, warped_s3)
    return forward_train_core(
        variables, frame, last_H3_wp, last_s3_wp, bn_train=bn_train
    )


def train_flow_phase(
    variables: dict,
    raft_vars: Any,
    frame: jax.Array,
    carry: dict,
    *,
    of_scale: int = 3,
    raft_iters: int = 12,
) -> tuple[jax.Array, jax.Array]:
    """The gradient-free flow+warp prefix of forward_train, standalone.

    Returns the raw update_cache outputs (warped_H3, warped_s3) exactly as
    the in-graph step computes them (including the packed-d1 L2 when the
    xpack train path would dispatch), so
    ``forward_train(..., warped=train_flow_phase(...))`` reproduces the
    single-program step. Dispatching this as its own program keeps the
    warp's patchify gather table in an inference-like graph where XLA
    fuses it into one pass (pipeline.train_step_split).
    Parity: the torch.no_grad flow block, model/model.py:221-259.
    """
    from ..core.precision import get_mode, get_xpack_train

    params = variables["params"]
    if (
        get_mode() == "fast"
        and get_xpack_train()
        and frame.shape[1] % 2 == 0
        and frame.shape[2] % 4 == 0
    ):
        from ..ops.xpack import pack2, unpack2
        from .xla_fastpath import denoise1_xp, precompute_train

        pre = precompute_train(params)
        inp = (frame + EPS).astype(jnp.bfloat16)
        r = unpack2(
            denoise1_xp(
                {"d1": pre["d1"]},
                pack2(jnp.pad(inp, ((0, 0), (0, 0), (0, 0), (0, 1)))),
            )
        )[..., :3]
        L2 = jnp.clip(inp - r, EPS, 1.0)
        return update_cache(
            raft_vars,
            carry["last_H3"].astype(jnp.bfloat16),
            carry["last_s3"].astype(jnp.bfloat16),
            jax.lax.stop_gradient(L2),
            of_scale=of_scale,
            raft_iters=raft_iters,
        )
    inp = frame + EPS
    L2_flow = jnp.clip(
        inp - DENOISE_1.apply({"params": params["denoise_1"]}, inp), EPS, 1.0
    )
    return update_cache(
        raft_vars,
        carry["last_H3"],
        carry["last_s3"],
        jax.lax.stop_gradient(L2_flow),
        of_scale=of_scale,
        raft_iters=raft_iters,
    )


def forward_train_core(
    variables: dict,
    frame: jax.Array,
    last_H3_wp: jax.Array,
    last_s3_wp: jax.Array,
    *,
    bn_train: bool = True,
    bn_overrides=None,
    loss_tail: str | None = None,
) -> tuple[TrainOutputs, dict, dict]:
    """Gradient-carrying part of the training forward, AFTER flow+warp.

    Everything from here down is spatially local (conv stacks + pointwise
    ops); the global pieces (RAFT, histogram equalize, warp) live in
    forward_train/update_cache and run under stop_gradient. The spatial
    gradient-accumulation step (pipeline.train_step_spatial) exploits this
    split: flow+warp once on the full frame, then this core per row band.
    """
    params, batch_stats = variables["params"], variables["batch_stats"]
    sg = jax.lax.stop_gradient

    inp = frame + EPS
    L11, L12 = pair_downsampler(inp)

    # remat the conv stacks (core.precision.set_remat): at 1080p each
    # 48/64-channel activation is ~0.4 GB and the un-checkpointed f32
    # backward needs ~19 GB > 16 GB HBM; recomputing the cheap convs in the
    # backward trades flops for fitting the fused train step on one chip
    from ..core.precision import get_remat

    maybe_ckpt = jax.checkpoint if get_remat() else (lambda f: f)
    d1 = maybe_ckpt(lambda p, x: DENOISE_1.apply({"params": p}, x))
    d2 = maybe_ckpt(lambda p, x: DENOISE_2.apply({"params": p}, x))
    d1 = functools.partial(d1, params["denoise_1"])
    d2 = functools.partial(d2, params["denoise_2"])

    L_pred1 = L11 - d1(L11)
    L_pred2 = L12 - d1(L12)
    L2 = jnp.clip(inp - d1(inp), EPS, 1.0)

    last_H31_wp, last_H32_wp = pair_downsampler(last_H3_wp)
    last_s31_wp, last_s32_wp = pair_downsampler(last_s3_wp)

    enh_in = sg(jnp.concatenate([last_H3_wp, last_s3_wp, L2], axis=-1))
    enh_vars = {"params": params["enhance"], "batch_stats": batch_stats["enhance"]}
    if bn_overrides is not None:
        # spatial two-pass train-mode BN: full-frame batch stats supplied
        # as (differentiable) inputs; running stats updated by the caller
        s2 = maybe_ckpt(
            lambda v, x, ov: ENHANCER.apply(
                v, x, use_running_average=True, bn_overrides=ov
            )
        )(enh_vars, enh_in, tuple(bn_overrides))
        new_batch_stats = batch_stats
    elif bn_train:
        s2, mut = maybe_ckpt(
            lambda v, x: ENHANCER.apply(
                v, x, use_running_average=False, mutable=["batch_stats"]
            )
        )(enh_vars, enh_in)
        new_batch_stats = {"enhance": mut["batch_stats"]}
    else:
        s2 = maybe_ckpt(
            lambda v, x: ENHANCER.apply(v, x, use_running_average=True)
        )(enh_vars, enh_in)
        new_batch_stats = batch_stats

    s21, s22 = pair_downsampler(s2)
    H2 = jnp.clip(inp / s2, EPS, 1.0)
    H11 = jnp.clip(L11 / s21, EPS, 1.0)
    H12 = jnp.clip(L12 / s22, EPS, 1.0)

    H3_pred = jnp.clip(
        sg(jnp.concatenate([H11, s21], -1))
        - d2(jnp.concatenate([last_H31_wp, last_s31_wp, H11, s21], -1)),
        EPS,
        1.0,
    )
    H13, s13 = H3_pred[..., :3], H3_pred[..., 3:]

    H4_pred = jnp.clip(
        sg(jnp.concatenate([H12, s22], -1))
        - d2(jnp.concatenate([last_H32_wp, last_s32_wp, H12, s22], -1)),
        EPS,
        1.0,
    )
    H14, s14 = H4_pred[..., :3], H4_pred[..., 3:]

    H5_pred = jnp.clip(
        sg(jnp.concatenate([H2, s2], -1))
        - d2(jnp.concatenate([last_H3_wp, last_s3_wp, H2, s2], -1)),
        EPS,
        1.0,
    )
    H3, s3 = H5_pred[..., :3], H5_pred[..., 3:]

    L_diff = texture_difference(L_pred1, L_pred2)
    H3_denoised1, H3_denoised2 = pair_downsampler(H3)
    H3_diff = texture_difference(H3_denoised1, H3_denoised2)

    H1 = jnp.clip(L2 / s2, 0.0, 1.0)
    from ..core.precision import get_loss_tail

    if (loss_tail or get_loss_tail()) == "wminor":
        # single-blur Color tail (see TrainOutputs.color_blur_diff): blur
        # is linear, blur(H1) is detached by the loss, so one W-minor blur
        # of the difference is value- and gradient-identical to two blurs
        H2_blur = H3_blur = None
        color_blur_diff = blur_wminor(
            jnp.transpose(sg(H1) - H3, (0, 3, 1, 2)).astype(jnp.float32)
        )
    else:
        H2_blur = blur(H1)
        H3_blur = blur(H3)
        color_blur_diff = None

    outputs = TrainOutputs(
        L_pred1, L_pred2, L2, s2, s21, s22, H2, H11, H12, H13, s13, H14, s14,
        H3, s3, H3_pred, H4_pred, L_diff, H3_diff, H2_blur, H3_blur,
        H3_denoised1, H3_denoised2, color_blur_diff,
    )
    new_carry = {"last_H3": sg(H3), "last_s3": sg(s3)}
    return outputs, new_batch_stats, new_carry


def _forward_train_xpack(
    variables: dict,
    raft_vars: Any,
    frame: jax.Array,
    carry: dict,
    is_new_seq: jax.Array,
    *,
    of_scale: int,
    raft_iters: int,
    bn_train: bool,
    warped: tuple[jax.Array, jax.Array] | None = None,
) -> tuple[TrainOutputs, dict, dict]:
    """The fast-mode TRAINING forward on the packed-pair layout
    (precision.set_xpack_train): bf16 activations/glue throughout and the
    three conv stacks as packed-layout XLA convs INSIDE the value_and_grad
    graph -- the training analogue of _forward_inference_xpack.

    Same math / detach / quirk structure as forward_train +
    forward_train_core (Parity: Network.forward, model/model.py:84-259):
    stop_gradient on the enhancer input, the H*_pred anchors, and the whole
    flow+warp branch; the epoch-0-only BN schedule via bn_train. Weight
    packing (xla_fastpath.precompute_train) is differentiable, so
    d(loss)/d(original params) flows through the packing concats; packed
    products are identical to the unpacked fast path up to bf16
    accumulation order (glue here is bf16 where the unpacked fast path
    promotes to f32 -- the halved-traffic operating point; gated by
    tests/test_xpack_train.py trajectory equivalence). The analysis tail
    feeding the loss (texture masks, blurs, the H3 pair-downsamples) runs
    in f32 exactly like the unpacked path.
    """
    from ..core.precision import get_remat
    from ..ops.xpack import cat_packed, pack2, unpack2
    from .xla_fastpath import (
        denoise1_xp,
        denoise2_xp,
        enhancer_xp_train,
        precompute_train,
    )

    params, batch_stats = variables["params"], variables["batch_stats"]
    sg = jax.lax.stop_gradient
    pre = precompute_train(params)
    maybe_ckpt = jax.checkpoint if get_remat() else (lambda f: f)

    _d1 = maybe_ckpt(
        lambda pd, x: unpack2(
            denoise1_xp(
                {"d1": pd},
                pack2(jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))),
            )
        )[..., :3]
    )
    d1 = functools.partial(_d1, pre["d1"])
    _d2 = maybe_ckpt(
        lambda pd, x: unpack2(denoise2_xp({"d2": pd}, pack2(x)))
    )
    d2 = functools.partial(_d2, pre["d2"])
    _d1p = maybe_ckpt(lambda pd, xp: denoise1_xp({"d1": pd}, xp))
    _d2p = maybe_ckpt(lambda pd, xp: denoise2_xp({"d2": pd}, xp))

    def lane6(t8):
        # drop the 8-lane pad channel of each pixel half: [p0 c0..c2 |
        # p1 c0..c2] -- a lane shuffle XLA folds, not a spatial relayout
        return jnp.concatenate([t8[..., 0:3], t8[..., 4:7]], axis=-1)

    inp = (frame + EPS).astype(jnp.bfloat16)
    L11, L12 = pair_downsampler(inp)
    L_pred1 = L11 - d1(L11)
    L_pred2 = L12 - d1(L12)

    # full-res chain on PACKED operands end to end: same elements as the
    # unpacked glue (elementwise ops commute with the layout), no unpacked
    # full-res concats, and the (wH3, ws3) pair packs ONCE instead of
    # inside both the enhancer and d2 input packs
    inp_p8 = pack2(jnp.pad(inp, ((0, 0), (0, 0), (0, 0), (0, 1))))
    inp_p = lane6(inp_p8)
    L2_p = jnp.clip(inp_p - lane6(_d1p(pre["d1"], inp_p8)), EPS, 1.0)
    L2 = unpack2(L2_p)

    if warped is not None:
        warped_H3, warped_s3 = warped
    else:
        warped_H3, warped_s3 = update_cache(
            raft_vars,
            carry["last_H3"].astype(jnp.bfloat16),
            carry["last_s3"].astype(jnp.bfloat16),
            sg(L2),
            of_scale=of_scale,
            raft_iters=raft_iters,
        )
    w6 = jnp.concatenate([warped_H3, warped_s3], axis=-1).astype(jnp.bfloat16)
    new_flag = jnp.reshape(is_new_seq, (-1, 1, 1, 1))  # scalar or per-scene
    w6 = jnp.where(new_flag, jnp.zeros_like(w6), w6)
    last_H3_wp, last_s3_wp = w6[..., :3], w6[..., 3:]
    w6_p = pack2(w6)

    last_H31_wp, last_H32_wp = pair_downsampler(last_H3_wp)
    last_s31_wp, last_s32_wp = pair_downsampler(last_s3_wp)

    enh_in_p = sg(cat_packed([w6_p, L2_p]))
    _enh = maybe_ckpt(
        lambda ep, es, xp: enhancer_xp_train(ep, es, xp, bn_train=bn_train)
    )
    s2_p, new_bn = _enh(params["enhance"], batch_stats["enhance"], enh_in_p)
    s2 = unpack2(s2_p)
    new_batch_stats = {"enhance": new_bn} if bn_train else batch_stats

    s21, s22 = pair_downsampler(s2)
    H2 = jnp.clip(inp / s2, EPS, 1.0)  # unpacked twin of H2_p: same elements
    H11 = jnp.clip(L11 / s21, EPS, 1.0)
    H12 = jnp.clip(L12 / s22, EPS, 1.0)

    H3_pred = jnp.clip(
        sg(jnp.concatenate([H11, s21], -1))
        - d2(jnp.concatenate([last_H31_wp, last_s31_wp, H11, s21], -1)),
        EPS,
        1.0,
    )
    H4_pred = jnp.clip(
        sg(jnp.concatenate([H12, s22], -1))
        - d2(jnp.concatenate([last_H32_wp, last_s32_wp, H12, s22], -1)),
        EPS,
        1.0,
    )
    H2_p = jnp.clip(inp_p / s2_p, EPS, 1.0)
    H5_pred = unpack2(
        jnp.clip(
            sg(cat_packed([H2_p, s2_p]))
            - _d2p(pre["d2"], cat_packed([w6_p, H2_p, s2_p])),
            EPS,
            1.0,
        )
    )

    # boundary to the loss: f32, like the unpacked fast path's glue -- the
    # texture masks (0.975 threshold), blurs and loss reductions keep f32
    # resolution
    f32 = lambda t: t.astype(jnp.float32)
    L_pred1, L_pred2, L2 = f32(L_pred1), f32(L_pred2), f32(L2)
    s2, s21, s22 = f32(s2), f32(s21), f32(s22)
    H2, H11, H12 = f32(H2), f32(H11), f32(H12)
    H3_pred, H4_pred = f32(H3_pred), f32(H4_pred)
    H13, s13 = H3_pred[..., :3], H3_pred[..., 3:]
    H14, s14 = H4_pred[..., :3], H4_pred[..., 3:]
    H3, s3 = f32(H5_pred[..., :3]), f32(H5_pred[..., 3:])

    L_diff = texture_difference(L_pred1, L_pred2)
    H3_denoised1, H3_denoised2 = pair_downsampler(H3)
    H3_diff = texture_difference(H3_denoised1, H3_denoised2)

    H1 = jnp.clip(L2 / s2, 0.0, 1.0)
    from ..core.precision import get_loss_tail

    if get_loss_tail() == "wminor":
        H2_blur = H3_blur = None
        color_blur_diff = blur_wminor(
            jnp.transpose(sg(H1) - H3, (0, 3, 1, 2))
        )
    else:
        H2_blur = blur(H1)
        H3_blur = blur(H3)
        color_blur_diff = None

    outputs = TrainOutputs(
        L_pred1, L_pred2, L2, s2, s21, s22, H2, H11, H12, H13, s13, H14, s14,
        H3, s3, H3_pred, H4_pred, L_diff, H3_diff, H2_blur, H3_blur,
        H3_denoised1, H3_denoised2, color_blur_diff,
    )
    new_carry = {"last_H3": sg(H3), "last_s3": sg(s3)}
    return outputs, new_batch_stats, new_carry


def forward_inference(
    variables: dict,
    raft_vars: Any,
    frame: jax.Array,
    carry: dict,
    is_new_seq: jax.Array,
    *,
    of_scale: int = 3,
    raft_iters: int = 12,
    enh_scale: int = 1,
    xpack_pre: dict | None = None,
) -> tuple[tuple[jax.Array, jax.Array, jax.Array], dict]:
    """Inference forward. Parity: Finetunemodel.forward (model/model.py:312-340).

    xpack_pre: optional packed-weight pytree from xpack_precompute --
    scan-based callers (pipeline.predict_chunk) hoist the weight packing
    out of their loop body by passing it; None packs inline.

    Quirk preserved: on a new sequence the refiner's "warped previous" input
    is H2 itself, not zeros (model/model.py:330-332). BatchNorm runs in eval
    mode (running statistics). Returns ((H2, H3, s3), new_carry).

    enh_scale: fast-operating-point knob -- run the illumination estimator
    at 1/enh_scale resolution and bilinearly upsample s2 (the TV- and
    smoothness-regularized illumination map is low-frequency by
    construction, loss.py:48-49). enh_scale=1 is exact reference
    semantics; >1 must pass tools/quality_gate.py like every fast-mode
    approximation. The denoisers always run at full resolution.
    """
    params, batch_stats = variables["params"], variables["batch_stats"]

    # fast mode: the whole inference forward computes on bf16 tensors.
    # 1080p small-C NHWC arrays lane-pad 3->128 on TPU, so every f32
    # elementwise materialization costs ~42x its logical bytes; bf16 halves
    # that and matches the convs' compute dtype. Outputs/carry are cast
    # back to f32 (external contract; scan carry dtype stability).
    from ..core.precision import get_mode, get_pack_conv, get_xpack

    fast = get_mode() == "fast"
    h, w = frame.shape[1], frame.shape[2]
    if (
        fast
        and get_pack_conv()
        and enh_scale == 1
        and frame.shape[0] == 1
        and h % 2 == 0
        and w % 2 == 0
    ):
        # experimental Pallas packed-pair path (ops/pack_conv.py) -- wins
        # per-kernel, loses end-to-end to custom-call boundaries; opt-in
        return _forward_inference_packed(
            variables, raft_vars, frame, carry, is_new_seq,
            of_scale=of_scale, raft_iters=raft_iters,
        )
    if fast and get_xpack() and enh_scale == 1 and w % 2 == 0:
        # packed-pair LAYOUT on selected conv stacks, plain XLA convs
        # (ops/xpack.py, models/xla_fastpath.py). Default all three
        # (d1 8-lane-padded): 65.7 -> 50.9 ms/frame at 1080p chunk-32
        # (see precision.set_xpack docstring)
        return _forward_inference_xpack(
            variables, raft_vars, frame, carry, is_new_seq,
            of_scale=of_scale, raft_iters=raft_iters, pre=xpack_pre,
        )

    d1 = lambda x: DENOISE_1.apply({"params": params["denoise_1"]}, x)
    d2 = lambda x: DENOISE_2.apply({"params": params["denoise_2"]}, x)
    enh = lambda x: ENHANCER.apply(
        {"params": params["enhance"], "batch_stats": batch_stats["enhance"]},
        x,
        use_running_average=True,
    )

    cdt = jnp.bfloat16 if fast else frame.dtype
    inp = (frame + EPS).astype(cdt)
    carry = {
        "last_H3": carry["last_H3"].astype(cdt),
        "last_s3": carry["last_s3"].astype(cdt),
    }
    L2 = jnp.clip(inp - d1(inp), EPS, 1.0)

    warped_H3, warped_s3 = update_cache(
        raft_vars,
        carry["last_H3"],
        carry["last_s3"],
        L2,
        of_scale=of_scale,
        raft_iters=raft_iters,
    )
    zero = jnp.zeros_like(L2)
    new_flag = jnp.reshape(is_new_seq, (-1, 1, 1, 1))  # scalar or per-scene
    last_H3_wp = jnp.where(new_flag, zero, warped_H3)
    last_s3_wp = jnp.where(new_flag, zero, warped_s3)

    enh_in = jnp.concatenate([last_H3_wp, last_s3_wp, L2], axis=-1)
    if enh_scale > 1 and (h % enh_scale != 0 or w % enh_scale != 0):
        # shapes are static at trace time, so this fires once per program
        warnings.warn(
            f"enh_scale={enh_scale} requested but frame {h}x{w} is not "
            f"divisible by it; running the exact full-resolution enhancer "
            f"instead (the benchmark point you measure is NOT the half-res "
            f"one)",
            stacklevel=2,
        )
    if enh_scale > 1 and h % enh_scale == 0 and w % enh_scale == 0:
        small = resize_bilinear(
            enh_in, (h // enh_scale, w // enh_scale), align_corners=False
        )
        s2 = resize_bilinear(enh(small), (h, w), align_corners=False)
    else:
        s2 = enh(enh_in)
    H2 = jnp.clip(inp / s2, EPS, 1.0)

    last_H3_wp = jnp.where(new_flag, H2, last_H3_wp)
    last_s3_wp = jnp.where(new_flag, H2, last_s3_wp)

    H5_pred = jnp.clip(
        jnp.concatenate([H2, s2], -1)
        - d2(jnp.concatenate([last_H3_wp, last_s3_wp, H2, s2], -1)),
        EPS,
        1.0,
    )
    H3, s3 = H5_pred[..., :3], H5_pred[..., 3:]
    H2 = H2.astype(jnp.float32)
    H3 = H3.astype(jnp.float32)
    s3 = s3.astype(jnp.float32)
    new_carry = {"last_H3": H3, "last_s3": s3}
    return (H2, H3, s3), new_carry


def xpack_precompute(
    variables: dict,
    width: int,
    enh_scale: int = 1,
    batch: int = 1,
    height: int = 0,
) -> dict | None:
    """Packed-pair weights for the xpack fast path, or None when the path
    won't dispatch (mirrors forward_inference's FULL routing condition,
    including the pack_conv sub-gates: when set_pack_conv(True) is requested
    but its batch==1 / even-H gate fails, forward_inference falls back to
    xpack and the precomputed weights ARE needed).
    Chunked callers call this OUTSIDE their scan body and pass the pytree
    down so the packing is explicitly once-per-program (XLA's loop-invariant
    code motion also handles inline packing -- measured identical -- but
    explicit is structural hygiene, not a trust exercise)."""
    from ..core.precision import get_mode, get_pack_conv, get_xpack
    from .xla_fastpath import precompute

    parts = get_xpack()
    pack_conv_dispatches = (
        get_pack_conv()
        and enh_scale == 1
        and batch == 1
        and height % 2 == 0
        and width % 2 == 0
    )
    if (
        get_mode() == "fast"
        and parts
        and not pack_conv_dispatches
        and enh_scale == 1
        and width % 2 == 0
    ):
        return precompute(
            variables["params"], variables["batch_stats"], parts
        )
    return None


def _forward_inference_xpack(
    variables: dict,
    raft_vars: Any,
    frame: jax.Array,
    carry: dict,
    is_new_seq: jax.Array,
    *,
    of_scale: int,
    raft_iters: int,
    pre: dict | None = None,
) -> tuple[tuple[jax.Array, jax.Array, jax.Array], dict]:
    """forward_inference with a configurable subset of the conv stacks on
    the XLA packed-pair layout (B, H, W/2, 2C) -- precision.set_xpack.

    Same math/detach/quirk structure as forward_inference (Parity:
    Finetunemodel.forward, model/model.py:312-340). pack2/unpack2 at the
    stack boundaries are contiguous (W, C)-merge reshapes -- bitcasts in
    row-major NHWC, so per-stack packing costs nothing at the seams.
    SAME-padded packed convs reproduce zero-padded conv semantics exactly.
    """
    from ..core.precision import get_xpack
    from .xla_fastpath import precompute

    parts = get_xpack()
    if pre is None:
        pre = precompute(variables["params"], variables["batch_stats"], parts)

    inp, L2 = _xpack_d1_prep(variables, frame, parts, pre)
    return _xpack_flow_enhance(
        variables, raft_vars, inp, L2, carry, is_new_seq,
        of_scale=of_scale, raft_iters=raft_iters, parts=parts, pre=pre,
    )


def _xpack_d1_prep(
    variables: dict, frame: jax.Array, parts, pre: dict | None
) -> tuple[jax.Array, jax.Array]:
    """Stage A of the xpack inference step: eps-shift + Denoise_1 -> L2.

    Depends ONLY on the frame (not the recurrent carry), so a pipelined
    chunk can compute frame t+1's stage A concurrently with frame t's
    stage B (pipeline.predict_chunk_pipelined)."""
    from ..ops.xpack import pack2, unpack2
    from .xla_fastpath import denoise1_xp

    params = variables["params"]
    inp = (frame + EPS).astype(jnp.bfloat16)
    if "d1" in parts:
        # 4th input channel zero-padded so every packed tensor is a
        # multiple of 8 lanes (xla_fastpath._pack_denoise); the padded
        # residual channel is sliced away after unpacking
        inp4_p = pack2(jnp.pad(inp, ((0, 0), (0, 0), (0, 0), (0, 1))))
        r = unpack2(denoise1_xp(pre, inp4_p))[..., :3]
        L2 = jnp.clip(inp - r, EPS, 1.0)
    else:
        d1 = lambda x: DENOISE_1.apply({"params": params["denoise_1"]}, x)
        L2 = jnp.clip(inp - d1(inp), EPS, 1.0)
    return inp, L2


def _xpack_flow_enhance(
    variables: dict,
    raft_vars: Any,
    inp: jax.Array,
    L2: jax.Array,
    carry: dict,
    is_new_seq: jax.Array,
    *,
    of_scale: int,
    raft_iters: int,
    parts,
    pre: dict | None,
) -> tuple[tuple[jax.Array, jax.Array, jax.Array], dict]:
    """Stage B of the xpack inference step: flow + warp + enhancer +
    Denoise_2, from a precomputed (inp, L2) pair (_xpack_d1_prep)."""
    from ..ops.xpack import pack2, unpack2
    from .xla_fastpath import denoise2_xp, enhancer_xp

    params, batch_stats = variables["params"], variables["batch_stats"]
    new_flag = jnp.reshape(is_new_seq, (-1, 1, 1, 1))  # scalar or per-scene
    from ..core.precision import get_warp_packed
    from ..ops.xpack import cat_packed

    warp_packed = (
        get_warp_packed()
        and {"enh", "d2"} <= set(parts)
        and inp.shape[1] % 2 == 0
    )
    if warp_packed:
        # packed-glue variant (precision.set_warp_packed): the warp emits
        # pack2 layout directly and the enhancer/d2 inputs assemble via
        # cat_packed lane shuffles -- no NHWC round trip at the seam
        w12_p = update_cache(
            raft_vars,
            carry["last_H3"].astype(jnp.bfloat16),
            carry["last_s3"].astype(jnp.bfloat16),
            L2,
            of_scale=of_scale,
            raft_iters=raft_iters,
            emit="packed",
        ).astype(jnp.bfloat16)
        w12_p = jnp.where(new_flag, jnp.zeros_like(w12_p), w12_p)
        s2 = unpack2(enhancer_xp(pre, cat_packed([w12_p, pack2(L2)])))
        H2 = jnp.clip(inp / s2, EPS, 1.0)
        # new-sequence quirk (model/model.py:330-332): warped prev := H2
        H2_p = pack2(H2)
        w12_p = jnp.where(new_flag, cat_packed([H2_p, H2_p]), w12_p)
        resid = unpack2(
            denoise2_xp(pre, cat_packed([w12_p, H2_p, pack2(s2)]))
        )
        H5 = jnp.clip(jnp.concatenate([H2, s2], -1) - resid, EPS, 1.0)
        H2 = H2.astype(jnp.float32)
        H3 = H5[..., :3].astype(jnp.float32)
        s3 = H5[..., 3:].astype(jnp.float32)
        return (H2, H3, s3), {"last_H3": H3, "last_s3": s3}

    warped_H3, warped_s3 = update_cache(
        raft_vars,
        carry["last_H3"].astype(jnp.bfloat16),
        carry["last_s3"].astype(jnp.bfloat16),
        L2,
        of_scale=of_scale,
        raft_iters=raft_iters,
    )
    w6 = jnp.concatenate([warped_H3, warped_s3], -1).astype(jnp.bfloat16)
    w6 = jnp.where(new_flag, jnp.zeros_like(w6), w6)

    enh_in = jnp.concatenate([w6, L2], axis=-1)
    if "enh" in parts:
        s2 = unpack2(enhancer_xp(pre, pack2(enh_in)))
    else:
        s2 = ENHANCER.apply(
            {"params": params["enhance"],
             "batch_stats": batch_stats["enhance"]},
            enh_in, use_running_average=True,
        )
    H2 = jnp.clip(inp / s2, EPS, 1.0)

    # new-sequence quirk (model/model.py:330-332): warped prev := H2
    w6 = jnp.where(new_flag, jnp.concatenate([H2, H2], -1), w6)

    d2_in = jnp.concatenate([w6, H2, s2], axis=-1)
    if "d2" in parts:
        resid = unpack2(denoise2_xp(pre, pack2(d2_in)))
    else:
        d2 = lambda x: DENOISE_2.apply({"params": params["denoise_2"]}, x)
        resid = d2(d2_in)
    H5 = jnp.clip(jnp.concatenate([H2, s2], -1) - resid, EPS, 1.0)

    H2 = H2.astype(jnp.float32)
    H3 = H5[..., :3].astype(jnp.float32)
    s3 = H5[..., 3:].astype(jnp.float32)
    new_carry = {"last_H3": H3, "last_s3": s3}
    return (H2, H3, s3), new_carry


def _forward_inference_packed(
    variables: dict,
    raft_vars: Any,
    frame: jax.Array,
    carry: dict,
    is_new_seq: jax.Array,
    *,
    of_scale: int,
    raft_iters: int,
) -> tuple[tuple[jax.Array, jax.Array, jax.Array], dict]:
    """forward_inference on the packed-pair layout (fast mode, B=1).

    Same math/detach/quirk structure as forward_inference (Parity:
    Finetunemodel.forward, model/model.py:312-340) with the conv stacks AND
    all inter-stack glue in the (N, 2C) packed layout: NHWC appears only at
    the frame input, the flow/warp branch (spatial gathers), and the three
    outputs. Channel-pair interleaving for the concatenated conv inputs is
    pure lane slicing. Ring invariant: every packed intermediate keeps a
    zeroed pad ring (chained conv zero-padding); the H2 division guards
    0/0 on the ring with a where.
    """
    from ..ops import pack_conv as pcv
    from .fastpath import (
        denoise1_L2_packed,
        denoise2_H5_packed_multi,
        enhancer_packed_multi,
    )

    params, batch_stats = variables["params"], variables["batch_stats"]
    h, w = frame.shape[1], frame.shape[2]

    inp_p = pcv.pack((frame + EPS).astype(jnp.bfloat16))
    L2_p = denoise1_L2_packed(params["denoise_1"], inp_p, h, w)
    L2 = pcv.unpack(L2_p, h, w)

    warped_H3, warped_s3 = update_cache(
        raft_vars,
        carry["last_H3"].astype(jnp.bfloat16),
        carry["last_s3"].astype(jnp.bfloat16),
        L2,
        of_scale=of_scale,
        raft_iters=raft_iters,
    )
    w_p = pcv.pack(
        jnp.concatenate([warped_H3, warped_s3], axis=-1).astype(jnp.bfloat16)
    )  # (N, 12): [p0 (H3wp, s3wp) | p1 (H3wp, s3wp)]
    flag = jnp.reshape(is_new_seq, ())
    w_p = jnp.where(flag, jnp.zeros_like(w_p), w_p)

    # 9ch enhancer input = [w_p | L2_p]: the channel interleave happens in
    # VMEM inside the multi-input kernel, never in HBM
    s2_p = enhancer_packed_multi(
        params["enhance"], batch_stats["enhance"], [w_p, L2_p], h, w
    )
    # H2 = clamp(input/s2); s2's ring is 0 -> guard 0/0 so the ring stays 0
    H2_p = jnp.where(
        s2_p > 0, jnp.clip(inp_p / s2_p, EPS, 1.0), jnp.bfloat16(0)
    )

    # new-sequence quirk (model/model.py:330-332): warped prev := H2
    h2_sub = jnp.concatenate(
        [H2_p[:, :3], H2_p[:, :3], H2_p[:, 3:], H2_p[:, 3:]], axis=1
    )
    w_p = jnp.where(flag, h2_sub, w_p)

    # 12ch refiner input [w_p | H2 | s2] and the cat([H2, s2]) anchor are
    # both assembled in VMEM by the multi-input kernels
    H5_p = denoise2_H5_packed_multi(
        params["denoise_2"], [w_p, H2_p, s2_p], [H2_p, s2_p], h, w
    )

    H3_p = jnp.concatenate([H5_p[:, 0:3], H5_p[:, 6:9]], axis=1)
    s3_p = jnp.concatenate([H5_p[:, 3:6], H5_p[:, 9:12]], axis=1)
    H2 = pcv.unpack(H2_p, h, w).astype(jnp.float32)
    H3 = pcv.unpack(H3_p, h, w).astype(jnp.float32)
    s3 = pcv.unpack(s3_p, h, w).astype(jnp.float32)
    new_carry = {"last_H3": H3, "last_s3": s3}
    return (H2, H3, s3), new_carry
