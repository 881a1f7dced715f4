"""The fused per-frame steps: training and inference as single XLA graphs.

This is the north-star fusion (BASELINE.json): flow + warp + enhance +
denoise + loss + grad + clip + Adam update compile into ONE jitted program
per frame; the reference dispatches hundreds of eager CUDA ops per frame
(train.py:117-133).

Optimizer parity with torch (train.py:98, :130):
  * grads are global-norm clipped at 5.0 FIRST (torch clips p.grad before
    optimizer.step()),
  * THEN weight decay 3e-4 is added to the gradient (torch Adam is L2-in-
    grad, NOT AdamW),
  * then Adam(lr=1e-4, betas=(0.9, 0.999), eps=1e-8) with bias correction.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..core.config import Config
from ..losses.zero_tig_loss import zero_tig_loss
from ..models.network import forward_inference, forward_train, xpack_precompute


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    carry: dict  # {'last_H3', 'last_s3'} recurrent video state


def make_optimizer(config: Config) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(config.grad_clip),
        optax.add_decayed_weights(config.weight_decay),
        optax.scale_by_adam(
            b1=config.adam_beta1, b2=config.adam_beta2, eps=1e-8
        ),
        optax.scale(-config.lr),
    )


def init_train_state(
    config: Config,
    net_vars: dict,
    frame_shape: tuple[int, int, int, int],
) -> TrainState:
    opt = make_optimizer(config)
    zeros = jnp.zeros(frame_shape, jnp.float32)
    return TrainState(
        params=net_vars["params"],
        batch_stats=net_vars["batch_stats"],
        opt_state=opt.init(net_vars["params"]),
        carry={"last_H3": zeros, "last_s3": zeros},
    )


def _norm_frames(frames: jax.Array) -> jax.Array:
    """Accept uint8 frames at every step entry point: astype(f32)/255 at
    TRACE time (dtype is static). Float frames pass through untouched.

    APPROXIMATE vs f32-staged frames: moving the /255 inside the program
    perturbs XLA's fusion/simplification choices (e.g. update_cache
    multiplies by 255 right back and the simplifier may fold
    (x/255)*255 -> x), so outputs drift at reassociation level (~2e-7
    measured, an optimization_barrier does not close it). The exact
    staging is data.prefetch.chunk_prefetch, which normalizes EAGERLY once
    per chunk on-device so the jitted program is byte-for-byte the
    f32-input one. This in-graph path exists for callers that hand raw
    uint8 straight to a step (zero staging dispatches; fine wherever
    1e-7 is noise, e.g. fast-mode serving -- bf16 casts dwarf it)."""
    if frames.dtype == jnp.uint8:
        return frames.astype(jnp.float32) / 255.0
    return frames


def _grad_and_apply(
    state: TrainState,
    opt: optax.GradientTransformation,
    raft_vars: Any,
    frame: jax.Array,
    is_new_seq: jax.Array,
    warped: tuple[jax.Array, jax.Array] | None,
    *,
    of_scale: int,
    raft_iters: int,
    is_wb: bool,
    bn_train: bool,
) -> tuple[TrainState, jax.Array]:
    """The shared value_and_grad + clip + Adam body of train_step /
    train_step_split's update phase / train_chunk (one definition so
    optimizer-parity fixes cannot drift between the entry points)."""
    frame = _norm_frames(frame)

    def loss_fn(params):
        variables = {"params": params, "batch_stats": state.batch_stats}
        outputs, new_bs, new_carry = forward_train(
            variables, raft_vars, frame, state.carry, is_new_seq,
            of_scale=of_scale, raft_iters=raft_iters, bn_train=bn_train,
            warped=warped,
        )
        loss = zero_tig_loss(frame, outputs, is_wb=is_wb)
        return loss, (new_bs, new_carry)

    (loss, (new_bs, new_carry)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    updates, new_opt_state = opt.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return (
        TrainState(new_params, new_bs, new_opt_state, new_carry),
        loss,
    )


@functools.partial(
    jax.jit, static_argnames=("of_scale", "raft_iters", "is_wb", "bn_train"),
)
def train_step(
    state: TrainState,
    raft_vars: Any,
    frame: jax.Array,
    is_new_seq: jax.Array,
    *,
    of_scale: int = 3,
    raft_iters: int = 12,
    is_wb: bool = False,
    lr: float = 1e-4,
    grad_clip: float = 5.0,
    weight_decay: float = 3e-4,
    bn_train: bool = True,
) -> tuple[TrainState, jax.Array]:
    """One zero-shot training frame: returns (new_state, loss).

    bn_train: pass (epoch == 0) for the reference's BN schedule quirk
    (see models.network.forward_train).
    """
    cfg = Config(
        lr=lr, grad_clip=grad_clip, weight_decay=weight_decay,
        of_scale=of_scale, raft_iters=raft_iters,
    )
    opt = make_optimizer(cfg)
    return _grad_and_apply(
        state, opt, raft_vars, frame, is_new_seq, None,
        of_scale=of_scale, raft_iters=raft_iters, is_wb=is_wb,
        bn_train=bn_train,
    )


@functools.partial(jax.jit, static_argnames=("of_scale", "raft_iters"))
def _flow_phase_step(
    params, batch_stats, raft_vars, frame, carry,
    *, of_scale: int, raft_iters: int,
):
    from ..models.network import train_flow_phase

    return train_flow_phase(
        {"params": params, "batch_stats": batch_stats},
        raft_vars, _norm_frames(frame), carry,
        of_scale=of_scale, raft_iters=raft_iters,
    )


@functools.partial(
    jax.jit, static_argnames=("of_scale", "raft_iters", "is_wb", "bn_train"),
)
def _train_update_phase(
    state: TrainState,
    frame: jax.Array,
    is_new_seq: jax.Array,
    warped: tuple[jax.Array, jax.Array],
    *,
    of_scale: int,
    raft_iters: int,
    is_wb: bool,
    lr: float,
    grad_clip: float,
    weight_decay: float,
    bn_train: bool,
) -> tuple[TrainState, jax.Array]:
    cfg = Config(
        lr=lr, grad_clip=grad_clip, weight_decay=weight_decay,
        of_scale=of_scale, raft_iters=raft_iters,
    )
    opt = make_optimizer(cfg)
    return _grad_and_apply(
        state, opt, None, frame, is_new_seq, warped,
        of_scale=of_scale, raft_iters=raft_iters, is_wb=is_wb,
        bn_train=bn_train,
    )


def train_step_split(
    state: TrainState,
    raft_vars: Any,
    frame: jax.Array,
    is_new_seq: jax.Array,
    *,
    of_scale: int = 3,
    raft_iters: int = 12,
    is_wb: bool = False,
    lr: float = 1e-4,
    grad_clip: float = 5.0,
    weight_decay: float = 3e-4,
    bn_train: bool = True,
) -> tuple[TrainState, jax.Array]:
    """train_step as TWO dispatched programs: the gradient-free flow+warp
    phase (models.network.train_flow_phase), then value_and_grad + the
    optimizer with the warps as inputs.

    Same math as train_step (the flow block is torch.no_grad in the
    reference, model/model.py:221-259, so nothing differentiates through
    the seam; bit-identical on CPU, tests/test_xpack_train.py). Built to
    evict the warp's patchify gather table from the value_and_grad graph,
    where XLA materializes it through a channel-major zero-fill DUS loop
    (~22 ms/frame booked at 1080p, round-4 trace). MEASURED OUTCOME (one
    v5e, 1080p/of3/12it, packed fast): split 377.1/377.8 ms/frame
    (bn_train True/False) vs monolithic 369.8/371.7 -- the dispatch seam
    + lost cross-phase overlap cost more than the DUS loop, which the
    scheduler evidently hides behind MXU work. Stays OPT-IN: it still
    drops the RAFT weights and the whole flow graph from the grad
    program's live set, which matters when resolution pushes HBM, not
    latency. (An optimization_barrier on the patchify concat was also
    measured: 384.2 -- forcing materialization is strictly worse.)
    """
    warped = _flow_phase_step(
        state.params, state.batch_stats, raft_vars, frame, state.carry,
        of_scale=of_scale, raft_iters=raft_iters,
    )
    return _train_update_phase(
        state, frame, is_new_seq, warped,
        of_scale=of_scale, raft_iters=raft_iters, is_wb=is_wb, lr=lr,
        grad_clip=grad_clip, weight_decay=weight_decay, bn_train=bn_train,
    )


@functools.partial(
    jax.jit, static_argnames=("of_scale", "raft_iters", "enh_scale")
)
def predict_step(
    variables: dict,
    raft_vars: Any,
    frame: jax.Array,
    carry: dict,
    is_new_seq: jax.Array,
    *,
    of_scale: int = 3,
    raft_iters: int = 12,
    enh_scale: int = 1,
) -> tuple[tuple[jax.Array, jax.Array, jax.Array], dict]:
    """One inference frame: ((H2, H3, s3), new_carry)."""
    return forward_inference(
        variables, raft_vars, _norm_frames(frame), carry, is_new_seq,
        of_scale=of_scale, raft_iters=raft_iters, enh_scale=enh_scale,
    )


def _quantize_u8(x):
    """Reference PNG quantization (train.py:58-62) in-graph:
    clip(x*255, 0, 255) truncated to uint8 -- bit-identical to
    cli.common.save_images_uint8 on the same floats."""
    import jax.numpy as jnp

    return jnp.clip(x * 255.0, 0.0, 255.0).astype(jnp.uint8)


@functools.partial(
    jax.jit,
    static_argnames=("of_scale", "raft_iters", "enh_scale", "emit"),
)
def predict_chunk(
    variables: dict,
    raft_vars: Any,
    frames: jax.Array,
    carry: dict,
    is_new_seq: jax.Array,
    *,
    of_scale: int = 3,
    raft_iters: int = 12,
    enh_scale: int = 1,
    emit: str = "f32",
):
    """K frames of streaming inference as ONE lax.scan program.

    frames: (K, B, H, W, 3) pre-staged on device; is_new_seq: (K,) or (K, B).
    Returns ((H2s, H3s, s3s) each (K, B, H, W, 3), final_carry). Amortizes
    per-step dispatch/launch latency over the chunk -- the sequence-scaling
    analogue of the reference's frame loop (SURVEY.md section 5).

    emit="u8": the serving operating point -- H2/H3 are PNG-quantized
    IN-GRAPH (the exact reference formula) and s3 is dropped from the
    emitted stack (it lives on in the carry), returning
    ((H2s_u8, H3s_u8), carry). Cuts the scan's output stacking and the
    device->host transfer ~7x (u8 vs 3x f32); the written PNGs are
    bit-identical to host-side quantization of the f32 emission.
    """

    # pack the xpack-layout conv weights once, outside the scan body
    # (see models.network.xpack_precompute)
    xpack_pre = xpack_precompute(
        variables,
        frames.shape[3],
        enh_scale,
        batch=frames.shape[1],
        height=frames.shape[2],
    )

    def body(c, inp):
        frame, flag = inp
        outs, new_c = forward_inference(
            variables, raft_vars, _norm_frames(frame), c, flag,
            of_scale=of_scale, raft_iters=raft_iters, enh_scale=enh_scale,
            xpack_pre=xpack_pre,
        )
        if emit == "u8":
            H2, H3, _s3 = outs
            outs = (_quantize_u8(H2), _quantize_u8(H3))
        return new_c, outs

    carry, outs = jax.lax.scan(body, carry, (frames, is_new_seq))
    return outs, carry


@functools.partial(
    jax.jit,
    static_argnames=("of_scale", "raft_iters", "emit"),
)
def predict_chunk_pipelined(
    variables: dict,
    raft_vars: Any,
    frames: jax.Array,
    carry: dict,
    is_new_seq: jax.Array,
    *,
    of_scale: int = 3,
    raft_iters: int = 12,
    emit: str = "f32",
):
    """Software-pipelined predict_chunk (fast xpack path; OPT-IN, loses).

    Hypothesis: the sequential scan serializes the whole frame step --
    Denoise_1(t+1) depends only on frame t+1, so carrying stage A
    (models.network._xpack_d1_prep) one iteration ahead should let XLA's
    scheduler overlap B(t)'s gather-bound warp with A(t+1)'s MXU convs.

    MEASURED: REGRESSION, 79.45 vs 49.36/49.44 ms/frame (one v5e, 1080p
    chunk-32, sequential controls sandwiching). Post-mortem: the staged
    (inp, L2) pair crosses the scan-carry boundary as materialized
    full-res (.., 3)-lane buffers (losing the producer-consumer fusion
    the sequential body enjoys), and the hoped-for overlap cannot happen
    anyway -- stage B's RAFT is a lax.scan (while loop), and XLA does not
    co-schedule independent subgraphs across a while-loop boundary, so
    A(t+1) just runs after B(t) plus the new materialization cost.

    Kept opt-in as the measured record of the software-pipelining idea;
    outputs are BITWISE identical to predict_chunk (tested). Requires the
    fast-mode xpack routing; falls back to the sequential chunk otherwise.
    """
    from ..core.precision import get_xpack
    from ..models.network import _xpack_d1_prep, _xpack_flow_enhance

    frames = _norm_frames(frames)
    parts = get_xpack()
    # xpack_precompute is the single source of truth for "will the xpack
    # path dispatch": it returns None when the mode/parts/shape gates fail
    # AND when pack_conv takes the dispatch instead (in which case the
    # sequential chunk routes to the packed body and this path must not
    # run -- _xpack_d1_prep would subscript the None pytree at trace time)
    xpack_pre = xpack_precompute(
        variables, frames.shape[3], 1,
        batch=frames.shape[1], height=frames.shape[2],
    )
    if xpack_pre is None:
        return predict_chunk(
            variables, raft_vars, frames, carry, is_new_seq,
            of_scale=of_scale, raft_iters=raft_iters, emit=emit,
        )

    inp0, L20 = _xpack_d1_prep(variables, frames[0], parts, xpack_pre)

    def body(c, x):
        mcarry, inp_t, L2_t = c
        frame_next, flag_t = x
        outs, new_mcarry = _xpack_flow_enhance(
            variables, raft_vars, inp_t, L2_t, mcarry, flag_t,
            of_scale=of_scale, raft_iters=raft_iters, parts=parts,
            pre=xpack_pre,
        )
        inp_n, L2_n = _xpack_d1_prep(variables, frame_next, parts, xpack_pre)
        if emit == "u8":
            H2, H3, _s3 = outs
            outs = (_quantize_u8(H2), _quantize_u8(H3))
        return (new_mcarry, inp_n, L2_n), outs

    # frame stream shifted by one: iteration t consumes stage A(t) from
    # the scan carry and preps frame t+1 (the final prep, of a duplicated
    # last frame, is discarded)
    frames_next = jnp.concatenate([frames[1:], frames[-1:]], axis=0)
    (carry, _, _), outs = jax.lax.scan(
        body, (carry, inp0, L20), (frames_next, is_new_seq)
    )
    return outs, carry


@functools.partial(
    jax.jit, static_argnames=("of_scale", "raft_iters", "is_wb", "bn_train"),
)
def train_chunk(
    state: TrainState,
    raft_vars: Any,
    frames: jax.Array,
    is_new_seq: jax.Array,
    *,
    of_scale: int = 3,
    raft_iters: int = 12,
    is_wb: bool = False,
    lr: float = 1e-4,
    grad_clip: float = 5.0,
    weight_decay: float = 3e-4,
    bn_train: bool = True,
) -> tuple[TrainState, jax.Array]:
    """K sequential zero-shot training frames as ONE lax.scan program.

    frames: (K, B, H, W, 3); is_new_seq: (K,) or (K, B). Returns
    (final_state, (K,) losses). Exactly equivalent to K train_step calls
    (the optimizer state and recurrent carry thread through the scan).
    """
    cfg = Config(
        lr=lr, grad_clip=grad_clip, weight_decay=weight_decay,
        of_scale=of_scale, raft_iters=raft_iters,
    )
    opt = make_optimizer(cfg)

    def body(st, inp):
        frame, flag = inp
        return _grad_and_apply(
            st, opt, raft_vars, frame, flag, None,
            of_scale=of_scale, raft_iters=raft_iters, is_wb=is_wb,
            bn_train=bn_train,
        )

    state, losses = jax.lax.scan(body, state, (frames, is_new_seq))
    return state, losses


@functools.partial(jax.jit, static_argnames=("of_scale", "raft_iters"))
def eval_forward_step(
    variables: dict,
    raft_vars: Any,
    frame: jax.Array,
    carry: dict,
    is_new_seq: jax.Array,
    *,
    of_scale: int = 3,
    raft_iters: int = 12,
):
    """Training-model eval forward (train.py:137-152 image dumps): the torch
    code calls model.eval() first, so BatchNorm consumes running statistics.
    Returns (H2, H3) only.
    """
    outputs, _, new_carry = forward_train(
        variables, raft_vars, _norm_frames(frame), carry, is_new_seq,
        of_scale=of_scale, raft_iters=raft_iters, bn_train=False,
    )
    return (outputs.H2, outputs.H3), new_carry
