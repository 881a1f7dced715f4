"""Supervised flow-model training (the sidecar's training capability).

Parity target: ptlflow_scripts/train.py (a Lightning CLI over the ptlflow
zoo). Here: the standard RAFT training recipe as pure JAX -- exponentially
weighted sequence loss over all refinement iterations (gamma=0.8), AdamW
with one-cycle LR and gradient clipping, photometric/spatial augmentation
via data.augmentor, EPE validation metrics.
"""

from __future__ import annotations

from typing import Any, Iterable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.raft.raft import raft_forward


class FlowTrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def sequence_loss(
    flow_preds: jax.Array,
    flow_gt: jax.Array,
    valid: jax.Array | None = None,
    *,
    gamma: float = 0.8,
    max_flow: float = 400.0,
) -> jax.Array:
    """RAFT sequence loss: sum_i gamma^(N-i-1) * L1(flow_i, gt).

    flow_preds: (iters, B, H, W, 2); flow_gt: (B, H, W, 2);
    valid: optional (B, H, W) mask.
    """
    n = flow_preds.shape[0]
    mag = jnp.sqrt(jnp.sum(flow_gt**2, axis=-1))
    v = jnp.ones_like(mag) if valid is None else valid.astype(jnp.float32)
    v = v * (mag < max_flow).astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(v), 1.0)

    def per_iter(i, acc):
        w = gamma ** (n - i - 1)
        l1 = jnp.sum(jnp.abs(flow_preds[i] - flow_gt), axis=-1)
        return acc + w * jnp.sum(v * l1) / denom

    return jax.lax.fori_loop(0, n, per_iter, jnp.zeros((), jnp.float32))


def make_flow_optimizer(
    *,
    lr: float = 4e-4,
    total_steps: int = 100_000,
    weight_decay: float = 1e-4,
    clip: float = 1.0,
    pct_start: float = 0.05,
) -> optax.GradientTransformation:
    """AdamW + one-cycle schedule + clip (the published RAFT recipe)."""
    schedule = optax.linear_onecycle_schedule(
        transition_steps=total_steps,
        peak_value=lr,
        pct_start=pct_start,
        pct_final=1.0,
        div_factor=25.0,
        final_div_factor=1e4,
    )
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(schedule, weight_decay=weight_decay, eps=1e-8),
    )


def init_flow_train_state(
    variables: dict, *, lr: float = 4e-4, total_steps: int = 100_000
) -> FlowTrainState:
    opt = make_flow_optimizer(lr=lr, total_steps=total_steps)
    return FlowTrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=opt.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )


def flow_train_step(
    state: FlowTrainState,
    img1: jax.Array,
    img2: jax.Array,
    flow_gt: jax.Array,
    valid: jax.Array | None = None,
    *,
    iters: int = 12,
    gamma: float = 0.8,
    lr: float = 4e-4,
    total_steps: int = 100_000,
    predictions_fn=None,
) -> tuple[FlowTrainState, jax.Array]:
    """One supervised step. img1/img2: (B, H, W, 3) in [0, 255].

    predictions_fn: (vars, img1, img2, iters) -> (seq, B, H, W, 2)
    prediction sequence (registry FlowModel.predictions_fn); defaults to
    RAFT. Any registry model with a predictions_fn is trainable here --
    the sidecar's model-selection workflow covers training, not just
    benchmarking (parity: ptlflow_scripts/train.py over the zoo).
    """
    opt = make_flow_optimizer(lr=lr, total_steps=total_steps)

    def loss_fn(params):
        variables = {"params": params, "batch_stats": state.batch_stats}
        if predictions_fn is None:
            _, flow_preds = raft_forward(
                variables, img1, img2, iters=iters, return_predictions=True
            )
        else:
            flow_preds = predictions_fn(variables, img1, img2, iters)
        return sequence_loss(flow_preds, flow_gt, valid, gamma=gamma)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, new_opt = opt.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return (
        FlowTrainState(new_params, state.batch_stats, new_opt, state.step + 1),
        loss,
    )


def train_flow_model(
    variables: dict,
    batches: Iterable[tuple],
    *,
    iters: int = 12,
    lr: float = 4e-4,
    total_steps: int = 100_000,
    log_every: int = 100,
    model: str | None = None,
) -> FlowTrainState:
    """Driver: iterate (img1, img2, flow_gt[, valid]) device batches.

    model: registry name ('raft', 'raft_small', 'pwc_lite', ...); None
    keeps the historical RAFT default.
    """
    predictions_fn = None
    if model is not None:
        from .registry import get_flow_model

        fm = get_flow_model(model)
        if fm.predictions_fn is None:
            raise ValueError(f"flow model {model!r} is not trainable "
                             f"(no predictions_fn registered)")
        predictions_fn = fm.predictions_fn
    state = init_flow_train_state(variables, lr=lr, total_steps=total_steps)
    step_fn = jax.jit(
        lambda s, a, b, g, v: flow_train_step(
            s, a, b, g, v, iters=iters, lr=lr, total_steps=total_steps,
            predictions_fn=predictions_fn,
        )
    )
    for i, batch in enumerate(batches):
        img1, img2, gt = batch[:3]
        valid = batch[3] if len(batch) > 3 else jnp.ones(gt.shape[:-1])
        state, loss = step_fn(state, img1, img2, gt, valid)
        if i % log_every == 0:
            print(f"[flow-train] step {i} loss {float(loss):.4f}")
    return state
