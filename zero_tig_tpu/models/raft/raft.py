"""RAFT optical flow, TPU-native.

Parity: ``RAFT`` (model/RAFT/raft.py:23-138) at the pipeline's fixed operating
point: corr_levels=4, corr_radius=4, hidden=context=128, iters=12, test_mode.

TPU-first departures from the reference (outputs unchanged):
  * the 12 refinement iterations run as one ``lax.scan`` with the final
    upsample mask threaded through the carry -- a single traced body instead
    of 12 unrolled Python iterations;
  * the convex upsample runs ONCE on the final flow (the reference computes
    it every iteration and discards all but the last, raft.py:111-130);
  * both frames go through the feature encoder as one batched call (the
    reference batches too, extractor.py:169-173).

RAFT is frozen in this pipeline (model/model.py:109-115): the forward is a
pure function of a variables pytree ``{'params': {...}, 'batch_stats':
{...}}`` and the caller never differentiates through it.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

from ...ops.padding import pad8_replicate
from ...ops.sampling import coords_grid
from .corr import build_corr_pyramid, lookup_corr
from .encoder import BasicEncoder
from .update import BasicUpdateBlock

_FNET = BasicEncoder(output_dim=256, norm_fn="instance")
_CNET = BasicEncoder(output_dim=256, norm_fn="batch")
_UPDATE = BasicUpdateBlock(hidden_dim=128)

CORR_LEVELS = 4
CORR_RADIUS = 4
HIDDEN_DIM = 128
CONTEXT_DIM = 128


def _sub(variables: Any, name: str) -> dict:
    out = {"params": variables["params"][name]}
    bs = variables.get("batch_stats", {})
    if name in bs:
        out["batch_stats"] = bs[name]
    return out


def convex_upsample_flow(flow: jax.Array, mask: jax.Array) -> jax.Array:
    """Convex-combination x8 flow upsample. Parity: raft.py:64-75.

    flow: (B, H, W, 2); mask: (B, H, W, 576). Returns (B, 8H, 8W, 2).
    """
    b, h, w, _ = flow.shape
    mask = mask.reshape(b, h, w, 9, 8, 8)
    mask = jax.nn.softmax(mask, axis=3)

    f8 = 8.0 * flow
    fp = jnp.pad(f8, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # 3x3 neighborhood, kernel-position row-major (matches F.unfold ordering)
    nb = jnp.stack(
        [fp[:, ky : ky + h, kx : kx + w, :] for ky in range(3) for kx in range(3)],
        axis=3,
    )  # (B, H, W, 9, 2)
    up = jnp.einsum(
        "bhwkij,bhwkc->bhwijc", mask, nb, precision=jax.lax.Precision.HIGHEST
    )
    up = up.transpose(0, 1, 3, 2, 4, 5)  # (B, H, 8, W, 8, 2)
    return up.reshape(b, 8 * h, 8 * w, 2)


def raft_forward(
    variables: Any,
    image1: jax.Array,
    image2: jax.Array,
    *,
    iters: int = 12,
    return_predictions: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """(flow_low, flow_up) between two (B, H, W, 3) frames in [0, 255].

    Output flow is at the /8-padded input resolution -- the reference never
    unpads (model/model.py:245-250); warp_tensor absorbs the padded shape.

    return_predictions=True returns ALL per-iteration upsampled flows
    (iters, B, 8h, 8w, 2) -- the sequence needed by the RAFT training loss
    (the inference path upsamples only the final iteration).
    """
    image1 = pad8_replicate(image1)
    image2 = pad8_replicate(image2)
    image1 = 2.0 * (image1 / 255.0) - 1.0
    image2 = 2.0 * (image2 / 255.0) - 1.0

    b = image1.shape[0]
    fmaps = _FNET.apply(_sub(variables, "fnet"), jnp.concatenate([image1, image2], 0))
    fmap1, fmap2 = fmaps[:b], fmaps[b:]

    pyramid = build_corr_pyramid(
        fmap1.astype(jnp.float32), fmap2.astype(jnp.float32), CORR_LEVELS
    )

    cnet = _CNET.apply(_sub(variables, "cnet"), image1)
    net0 = jnp.tanh(cnet[..., :HIDDEN_DIM])
    inp = jax.nn.relu(cnet[..., HIDDEN_DIM:])

    h8, w8 = fmap1.shape[1], fmap1.shape[2]
    coords0 = coords_grid(b, h8, w8, dtype=jnp.float32)
    update_vars = _sub(variables, "update_block")

    from ...core.precision import get_mode, get_raft_fused, get_raft_kernel
    from .update import update_block_apply_fast

    fast_body = get_mode() == "fast" and not return_predictions
    use_kernel = fast_body and get_raft_kernel() and b == 1
    use_fused = fast_body and get_raft_fused()

    def body(carry, _):
        net, coords1 = carry
        # per-iteration detach, parity with raft.py:112 (matters only when
        # differentiating through RAFT, i.e. flow-model training)
        coords1 = jax.lax.stop_gradient(coords1)
        corr = lookup_corr(pyramid, coords1, CORR_RADIUS)
        flow = coords1 - coords0
        # the mask head runs per-iteration only when every prediction is
        # consumed (flow training); inference computes it ONCE post-scan
        # from the final hidden state -- identical output (the reference
        # discards all but the last mask, raft.py:111-130)
        if use_kernel:
            # one fused Pallas kernel for the update core (experimental,
            # precision.set_raft_kernel)
            from .update_kernel import update_block_apply_kernel

            net, delta = update_block_apply_kernel(
                update_vars["params"], net, inp, corr, flow
            )
            mask = None
        elif use_fused:
            # raw-param apply, GRU z/r gate convs fused (exact;
            # experimental, precision.set_raft_fused)
            net, delta = update_block_apply_fast(
                update_vars["params"], net, inp, corr, flow
            )
            mask = None
        else:
            net, mask, delta = _UPDATE.apply(
                update_vars, net, inp, corr, flow,
                with_mask=return_predictions,
            )
        new_coords1 = coords1 + delta
        ys = (new_coords1 - coords0, mask) if return_predictions else None
        return (net, new_coords1), ys

    (net, coords1), ys = lax.scan(body, (net0, coords0), None, length=iters)

    flow_low = coords1 - coords0
    if return_predictions:
        flows, masks = ys  # (iters, B, h8, w8, ...)
        flow_ups = jax.vmap(convex_upsample_flow)(flows, masks)
        return flow_low, flow_ups
    mask = _UPDATE.apply(update_vars, net, method="mask_head")
    flow_up = convex_upsample_flow(flow_low, mask)
    return flow_low, flow_up


def init_raft_variables(key: jax.Array, h: int = 64, w: int = 64) -> Any:
    """Random-initialized RAFT variables {'params', 'batch_stats'}.

    Used for tests and for the reference's "RAFT without weights" quirk
    (SURVEY.md section 2.2); real runs load raft-sintel / combined
    checkpoints via core.checkpoint.
    """
    kf, kc, ku = jax.random.split(key, 3)
    dummy = jnp.zeros((2, h, w, 3), jnp.float32)
    fnet_v = _FNET.init(kf, dummy)
    cnet_v = _CNET.init(kc, dummy[:1])
    h8, w8 = h // 8, w // 8
    net = jnp.zeros((1, h8, w8, HIDDEN_DIM), jnp.float32)
    inp = jnp.zeros((1, h8, w8, CONTEXT_DIM), jnp.float32)
    corr = jnp.zeros((1, h8, w8, CORR_LEVELS * (2 * CORR_RADIUS + 1) ** 2), jnp.float32)
    flow = jnp.zeros((1, h8, w8, 2), jnp.float32)
    upd_v = _UPDATE.init(ku, net, inp, corr, flow)

    params = {
        "fnet": fnet_v["params"],
        "cnet": cnet_v["params"],
        "update_block": upd_v["params"],
    }
    batch_stats = {"cnet": cnet_v["batch_stats"]}
    return {"params": params, "batch_stats": batch_stats}
