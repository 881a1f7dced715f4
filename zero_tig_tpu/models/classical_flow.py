"""Classical pyramidal Lucas-Kanade optical flow -- a zero-weight, jittable
baseline for the flow sidecar.

The reference's sidecar sweeps an external model zoo
(ptlflow_scripts/model_benchmark.py:1-17); alongside the learned in-tree
families (raft, raft_small, pwc_lite) this entry gives the
benchmark/validate workflows a non-learned model: no parameters, no
checkpoint, deterministic. Registered as ``lk_pyramid``
(flowtools/registry.py).

TPU-first formulation: the whole coarse-to-fine solve is static-shape
jax -- box-filtered normal equations per pixel (separable window sums ride
the VPU), bilinear warps via ops.sampling.grid_sample_pixel, python-level
loops over the (static) pyramid levels and refinement iterations unroll
into one fused XLA program.

Flow convention matches the learned models: img1(x) corresponds to
img2(x + flow(x)), dense full-resolution (B, H, W, 2) output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear
from ..ops.sampling import coords_grid, grid_sample_pixel


def init_lk_variables(key: jax.Array) -> dict:
    """Zero-weight model: an empty pytree (kept for registry interface)."""
    del key
    return {}


def _gray(img: jax.Array) -> jax.Array:
    """(B, H, W, 3) uint8-range RGB -> (B, H, W, 1) gray in [0, 1]."""
    return jnp.mean(img, axis=-1, keepdims=True) / 255.0


def _box(x: jax.Array, k: int) -> jax.Array:
    """k x k box sum, SAME zero padding, separable shifted adds."""
    p = k // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (0, 0), (0, 0)))
    h = x.shape[1]
    acc = None
    for i in range(k):
        t = xp[:, i : i + h]
        acc = t if acc is None else acc + t
    xp = jnp.pad(acc, ((0, 0), (0, 0), (p, p), (0, 0)))
    w = x.shape[2]
    acc = None
    for i in range(k):
        t = xp[:, :, i : i + w]
        acc = t if acc is None else acc + t
    return acc


def _grad_xy(g: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Central-difference spatial gradients, replicate edges."""
    gp = jnp.pad(g, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")
    ix = 0.5 * (gp[:, :, 2:] - gp[:, :, :-2])
    gp = jnp.pad(g, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="edge")
    iy = 0.5 * (gp[:, 2:] - gp[:, :-2])
    return ix, iy


def _lk_refine(
    g1: jax.Array, g2: jax.Array, flow: jax.Array, iters: int, window: int,
) -> jax.Array:
    """Iterative LK updates of `flow` at one pyramid level."""
    b, h, w, _ = g1.shape
    grid = coords_grid(b, h, w)
    # Shi-Tomasi gate: windows whose structure tensor's smaller eigenvalue
    # is below this (per-pixel-normalized) threshold get NO update -- on
    # flat or aperture-limited windows the normal equations solve a ratio
    # of near-zero numbers and extrapolate wildly (a tiny diagonal eps
    # does not prevent that; it only bounds the denominator)
    lam_tau = 1e-5 * (window * window)
    for _ in range(iters):
        pos = grid + flow
        g2w = grid_sample_pixel(g2, pos[..., 0], pos[..., 1])
        ix, iy = _grad_xy(g2w)
        it = g2w - g1
        sxx = _box(ix * ix, window)
        syy = _box(iy * iy, window)
        sxy = _box(ix * iy, window)
        sxt = _box(ix * it, window)
        syt = _box(iy * it, window)
        tr = sxx + syy
        disc = jnp.sqrt(jnp.square(sxx - syy) + 4.0 * jnp.square(sxy))
        lam_min = 0.5 * (tr - disc)
        det = sxx * syy - sxy * sxy
        ok = lam_min > lam_tau
        inv_det = jnp.where(ok & (jnp.abs(det) > 1e-12), 1.0 / det, 0.0)
        du = (sxy * syt - syy * sxt) * inv_det
        dv = (sxy * sxt - sxx * syt) * inv_det
        # clamp per-iteration updates: outside the linearization radius the
        # solve is extrapolation even on well-conditioned windows
        step = jnp.concatenate([du, dv], axis=-1)
        flow = flow + jnp.clip(step, -2.0, 2.0)
    # accumulated flow can never meaningfully exceed the field of view
    bound = jnp.asarray([w, h], jnp.float32)
    return jnp.clip(flow, -bound, bound)


def lk_forward(
    variables: dict,
    img1: jax.Array,
    img2: jax.Array,
    *,
    iters: int = 3,
    levels: int = 4,
    window: int = 11,
) -> tuple[jax.Array, jax.Array]:
    """Pyramidal LK flow. Returns (flow_coarsest, flow_full_res) like the
    learned families' (flow_low, flow_up) pair.

    img1/img2: (B, H, W, 3) in [0, 255]. iters: LK iterations per level.
    """
    del variables
    g1 = _gray(img1.astype(jnp.float32))
    g2 = _gray(img2.astype(jnp.float32))

    # Gaussian-ish pyramid via 2x2 average pooling (cheap, jittable)
    pyr1, pyr2 = [g1], [g2]
    for _ in range(levels - 1):
        p1, p2 = pyr1[-1], pyr2[-1]
        # a level must comfortably contain the window, or its structure
        # tensors are boundary-dominated and the solve is noise that the
        # x2 flow upsampling then amplifies down the whole pyramid
        if min(p1.shape[1] // 2, p1.shape[2] // 2) < 2 * window:
            break
        def down(x):
            h2, w2 = x.shape[1] // 2, x.shape[2] // 2
            r = x[:, : 2 * h2, : 2 * w2].reshape(
                x.shape[0], h2, 2, w2, 2, 1
            )
            return r.mean(axis=(2, 4))
        pyr1.append(down(p1))
        pyr2.append(down(p2))

    flow = jnp.zeros(pyr1[-1].shape[:3] + (2,), jnp.float32)
    flow_low = None
    for lvl in range(len(pyr1) - 1, -1, -1):
        p1, p2 = pyr1[lvl], pyr2[lvl]
        if flow.shape[1:3] != p1.shape[1:3]:
            scale_x = p1.shape[2] / flow.shape[2]
            scale_y = p1.shape[1] / flow.shape[1]
            flow = resize_bilinear(
                flow, (p1.shape[1], p1.shape[2]), align_corners=False
            ) * jnp.asarray([scale_x, scale_y], jnp.float32)
        flow = _lk_refine(p1, p2, flow, iters, window)
        if flow_low is None:
            flow_low = flow
    return flow_low, flow
