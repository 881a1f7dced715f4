"""PWC-lite: coarse-to-fine pyramid flow with warping + local cost volumes.

A genuinely different flow-model family from RAFT (Sun et al., "PWC-Net:
CNNs for Optical Flow Using Pyramid, Warping, and Cost Volume", CVPR 2018 --
public method, original implementation here): feed-forward coarse-to-fine
estimation instead of RAFT's recurrent all-pairs refinement. It exists so
the flow sidecar's selection workflow (benchmark/validate/submit over a
model zoo, parity: ptlflow_scripts/model_benchmark.py:1-17) has a real
architecture choice to make, like the reference's external ptlflow zoo.

TPU-first shape of the design:
  * the local cost volume is 49 STATIC shifts of the warped feature map
    (pad + slice), lowering to fused elementwise-multiply/reduce -- no
    gathers, no dynamic shapes;
  * feature warping reuses the framework's vectorized bilinear sampler
    (ops/sampling.grid_sample_pixel, zero OOB like PWC's masking);
  * each level is a straight conv stack -- everything MXU-friendly,
    bf16-safe under precision 'fast'.

Levels: features at 1/2..1/16; flow estimated at 1/16 -> 1/8 -> 1/4 and
bilinearly upsampled x4 to full (padded) resolution, matching PWC's
quarter-res output convention.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_bilinear
from ..ops.sampling import coords_grid, grid_sample_pixel
from .layers import Conv, leaky_relu02

MAX_DISP = 3  # local correlation radius -> (2*3+1)^2 = 49 cost channels
_PYR_CHANNELS = (16, 32, 64, 96)  # features at 1/2, 1/4, 1/8, 1/16
_EST_LEVELS = (3, 2, 1)  # estimate flow at 1/16, 1/8, 1/4 (pyramid indices)


def _pad16_replicate(x: jax.Array) -> jax.Array:
    """Pad (B, H, W, C) to multiples of 16 (sintel-style centered,
    replicate -- same convention as ops.padding.pad8_replicate)."""
    h, w = x.shape[1], x.shape[2]
    ph = (-h) % 16
    pw = (-w) % 16
    if ph == 0 and pw == 0:
        return x
    return jnp.pad(
        x,
        ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0)),
        mode="edge",
    )


class FeaturePyramid(nn.Module):
    """Four stride-2 stages (conv s2 + conv), channels 16/32/64/96."""

    @nn.compact
    def __call__(self, x):
        feats = []
        for i, ch in enumerate(_PYR_CHANNELS):
            x = leaky_relu02(
                Conv(ch, (3, 3), strides=(2, 2), padding=1,
                     name=f"down{i}")(x)
            )
            x = leaky_relu02(
                Conv(ch, (3, 3), padding=1, name=f"conv{i}")(x)
            )
            feats.append(x)
        return feats


def local_correlation(f1: jax.Array, f2w: jax.Array, d: int = MAX_DISP):
    """(2d+1)^2-channel cost volume from static shifts (PWC cost volume).

    corr[dy, dx] = mean_c f1 * shift(f2w, dy, dx); zero beyond borders.
    """
    b, h, w, c = f1.shape
    padded = jnp.pad(
        f2w, ((0, 0), (d, d), (d, d), (0, 0)), mode="constant"
    )
    costs = []
    for dy in range(2 * d + 1):
        for dx in range(2 * d + 1):
            shifted = jax.lax.slice(
                padded, (0, dy, dx, 0), (b, dy + h, dx + w, c)
            )
            costs.append(jnp.mean(f1 * shifted, axis=-1))
    return leaky_relu02(jnp.stack(costs, axis=-1))


class FlowEstimator(nn.Module):
    """Conv stack over [cost, features, upsampled flow] -> flow delta."""

    @nn.compact
    def __call__(self, cost, feat, upflow):
        x = jnp.concatenate([cost, feat, upflow], axis=-1)
        for i, ch in enumerate((96, 64, 32)):
            x = leaky_relu02(
                Conv(ch, (3, 3), padding=1, name=f"conv{i}")(x)
            )
        return Conv(2, (3, 3), padding=1, name="flow")(x), x


class ContextNet(nn.Module):
    """Dilated-conv refinement at the finest level (PWC context network)."""

    @nn.compact
    def __call__(self, x):
        for i, (ch, dil) in enumerate(((64, 1), (64, 2), (32, 4))):
            x = leaky_relu02(
                Conv(ch, (3, 3), padding=dil, kernel_dilation=(dil, dil),
                     name=f"conv{i}")(x)
            )
        return Conv(2, (3, 3), padding=1, name="flow")(x)


class PWCLite(nn.Module):
    @nn.compact
    def __call__(self, image1, image2):
        pyr = FeaturePyramid(name="pyramid")
        f1s = pyr(image1)
        f2s = pyr(image2)

        flows = []  # coarse -> fine, each at its own level's resolution
        flow = None
        for li, level in enumerate(_EST_LEVELS):
            f1, f2 = f1s[level], f2s[level]
            b, h, w, _ = f1.shape
            if flow is None:
                upflow = jnp.zeros((b, h, w, 2), jnp.float32)
                f2w = f2
            else:
                upflow = 2.0 * resize_bilinear(
                    flow, (h, w), align_corners=False
                )
                coords = coords_grid(b, h, w, dtype=jnp.float32)
                tgt = coords + upflow
                f2w = grid_sample_pixel(
                    f2, tgt[..., 0], tgt[..., 1]
                ).astype(f2.dtype)
            cost = local_correlation(
                f1.astype(jnp.float32), f2w.astype(jnp.float32)
            )
            delta, est_feat = FlowEstimator(name=f"estimator{li}")(
                cost.astype(f1.dtype), f1, upflow.astype(f1.dtype)
            )
            flow = upflow + delta.astype(jnp.float32)
            if li == len(_EST_LEVELS) - 1:
                flow = flow + ContextNet(name="context")(
                    jnp.concatenate([est_feat, flow.astype(f1.dtype)],
                                    axis=-1)
                ).astype(jnp.float32)
            flows.append(flow)
        return flows


_PWC = PWCLite()


def _upflow4(flow: jax.Array) -> jax.Array:
    h, w = flow.shape[1], flow.shape[2]
    return 4.0 * resize_bilinear(flow, (4 * h, 4 * w), align_corners=False)


def pwc_forward(
    variables: Any,
    image1: jax.Array,
    image2: jax.Array,
    *,
    iters: int = 1,
    return_predictions: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """(flow_low, flow_up) between two (B, H, W, 3) frames in [0, 255].

    Same contract as raft.raft_forward (flow at the padded-input
    resolution); `iters` is accepted for registry compatibility and
    ignored -- PWC is feed-forward, its 'iterations' are the pyramid
    levels. return_predictions=True returns all per-level flows upsampled
    to full res, coarse->fine (the multi-scale supervision sequence).
    """
    del iters
    image1 = _pad16_replicate(image1)
    image2 = _pad16_replicate(image2)
    image1 = image1 / 255.0
    image2 = image2 / 255.0

    flows = _PWC.apply({"params": variables["params"]}, image1, image2)
    flow_low = flows[-1]  # quarter resolution
    if return_predictions:
        h, w = image1.shape[1], image1.shape[2]
        ups = [
            (h / f.shape[1])
            * resize_bilinear(f, (h, w), align_corners=False)
            for f in flows
        ]
        return flow_low, jnp.stack(ups, axis=0)
    return flow_low, _upflow4(flow_low)


def init_pwc_variables(key: jax.Array, h: int = 64, w: int = 64) -> Any:
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    return {"params": _PWC.init(key, dummy, dummy)["params"]}
