"""Shared Flax layers with exact PyTorch numerical semantics.

PyTorch defaults replicated here (they differ from Flax defaults):
  * Conv2d init: kaiming_uniform(a=sqrt(5)) on weight, uniform
    [-1/sqrt(fan_in), 1/sqrt(fan_in)] on bias.
  * BatchNorm2d: eps 1e-5, momentum 0.1 (new = 0.9*old + 0.1*batch), batch
    statistics use the *biased* variance for normalization but the *unbiased*
    variance for the running average. Flax's nn.BatchNorm stores the biased
    variance, so a custom module is required for checkpoint-trajectory parity.
  * InstanceNorm2d: affine=False, track_running_stats=False -> a pure
    function of the input (no parameters).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.precision import conv_precision, get_mode


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """kaiming_uniform(a=sqrt(5)) on an HWIO kernel (torch Conv2d default)."""
    kh, kw, cin, _ = shape
    fan_in = kh * kw * cin
    gain = math.sqrt(2.0 / (1.0 + 5.0))  # leaky_relu gain with a=sqrt(5)
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv(nn.Module):
    """nn.Conv with torch-default init and torch-style symmetric padding."""

    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: int | tuple[int, int] = 0
    use_bias: bool = True
    kernel_dilation: tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        pad = self.padding
        if isinstance(pad, int):
            pad = (pad, pad)
        w = self.param(
            "kernel", torch_conv_kernel_init, (kh, kw, cin, self.features)
        )
        # fast mode: bf16 activations/weights through the conv stacks (the
        # workload is HBM-bandwidth-bound at 1080p; bf16 halves the tensor
        # traffic on top of the single-pass MXU multiply), f32 accumulation.
        # highest mode: f32 tensors, multi-pass f32-faithful multiplies.
        cdt = jnp.bfloat16 if get_mode() == "fast" else x.dtype
        # bf16 in/out: the MXU accumulates f32 internally either way; an f32
        # preferred_element_type with bf16 operands breaks the conv
        # transpose rule (mixed-dtype args in the backward).
        # (Two dot_general lowerings for the 1x1 convs were measured SLOWER
        # end-to-end than XLA's conv at 1080p: rank-4 contraction +1.6
        # ms/frame, flat-2D reshape +2.3 ms/frame.)
        out = jax.lax.conv_general_dilated(
            x.astype(cdt),
            w.astype(cdt),
            window_strides=self.strides,
            padding=[(pad[0], pad[0]), (pad[1], pad[1])],
            rhs_dilation=self.kernel_dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=conv_precision(),
        )
        if self.use_bias:
            b = self.param(
                "bias", torch_conv_bias_init(kh * kw * cin), (self.features,)
            )
            out = out + b.astype(cdt)
        return out


class TorchBatchNorm(nn.Module):
    """BatchNorm2d with exact PyTorch running-stats semantics.

    Collections: params -> {scale, bias}; batch_stats -> {mean, var}.
    ``use_running_average=True`` reproduces torch eval mode; ``False``
    normalizes with per-batch (N, H, W) statistics and, when 'batch_stats' is
    mutable, updates the running stats with the unbiased variance.
    """

    features: int
    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(
        self, x, use_running_average: bool = True, stats_override=None
    ):
        """stats_override: optional (mean, var) pair used for normalization
        instead of batch or running statistics. Enables the spatial
        two-pass train-mode BN (pipeline.spatial): full-frame batch stats
        are computed separately and supplied as differentiable inputs; the
        caller updates the running stats itself, so no mutation here."""
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,))
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,))
        )
        if stats_override is not None:
            mean, var = stats_override
        elif use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(0, 1, 2))
            var = jnp.mean(jnp.square(xf - mean), axis=(0, 1, 2))
            n = x.shape[0] * x.shape[1] * x.shape[2]
            if not self.is_initializing() and self.is_mutable_collection(
                "batch_stats"
            ):
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return ((x - mean) * inv + bias).astype(x.dtype)


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """InstanceNorm2d(affine=False, track_running_stats=False), NHWC.

    Normalizes each (sample, channel) over H, W with biased variance.
    Fast mode computes var as E[x^2] - mean^2 in one data pass (saves a
    full re-read of the activation per norm; ~0.4 ms/frame across the
    RAFT encoders at the 1080p operating point). 'highest' keeps the
    two-pass centered formulation, which matches torch bit-for-bit and
    is what the reference-oracle tests certify.
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    if get_mode() == "fast":
        msq = jnp.mean(xf * xf, axis=(1, 2), keepdims=True)
        var = jnp.maximum(msq - mean * mean, 0.0)
    else:
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def leaky_relu02(x: jax.Array) -> jax.Array:
    """LeakyReLU(negative_slope=0.2) as in the denoisers (model/model.py:19)."""
    return jnp.where(x >= 0, x, 0.2 * x)
