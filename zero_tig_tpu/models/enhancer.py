"""Retinex-style illumination estimator.

Parity: ``Enhancer`` (model/model.py:47-81). Key structural quirk preserved:
the reference appends the SAME conv+BN+ReLU module to its block list three
times (model/model.py:60-67), so all three residual stages share one set of
weights AND one set of BatchNorm running statistics, which are updated three
times per training forward. Here the shared submodule is simply called three
times in a loop -- Flax shares parameters for repeated calls of the same
module instance, and the mutable 'batch_stats' collection is updated
sequentially exactly like torch's.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv, TorchBatchNorm


class _SharedBlock(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        x = Conv(self.channels, (3, 3), padding=1, name="conv")(x)
        x = TorchBatchNorm(self.channels, name="bn")(x, use_running_average)
        return nn.relu(x)


class Enhancer(nn.Module):
    layers: int = 3
    channels: int = 64

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        fea = nn.relu(
            Conv(self.channels, (3, 3), padding=1, name="in_conv")(x)
        )
        block = _SharedBlock(self.channels, name="block")
        for _ in range(self.layers):
            fea = fea + block(fea, use_running_average)
        fea = nn.sigmoid(Conv(3, (3, 3), padding=1, name="out_conv")(fea))
        return jnp.clip(fea, 0.0001, 1.0)
