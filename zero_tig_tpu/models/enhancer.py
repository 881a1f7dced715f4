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
    def __call__(
        self,
        x,
        use_running_average: bool,
        stats_override=None,
        pre_bn_only: bool = False,
    ):
        x = Conv(self.channels, (3, 3), padding=1, name="conv")(x)
        if pre_bn_only:
            return x
        x = TorchBatchNorm(self.channels, name="bn")(
            x, use_running_average, stats_override
        )
        return nn.relu(x)


class Enhancer(nn.Module):
    layers: int = 3
    channels: int = 64

    @nn.compact
    def __call__(
        self,
        x,
        use_running_average: bool = True,
        bn_overrides=None,
        return_pre_bn: int | None = None,
    ):
        """bn_overrides: optional sequence of (mean, var) pairs, one per
        stage, used for BN normalization instead of batch/running stats
        (spatial two-pass train-mode BN; the shared BN's running stats are
        then updated by the caller). return_pre_bn=k short-circuits and
        returns stage k's pre-BN conv output (the tensor whose full-frame
        moments ARE that stage's batch statistics) -- stages < k must have
        overrides."""
        fea = nn.relu(
            Conv(self.channels, (3, 3), padding=1, name="in_conv")(x)
        )
        block = _SharedBlock(self.channels, name="block")
        for i in range(self.layers):
            ov = None
            if bn_overrides is not None and i < len(bn_overrides):
                ov = bn_overrides[i]
            if return_pre_bn is not None and i == return_pre_bn:
                return block(fea, use_running_average, pre_bn_only=True)
            fea = fea + block(fea, use_running_average, ov)
        fea = nn.sigmoid(Conv(3, (3, 3), padding=1, name="out_conv")(fea))
        return jnp.clip(fea, 0.0001, 1.0)
