"""RAFT feature/context encoders.

Parity: ``BasicEncoder`` / ``ResidualBlock`` (model/RAFT/extractor.py:5-191).
The fnet uses InstanceNorm (parameter-free), the cnet BatchNorm. RAFT is
*frozen and always in eval mode* in this pipeline (model/model.py:109-115,
:240), so BatchNorm always consumes running statistics and dropout is never
active; both facts are baked in here (use_running_average=True).
"""

from __future__ import annotations

from flax import linen as nn

from ..layers import Conv, TorchBatchNorm, instance_norm


class _Norm(nn.Module):
    """norm_fn dispatch: 'instance' (pure fn) or 'batch' (running stats)."""

    features: int
    norm_fn: str

    @nn.compact
    def __call__(self, x):
        if self.norm_fn == "instance":
            return instance_norm(x)
        if self.norm_fn == "batch":
            return TorchBatchNorm(self.features, name="bn")(
                x, use_running_average=True
            )
        if self.norm_fn == "none":
            return x
        raise ValueError(f"unsupported norm_fn {self.norm_fn}")


class ResidualBlock(nn.Module):
    planes: int
    norm_fn: str
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride), padding=1,
            name="conv1",
        )(x)
        y = nn.relu(_Norm(self.planes, self.norm_fn, name="norm1")(y))
        y = Conv(self.planes, (3, 3), padding=1, name="conv2")(y)
        y = nn.relu(_Norm(self.planes, self.norm_fn, name="norm2")(y))
        if self.stride != 1:
            x = Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                name="downsample",
            )(x)
            x = _Norm(self.planes, self.norm_fn, name="norm3")(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """7x7/s2 stem + three 2-block residual stages (64/96/128) + 1x1 head."""

    output_dim: int = 256
    norm_fn: str = "instance"

    @nn.compact
    def __call__(self, x):
        x = Conv(64, (7, 7), strides=(2, 2), padding=3, name="conv1")(x)
        x = nn.relu(_Norm(64, self.norm_fn, name="norm1")(x))
        for stage, (dim, stride) in enumerate(
            [(64, 1), (96, 2), (128, 2)], start=1
        ):
            x = ResidualBlock(
                dim, self.norm_fn, stride, name=f"layer{stage}_0"
            )(x)
            x = ResidualBlock(dim, self.norm_fn, 1, name=f"layer{stage}_1")(x)
        return Conv(self.output_dim, (1, 1), name="conv2")(x)
