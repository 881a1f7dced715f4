"""The two Neighbor2Neighbor-style denoisers.

Parity: ``Denoise_1`` (model/model.py:15-28, 3->48->48->3) and ``Denoise_2``
(model/model.py:31-44, 12->C->C->6; instantiated with chan_embed=48 at
model/model.py:91 despite the class default 96). Both predict residuals with
LeakyReLU(0.2) activations; the 1x1 output conv has no activation.
"""

from __future__ import annotations

from flax import linen as nn

from .layers import Conv, leaky_relu02


class Denoise1(nn.Module):
    chan_embed: int = 48

    @nn.compact
    def __call__(self, x):
        x = leaky_relu02(Conv(self.chan_embed, (3, 3), padding=1, name="conv1")(x))
        x = leaky_relu02(Conv(self.chan_embed, (3, 3), padding=1, name="conv2")(x))
        return Conv(3, (1, 1), name="conv3")(x)


class Denoise2(nn.Module):
    chan_embed: int = 48

    @nn.compact
    def __call__(self, x):
        x = leaky_relu02(Conv(self.chan_embed, (3, 3), padding=1, name="conv1")(x))
        x = leaky_relu02(Conv(self.chan_embed, (3, 3), padding=1, name="conv2")(x))
        return Conv(6, (1, 1), name="conv3")(x)
