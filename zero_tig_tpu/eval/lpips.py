"""LPIPS (VGG16) perceptual distance in JAX.

Parity target: the ``lpips.LPIPS(net='vgg')`` scorer the reference uses
(evals.py:73-89): inputs scaled to [-1, 1], ImageNet-style shift/scale,
VGG16 features after relu1_2/relu2_2/relu3_3/relu4_3/relu5_3, channel
unit-normalization, squared difference, learned non-negative 1x1 linear
heads, spatial mean, sum over layers.

This zero-egress image ships neither torchvision VGG16 weights nor the
LPIPS linear heads, so scoring requires a converted weight file:

    lpips_weights.npz  with arrays
        conv{i}_w (HWIO), conv{i}_b      for the 13 VGG convs, i=0..12
        lin{j}_w  (1,1,C,1)              for the 5 linear heads, j=0..4

``convert_torch_lpips`` builds that file from torchvision's
``vgg16(weights=...).features.state_dict()`` plus the lpips package's
``lin{j}.model.1.weight`` tensors on any machine that has them.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.convs import conv2d

# VGG16 conv plan: (out_channels, follows_pool)
_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512]
# relu indices (counting convs) after which features are tapped:
# relu1_2 -> conv 1, relu2_2 -> conv 3, relu3_3 -> conv 6,
# relu4_3 -> conv 9, relu5_3 -> conv 12
_TAPS = (1, 3, 6, 9, 12)

_SHIFT = jnp.array([-0.030, -0.088, -0.188], jnp.float32)
_SCALE = jnp.array([0.458, 0.448, 0.450], jnp.float32)


def _max_pool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def lpips_distance(weights: dict, img1: jax.Array, img2: jax.Array) -> jax.Array:
    """LPIPS between two (B, H, W, 3) images in [-1, 1], NHWC."""

    def features(x):
        x = (x - _SHIFT) / _SCALE
        feats = []
        conv_i = 0
        for spec in _VGG_CFG:
            if spec == "M":
                x = _max_pool2(x)
                continue
            x = conv2d(
                x, weights[f"conv{conv_i}_w"], weights[f"conv{conv_i}_b"],
                padding=1,
            )
            x = jax.nn.relu(x)
            if conv_i in _TAPS:
                feats.append(x)
            conv_i += 1
        return feats

    f1 = features(img1)
    f2 = features(img2)
    total = jnp.zeros((img1.shape[0],), jnp.float32)
    for j, (a, b) in enumerate(zip(f1, f2)):
        a = a / jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True) + 1e-10)
        b = b / jnp.sqrt(jnp.sum(b * b, axis=-1, keepdims=True) + 1e-10)
        d = (a - b) ** 2
        lin = weights[f"lin{j}_w"]  # (1, 1, C, 1), non-negative
        scored = conv2d(d, lin)  # (B, H, W, 1)
        total = total + jnp.mean(scored, axis=(1, 2, 3))
    return total


class LPIPSScorer:
    """Callable (out01, gt01) -> distance; jitted; None-safe construction."""

    def __init__(self, weights_path: str):
        z = np.load(weights_path)
        self.weights = {k: jnp.asarray(z[k]) for k in z.files}
        self._fn = jax.jit(lambda a, b: lpips_distance(self.weights, a, b))

    @classmethod
    def maybe_load(cls, path: str | None) -> "LPIPSScorer | None":
        if path and os.path.exists(path):
            return cls(path)
        return None

    def __call__(self, out01: np.ndarray, gt01: np.ndarray) -> float:
        # reference cvt_array2tensor: (x - 0.5) * 2 (evals.py:92-98)
        a = jnp.asarray((out01[None] - 0.5) * 2.0, jnp.float32)
        b = jnp.asarray((gt01[None] - 0.5) * 2.0, jnp.float32)
        return float(self._fn(a, b)[0])


def convert_torch_lpips(vgg_features_sd: dict, lpips_sd: dict, out_path: str):
    """Build lpips_weights.npz from torch state dicts (run where available).

    vgg_features_sd: torchvision vgg16 ``.features.state_dict()`` (keys
    '0.weight', '0.bias', '2.weight', ... torch Sequential indices).
    lpips_sd: lpips.LPIPS(net='vgg') state dict with 'lin{j}.model.1.weight'.
    """
    arrays = {}
    conv_i = 0
    seq_i = 0
    for spec in _VGG_CFG:
        if spec == "M":
            seq_i += 1  # MaxPool layer
            continue
        w = np.asarray(vgg_features_sd[f"{seq_i}.weight"])
        b = np.asarray(vgg_features_sd[f"{seq_i}.bias"])
        arrays[f"conv{conv_i}_w"] = w.transpose(2, 3, 1, 0)  # OIHW->HWIO
        arrays[f"conv{conv_i}_b"] = b
        conv_i += 1
        seq_i += 2  # Conv + ReLU
    for j in range(5):
        w = np.asarray(lpips_sd[f"lin{j}.model.1.weight"])  # (1, C, 1, 1)
        arrays[f"lin{j}_w"] = w.transpose(2, 3, 1, 0)
    np.savez(out_path, **arrays)
