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


# torchvision vgg16().features Sequential indices of the 13 convs (fixed
# by the published architecture; documented at pytorch.org/vision vgg16)
VGG16_CONV_SEQ_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
# expected (out, in) channels per conv, in order
_VGG_CONV_SHAPES = [
    (64, 3), (64, 64), (128, 64), (128, 128), (256, 128), (256, 256),
    (256, 256), (512, 256), (512, 512), (512, 512), (512, 512),
    (512, 512), (512, 512),
]
_LIN_CHANNELS = (64, 128, 256, 512, 512)


def _check_conv(conv_i: int, key: str, w: np.ndarray) -> None:
    want = (*_VGG_CONV_SHAPES[conv_i], 3, 3)
    if tuple(w.shape) != want:
        raise ValueError(
            f"LPIPS converter: {key} has shape {tuple(w.shape)}, expected "
            f"{want} (torchvision vgg16 conv #{conv_i}) -- wrong or "
            f"reordered state dict?"
        )


def convert_torch_lpips(vgg_features_sd: dict, lpips_sd: dict, out_path: str):
    """Build lpips_weights.npz from torch state dicts (run where available).

    vgg_features_sd: torchvision vgg16 ``.features.state_dict()`` (keys
    '0.weight', '0.bias', '2.weight', ... torch Sequential indices
    ``VGG16_CONV_SEQ_IDX``).
    lpips_sd: lpips.LPIPS(net='vgg') state dict with 'lin{j}.model.1.weight'.

    Every key and shape is validated loudly: real weights cannot silently
    mis-convert.
    """
    arrays = {}
    for conv_i, seq_i in enumerate(VGG16_CONV_SEQ_IDX):
        for leaf in ("weight", "bias"):
            if f"{seq_i}.{leaf}" not in vgg_features_sd:
                raise KeyError(
                    f"LPIPS converter: missing '{seq_i}.{leaf}' -- expected "
                    f"torchvision vgg16 .features.state_dict() keys "
                    f"{{i}}.weight/{{i}}.bias for i in {VGG16_CONV_SEQ_IDX}"
                )
        w = np.asarray(vgg_features_sd[f"{seq_i}.weight"], np.float32)
        b = np.asarray(vgg_features_sd[f"{seq_i}.bias"], np.float32)
        _check_conv(conv_i, f"{seq_i}.weight", w)
        arrays[f"conv{conv_i}_w"] = w.transpose(2, 3, 1, 0)  # OIHW->HWIO
        arrays[f"conv{conv_i}_b"] = b
    _convert_lins(lpips_sd, arrays)
    np.savez(out_path, **arrays)


def convert_lpips_full(lpips_full_sd: dict, out_path: str):
    """Build lpips_weights.npz from ONE full ``lpips.LPIPS(net='vgg')``
    state dict (``.state_dict()`` of the instantiated scorer, which embeds
    the VGG backbone as ``net.slice{1..5}.{orig_seq_idx}.weight`` -- the
    lpips package's vgg16 wrapper preserves torchvision Sequential indices
    inside its five slices).
    """
    slice_of_idx = {}
    for s, lo, hi in ((1, 0, 4), (2, 4, 9), (3, 9, 16), (4, 16, 23),
                      (5, 23, 30)):
        for i in range(lo, hi):
            slice_of_idx[i] = s

    arrays = {}
    for conv_i, seq_i in enumerate(VGG16_CONV_SEQ_IDX):
        key = f"net.slice{slice_of_idx[seq_i]}.{seq_i}.weight"
        if key not in lpips_full_sd:
            raise KeyError(
                f"LPIPS converter: missing '{key}' -- expected a full "
                f"lpips.LPIPS(net='vgg').state_dict() (net.sliceN.I.* keys)"
            )
        w = np.asarray(lpips_full_sd[key], np.float32)
        _check_conv(conv_i, key, w)
        b = np.asarray(
            lpips_full_sd[key.replace(".weight", ".bias")], np.float32
        )
        arrays[f"conv{conv_i}_w"] = w.transpose(2, 3, 1, 0)
        arrays[f"conv{conv_i}_b"] = b

    # cross-check the scaling layer against our baked-in constants
    if "scaling_layer.shift" in lpips_full_sd:
        shift = np.asarray(lpips_full_sd["scaling_layer.shift"]).ravel()
        scale = np.asarray(lpips_full_sd["scaling_layer.scale"]).ravel()
        if not (
            np.allclose(shift, np.asarray(_SHIFT), atol=1e-6)
            and np.allclose(scale, np.asarray(_SCALE), atol=1e-6)
        ):
            raise ValueError(
                f"LPIPS converter: scaling layer {shift}/{scale} differs "
                f"from the published constants {np.asarray(_SHIFT)}/"
                f"{np.asarray(_SCALE)} baked into lpips_distance"
            )
    _convert_lins(lpips_full_sd, arrays)
    np.savez(out_path, **arrays)


def _convert_lins(lpips_sd: dict, arrays: dict) -> None:
    for j, ch in enumerate(_LIN_CHANNELS):
        key = f"lin{j}.model.1.weight"
        if key not in lpips_sd:
            raise KeyError(
                f"LPIPS converter: missing '{key}' -- expected the lpips "
                f"package's linear-head keys lin{{0..4}}.model.1.weight"
            )
        w = np.asarray(lpips_sd[key], np.float32)  # (1, C, 1, 1)
        if tuple(w.shape) != (1, ch, 1, 1):
            raise ValueError(
                f"LPIPS converter: {key} has shape {tuple(w.shape)}, "
                f"expected (1, {ch}, 1, 1)"
            )
        arrays[f"lin{j}_w"] = w.transpose(2, 3, 1, 0)
