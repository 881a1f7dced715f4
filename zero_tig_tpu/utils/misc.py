"""Misc utility parity helpers.

Parity: the grab-bag of utils/utils.py -- parameter counting (:81-82),
checkpoint save/copy-best (:86-91), drop_path (:101-107), experiment-dir
script snapshot (:109-118), contact-sheet dump (:120-142), flow viz (:163-
176). Torch-specific pieces are re-expressed over pytrees/numpy.
"""

from __future__ import annotations

import os
import shutil

import jax
import numpy as np


def count_parameters_in_mb(tree, *, exclude_substr: str = "auxiliary") -> float:
    """Millions of parameters (the reference divides by 1e6 and calls it MB,
    utils/utils.py:81-82). Skips leaves whose path contains `exclude_substr`."""
    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if exclude_substr and exclude_substr in jax.tree_util.keystr(path):
            continue
        total += int(np.prod(leaf.shape))
    return total / 1e6


def save_checkpoint(state_bytes: bytes, is_best: bool, save_dir: str) -> str:
    """checkpoint.pth.tar-style save + best copy (utils/utils.py:86-91)."""
    os.makedirs(save_dir, exist_ok=True)
    filename = os.path.join(save_dir, "checkpoint.msgpack")
    with open(filename, "wb") as f:
        f.write(state_bytes)
    if is_best:
        shutil.copyfile(filename, os.path.join(save_dir, "model_best.msgpack"))
    return filename


def drop_path(x, drop_prob: float, key):
    """Stochastic depth on the batch dim (utils/utils.py:101-107), functional."""
    if drop_prob <= 0.0:
        return x
    keep = 1.0 - drop_prob
    mask = jax.random.bernoulli(key, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return x / keep * mask


def create_exp_dir(path: str, scripts_to_save: list[str] | None = None) -> str:
    """Experiment dir + script snapshot (utils/utils.py:109-118)."""
    os.makedirs(path, exist_ok=True)
    print(f"Experiment dir : {path}")
    if scripts_to_save:
        sdir = os.path.join(path, "scripts")
        os.makedirs(sdir, exist_ok=True)
        for script in scripts_to_save:
            shutil.copyfile(script, os.path.join(sdir, os.path.basename(script)))
    return path


def show_pic(pics, names, path: str, *, grid=(5, 6)) -> None:
    """Contact sheet of (B, H, W, C) tensors -> one PNG (utils/utils.py:120-142
    re-expressed with OpenCV; matplotlib-free)."""
    import cv2

    tiles = []
    for img in pics:
        arr = np.asarray(img)
        if arr.ndim == 4:
            arr = arr[0]
        if arr.shape[-1] == 1:
            arr = np.repeat(arr, 3, axis=-1)
        tiles.append(np.clip(arr * 255.0, 0, 255).astype(np.uint8))
    if not tiles:
        return
    h = max(t.shape[0] for t in tiles)
    w = max(t.shape[1] for t in tiles)
    rows, cols = grid
    sheet = np.zeros((rows * h, cols * w, 3), np.uint8)
    for i, t in enumerate(tiles[: rows * cols]):
        r, c = divmod(i, cols)
        sheet[r * h : r * h + t.shape[0], c * w : c * w + t.shape[1]] = t
    cv2.imwrite(path, cv2.cvtColor(sheet, cv2.COLOR_RGB2BGR))


def forward_interpolate(flow: np.ndarray) -> np.ndarray:
    """Forward-splat a flow field onto the regular grid (warm-start helper).

    Parity: utils/utils.py:254-282 (scipy nearest-neighbor griddata over the
    forward-advected valid points). flow: (2, H, W) -> (2, H, W), matching
    the reference's channel-first convention for this helper.
    """
    from scipy import interpolate as sp_interpolate

    dx, dy = np.asarray(flow[0]), np.asarray(flow[1])
    ht, wd = dx.shape
    x0, y0 = np.meshgrid(np.arange(wd), np.arange(ht))
    x1 = (x0 + dx).reshape(-1)
    y1 = (y0 + dy).reshape(-1)
    dxf = dx.reshape(-1)
    dyf = dy.reshape(-1)
    valid = (x1 > 0) & (x1 < wd) & (y1 > 0) & (y1 < ht)
    if not np.any(valid):
        return np.zeros_like(np.asarray(flow, np.float32))
    flow_x = sp_interpolate.griddata(
        (x1[valid], y1[valid]), dxf[valid], (x0, y0),
        method="nearest", fill_value=0,
    )
    flow_y = sp_interpolate.griddata(
        (x1[valid], y1[valid]), dyf[valid], (x0, y0),
        method="nearest", fill_value=0,
    )
    return np.stack([flow_x, flow_y], axis=0).astype(np.float32)


def viz_flow_overlay(img, flow, path: str) -> None:
    """Stacked frame + flow visualization (utils/utils.py:163-176, saved to
    disk instead of cv2.imshow)."""
    import cv2

    from .flow_viz import flow_to_image

    im = np.clip(np.asarray(img)[0] * 255.0, 0, 255).astype(np.uint8)
    flo = flow_to_image(np.asarray(flow)[0])
    if flo.shape[:2] != im.shape[:2]:
        flo = cv2.resize(flo, (im.shape[1], im.shape[0]))
    stacked = np.concatenate([im, flo], axis=0)
    cv2.imwrite(path, cv2.cvtColor(stacked, cv2.COLOR_RGB2BGR))
