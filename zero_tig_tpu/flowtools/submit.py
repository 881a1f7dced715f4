"""Benchmark-format flow submissions.

Parity: ptlflow_scripts/test.py:240-295 -- run a flow model over benchmark
frame pairs and write outputs in the official submission formats: Middlebury
.flo per frame for MPI-Sintel, 16-bit KITTI PNG for KITTI-2012/2015.
"""

from __future__ import annotations

import glob
import os

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..utils.flow_io import write_flo, write_flow_kitti
from .registry import get_flow_model


def _load(path: str) -> np.ndarray:
    return cv2.cvtColor(cv2.imread(path, cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB).astype(
        np.float32
    )


def write_sintel_submission(
    model_name: str,
    variables,
    frames_root: str,
    out_root: str,
    *,
    iters: int | None = None,
) -> int:
    """frames_root/<scene>/frame_NNNN.png -> out_root/<scene>/frame_NNNN.flo.
    Returns the number of flow files written."""
    model = get_flow_model(model_name)
    iters = iters or model.default_iters
    fwd = jax.jit(lambda v, a, b: model.forward_fn(v, a, b, iters)[1])
    count = 0
    for scene in sorted(os.listdir(frames_root)):
        sdir = os.path.join(frames_root, scene)
        if not os.path.isdir(sdir):
            continue
        frames = sorted(glob.glob(os.path.join(sdir, "*.png")))
        odir = os.path.join(out_root, scene)
        os.makedirs(odir, exist_ok=True)
        for f1, f2 in zip(frames[:-1], frames[1:]):
            i1 = jnp.asarray(_load(f1)[None])
            i2 = jnp.asarray(_load(f2)[None])
            flow = np.asarray(fwd(variables, i1, i2)[0])
            stem = os.path.splitext(os.path.basename(f1))[0]
            write_flo(os.path.join(odir, f"{stem}.flo"), flow)
            count += 1
    return count


def write_kitti_submission(
    model_name: str,
    variables,
    image2_dir: str,
    out_dir: str,
    *,
    iters: int | None = None,
) -> int:
    """KITTI layout: image_2/NNNNNN_10.png + _11.png pairs ->
    out_dir/NNNNNN_10.png 16-bit flow. Returns pairs written."""
    model = get_flow_model(model_name)
    iters = iters or model.default_iters
    fwd = jax.jit(lambda v, a, b: model.forward_fn(v, a, b, iters)[1])
    os.makedirs(out_dir, exist_ok=True)
    firsts = sorted(glob.glob(os.path.join(image2_dir, "*_10.png")))
    count = 0
    for f1 in firsts:
        f2 = f1.replace("_10.png", "_11.png")
        if not os.path.exists(f2):
            continue
        i1 = jnp.asarray(_load(f1)[None])
        i2 = jnp.asarray(_load(f2)[None])
        flow = np.asarray(fwd(variables, i1, i2)[0])
        write_flow_kitti(
            os.path.join(out_dir, os.path.basename(f1)), flow
        )
        count += 1
    return count
