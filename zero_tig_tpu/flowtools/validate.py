"""Flow validation: EPE/Fl-All/WAUC/px1 over frame-pair datasets + per-image
CSVs, and single-pair inference with optional GT comparison.

Parity: ptlflow_scripts/validate.py (per-dataset metric tables, per-image
CSV at validate.py:482-493) and ptlflow_scripts/infer.py (run on an image
pair / folder, save .flo + visualization, EPE against a single GT,
infer.py:194-206).
"""

from __future__ import annotations

import csv
import glob
import os

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..utils.flow_io import read_gen, write_flo
from ..utils.flow_viz import flow_to_image
from .metrics import flow_metrics
from .registry import get_flow_model


def _load_image(path: str, size: tuple[int, int] | None = None) -> np.ndarray:
    img = cv2.cvtColor(cv2.imread(path, cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)
    if size is not None:
        img = cv2.resize(img, size, interpolation=cv2.INTER_LINEAR)
    return img.astype(np.float32)


def infer_pair(
    model_name: str,
    variables,
    img1_path: str,
    img2_path: str,
    *,
    iters: int | None = None,
    size: tuple[int, int] | None = None,
    gt_flow_path: str | None = None,
    save_dir: str | None = None,
) -> dict:
    """Flow for one frame pair; optionally score vs GT and save artifacts."""
    model = get_flow_model(model_name)
    iters = iters or model.default_iters
    i1 = jnp.asarray(_load_image(img1_path, size)[None])
    i2 = jnp.asarray(_load_image(img2_path, size)[None])
    _, flow_up = jax.jit(
        lambda v, a, b: model.forward_fn(v, a, b, iters)
    )(variables, i1, i2)
    flow = np.asarray(flow_up[0])

    result: dict = {"img1": img1_path, "img2": img2_path}
    if gt_flow_path:
        gt = read_gen(gt_flow_path)
        if gt.shape[:2] != flow.shape[:2]:
            sx = gt.shape[1] / flow.shape[1]
            sy = gt.shape[0] / flow.shape[0]
            flow_r = cv2.resize(flow, (gt.shape[1], gt.shape[0]))
            flow_r[..., 0] *= sx
            flow_r[..., 1] *= sy
        else:
            flow_r = flow
        result.update(flow_metrics(flow_r, np.asarray(gt)))

    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        stem = os.path.splitext(os.path.basename(img2_path))[0]
        write_flo(os.path.join(save_dir, f"{stem}.flo"), flow)
        cv2.imwrite(
            os.path.join(save_dir, f"{stem}_viz.png"),
            cv2.cvtColor(flow_to_image(flow), cv2.COLOR_RGB2BGR),
        )
    return result


def validate_folder(
    model_name: str,
    variables,
    image_dir: str,
    flow_dir: str,
    *,
    image_ext: str = "png",
    flow_ext: str = "flo",
    iters: int | None = None,
    csv_path: str | None = None,
) -> dict:
    """Validate consecutive pairs in `image_dir` against GT flows named by
    the FIRST frame's stem in `flow_dir`. Returns aggregate metrics."""
    frames = sorted(glob.glob(os.path.join(image_dir, f"*.{image_ext}")))
    rows = []
    for f1, f2 in zip(frames[:-1], frames[1:]):
        stem = os.path.splitext(os.path.basename(f1))[0]
        gt_path = os.path.join(flow_dir, f"{stem}.{flow_ext}")
        if not os.path.exists(gt_path):
            continue
        r = infer_pair(
            model_name, variables, f1, f2, iters=iters, gt_flow_path=gt_path
        )
        r["name"] = stem
        rows.append(r)
    if csv_path and rows:
        with open(csv_path, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=sorted(rows[0]))
            writer.writeheader()
            writer.writerows(rows)
    if not rows:
        return {}
    agg = {
        k: float(np.mean([r[k] for r in rows]))
        for k in ("epe", "fl_all", "px1", "wauc")
        if all(k in r for r in rows)
    }
    agg["num_pairs"] = len(rows)
    return agg
