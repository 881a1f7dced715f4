"""Optical-flow accuracy metrics.

Parity: the ptlflow validation metrics the reference sidecar reports
(ptlflow_scripts/validate.py:440-450, infer.py:194-206): end-point error
(EPE), Fl-All (outlier rate: EPE > 3px AND > 5% of GT magnitude), px1
(fraction within 1px), and WAUC (KITTI-2015 weighted area under the
inlier-threshold curve, thresholds 1..5 px weighted toward small errors).
"""

from __future__ import annotations

import numpy as np


def flow_metrics(
    pred: np.ndarray, gt: np.ndarray, valid: np.ndarray | None = None
) -> dict[str, float]:
    """pred/gt: (H, W, 2); valid: optional (H, W) mask."""
    epe_map = np.sqrt(np.sum((pred - gt) ** 2, axis=-1))
    mag = np.sqrt(np.sum(gt**2, axis=-1))
    if valid is None:
        valid = np.ones(epe_map.shape, bool)
    else:
        valid = valid.astype(bool)
    epe_v = epe_map[valid]
    mag_v = mag[valid]
    if epe_v.size == 0:
        return {"epe": float("nan"), "fl_all": float("nan"),
                "px1": float("nan"), "wauc": float("nan")}

    fl = (epe_v > 3.0) & (epe_v > 0.05 * np.maximum(mag_v, 1e-9))
    px1 = float(np.mean(epe_v <= 1.0))

    # WAUC: thresholds delta = 1..5 px, weight w = 1 - (delta-1)/5
    num = 0.0
    den = 0.0
    for delta in range(1, 6):
        w = 1.0 - (delta - 1) / 5.0
        num += w * np.mean(epe_v <= delta)
        den += w
    return {
        "epe": float(np.mean(epe_v)),
        "fl_all": float(np.mean(fl) * 100.0),
        "px1": px1,
        "wauc": float(100.0 * num / den),
    }
