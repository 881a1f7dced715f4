"""Inference + metric scoring CLI. Parity: reference evals.py.

Per frame: PSNR / SSIM (/LPIPS when weights are provided), optional
histogram-matched *_HM variants, first-20 image dumps, and a final
Metrics.json with the six aggregates (evals.py:184-192).
"""

from __future__ import annotations

import argparse
import json
import logging
import os

import cv2
import jax.numpy as jnp
import numpy as np

from ..core.config import Config, add_config_args, config_from_args
from ..data import create_dataset, device_prefetch, gt_path_for
from ..eval import LPIPSScorer, frame_metrics, match_histograms, to_uint8
from ..pipeline import predict_step
from .common import load_variables, setup_logging, write_png


def run_evals(
    config: Config,
    *,
    lpips_weights: str | None = None,
    is_hist_match: bool = True,
    is_save_img: bool = True,
) -> dict:
    setup_logging(config.save)
    log = logging.getLogger()
    log.info("Model path = %s", str(config.model_pretrain))

    net_vars, raft_vars = load_variables(config)
    lpips_fn = LPIPSScorer.maybe_load(lpips_weights)
    if lpips_fn is None:
        log.warning("LPIPS weights unavailable: LPIPS reported as null")

    size = (config.frame_width, config.frame_height)
    test_ds = create_dataset(
        config.dataset, config.lowlight_images_path, "test", size=size
    )
    print("Total image number: ", str(len(test_ds)))

    totals = {k: 0.0 for k in (
        "psnr", "ssim", "lpips", "psnr_hm", "ssim_hm", "lpips_hm")}
    num_img = 0
    carry = None

    for i, rec in enumerate(
        device_prefetch(test_ds.iter_u8(), depth=config.prefetch_depth)
    ):
        if carry is None:
            zeros = jnp.zeros_like(rec.image)
            carry = {"last_H3": zeros, "last_s3": zeros}
        (H2, H3, _s3), carry = predict_step(
            net_vars, raft_vars, rec.image, carry,
            jnp.asarray(rec.is_new_seq),
            of_scale=config.of_scale, raft_iters=config.raft_iters,
            enh_scale=config.enh_scale,
        )
        gt_path = gt_path_for(rec.path)
        gt_bgr = cv2.imread(gt_path, cv2.IMREAD_COLOR)
        if gt_bgr is None:
            log.warning("missing GT for %s -> skipped", rec.path)
            continue
        gt01 = cv2.cvtColor(gt_bgr, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        out01 = np.asarray(H3)[0]
        if gt01.shape != out01.shape:
            gt01 = cv2.resize(
                gt01, (out01.shape[1], out01.shape[0]),
                interpolation=cv2.INTER_CUBIC,
            )

        m = frame_metrics(out01, gt01, lpips_fn)
        num_img += 1
        for k in ("psnr", "ssim", "lpips"):
            if m[k] is not None:
                totals[k] += m[k]
        print(
            f"NUM: {num_img}, PSNR: {m['psnr']:.3f}, SSIM: {m['ssim']:.3f}, "
            f"LPIPS: {m['lpips'] if m['lpips'] is not None else float('nan'):.3f}"
        )

        hm01 = None
        if is_hist_match:
            hm01 = match_histograms(out01, gt01)
            mh = frame_metrics(hm01, gt01, lpips_fn)
            for k in ("psnr", "ssim", "lpips"):
                if mh[k] is not None:
                    totals[k + "_hm"] += mh[k]
            print(
                f"NUM: {num_img}, PSNR_HM: {mh['psnr']:.3f}, "
                f"SSIM_HM: {mh['ssim']:.3f}"
            )

        if is_save_img and i < 20:
            splits = rec.path.split(os.sep)
            save_dir = os.path.join(config.save, splits[-3], splits[-2])
            os.makedirs(save_dir, exist_ok=True)
            write_png(os.path.join(save_dir, rec.name + "_denoise.png"), out01)
            write_png(
                os.path.join(save_dir, rec.name + "_enhance.png"),
                np.asarray(H2)[0],
            )
            if hm01 is not None:
                cv2.imwrite(
                    os.path.join(save_dir, rec.name + "_denoise_hm.png"),
                    cv2.cvtColor(to_uint8(hm01), cv2.COLOR_RGB2BGR),
                )

    n = max(num_img, 1)
    # LPIPS is null (not 0.0) when never measured: downstream consumers must
    # be able to distinguish "perfect" from "not measured"
    measured_lpips = lpips_fn is not None and num_img > 0
    metrics = {
        "Total_PSNR": totals["psnr"] / n,
        "Total_SSIM": totals["ssim"] / n,
        "Total_LPIPS": totals["lpips"] / n if measured_lpips else None,
        "Total_PSNR_HM": totals["psnr_hm"] / n,
        "Total_SSIM_HM": totals["ssim_hm"] / n,
        "Total_LPIPS_HM": totals["lpips_hm"] / n if measured_lpips else None,
    }
    with open(os.path.join(config.save, "Metrics.json"), "w") as f:
        json.dump(metrics, f)
    return metrics


def main(argv=None):
    from ..core.cache import enable_persistent_cache

    enable_persistent_cache()
    parser = argparse.ArgumentParser("ZERO-IG")
    add_config_args(parser)
    parser.add_argument("--lpips_weights", type=str, default=None)
    args = parser.parse_args(argv)
    config = config_from_args(args)
    run_evals(config, lpips_weights=args.lpips_weights)


if __name__ == "__main__":
    main()
