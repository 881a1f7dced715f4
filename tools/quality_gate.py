#!/usr/bin/env python
"""Fast-mode quality gate with TRAINED weights (not random init).

Trains the synthetic RLV fixture in 'highest' (f32-faithful) precision,
then evaluates the SAME trained checkpoint under both precision modes on
the fixture's test split with the temporal recurrence active, reporting:

  * mode-vs-mode PSNR of H3 (the headline-precision acceptance number),
  * PSNR/SSIM vs ground truth under each mode (the end-metric delta).

Gate (documented in BASELINE.md): the headline bench runs precision=fast
iff trained-weights mode-vs-mode PSNR >= 40 dB AND the GT-metric deltas
are below 0.05 dB PSNR / 0.001 SSIM AND the worst 32x32-block
mode-vs-mode PSNR stays >= 30 dB (localized artifacts -- e.g. the
block-gather warp clamping at flow discontinuities -- must not hide in
frame averages). Otherwise the headline must fall back to 'highest'.

--occluder overlays a textured patch translating 5 px/frame on the
fixture, putting real flow discontinuities in the warp maps: this is the
content that exercises the fast path's ONE approximate kernel
(grid_sample_pixel_block clamps when a 2x2 block's corner span exceeds
its 4x4 footprint, ops/sampling.py). Run the gate BOTH ways.

Usage: python tools/quality_gate.py [--size 256 --epochs 2 --frames 6]
(runs on whatever backend JAX selects; CPU works at small sizes).
"""

from __future__ import annotations

import argparse
import json
import tempfile

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument(
        "--width", type=int, default=0,
        help="eval frame width (default: --size; use 1920 for the "
        "headline-scale gate)",
    )
    ap.add_argument(
        "--height", type=int, default=0,
        help="eval frame height (default: --size)",
    )
    ap.add_argument(
        "--train_width", type=int, default=0,
        help="train on a SEPARATE lower-res fixture of this width "
        "(default: train at the eval resolution). The conv nets are "
        "resolution-agnostic and every fast-mode approximation under "
        "test (bf16, xpack, block-gather warp) is inference-time, so "
        "train-small/eval-big certifies them at scales where the "
        "monolithic f32 training graph cannot compile (1080p).",
    )
    ap.add_argument("--train_height", type=int, default=0)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--of_scale", type=int, default=2)
    ap.add_argument("--raft_iters", type=int, default=8)
    ap.add_argument("--occluder", action="store_true")
    ap.add_argument(
        "--fast_enh_scale", type=int, default=1,
        help="enh_scale applied to the FAST mode run only (gates the "
        "half-res illumination-estimator operating point)",
    )
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from zero_tig_tpu.core import precision
    from zero_tig_tpu.core.config import Config
    from zero_tig_tpu.data import create_dataset, make_rlv_fixture
    from zero_tig_tpu.eval.metrics import psnr_uint8, ssim_uint8
    from zero_tig_tpu.models import init_network_variables, init_raft_variables
    from zero_tig_tpu.pipeline import (
        init_train_state,
        predict_step,
        train_step,
    )

    ew = args.width or args.size
    eh = args.height or args.size
    tw = args.train_width or ew
    th = args.train_height or eh

    root = tempfile.mkdtemp(prefix="qgate_rlv_")
    make_rlv_fixture(
        root, frames_per_scene=args.frames, size=(ew, eh),
        occluder=args.occluder,
    )
    if (tw, th) != (ew, eh):
        train_root = tempfile.mkdtemp(prefix="qgate_rlv_train_")
        make_rlv_fixture(
            train_root, frames_per_scene=args.frames, size=(tw, th),
            occluder=args.occluder,
        )
    else:
        train_root = root
    cfg = Config(
        lowlight_images_path=root,
        dataset="RLV",
        frame_width=ew,
        frame_height=eh,
        of_scale=args.of_scale,
        raft_iters=args.raft_iters,
    )

    # ---- train in f32-faithful mode
    precision.set_precision("highest")
    net_vars = init_network_variables(jax.random.PRNGKey(cfg.seed))
    raft_vars = init_raft_variables(jax.random.PRNGKey(cfg.seed + 1))
    shape = (1, eh, ew, 3)
    train_shape = (1, th, tw, 3)
    state = init_train_state(cfg, net_vars, train_shape)

    train_ds = create_dataset(cfg.dataset, train_root, "train",
                              size=(tw, th))
    sk = dict(of_scale=cfg.of_scale, raft_iters=cfg.raft_iters)
    for epoch in range(args.epochs):
        losses = []
        for rec in train_ds:
            frame = jnp.asarray(np.asarray(rec.image, np.float32)[None])
            state, loss = train_step(
                state, raft_vars, frame, jnp.asarray(rec.is_new_seq),
                bn_train=(epoch == 0), **sk,
            )
            losses.append(float(loss))
        print(f"# epoch {epoch}: mean loss {np.mean(losses):.2f}", flush=True)

    trained = {"params": state.params, "batch_stats": state.batch_stats}

    # ---- eval the trained weights under both modes
    test_ds = create_dataset(cfg.dataset, root, "test",
                             size=(ew, eh))
    records = list(test_ds)

    def run_mode(mode):
        precision.set_precision(mode)
        jax.clear_caches()
        carry = {
            "last_H3": jnp.zeros(shape, jnp.float32),
            "last_s3": jnp.zeros(shape, jnp.float32),
        }
        mode_kwargs = dict(sk)
        if mode == "fast":
            mode_kwargs["enh_scale"] = args.fast_enh_scale
        outs = []
        for rec in records:
            frame = jnp.asarray(np.asarray(rec.image, np.float32)[None])
            (H2, H3, s3), carry = predict_step(
                trained, raft_vars, frame, carry,
                jnp.asarray(rec.is_new_seq), **mode_kwargs,
            )
            outs.append(np.asarray(H3[0], np.float32))
        return outs

    hi = run_mode("highest")
    fa = run_mode("fast")
    precision.set_precision("highest")

    def worst_block_psnr(a, b, blk=32):
        """Lowest per-32x32-block PSNR between modes: localized clamping
        artifacts (block-gather warp at flow discontinuities) must not
        average away in the frame-level number."""
        h_, w_ = a.shape[:2]
        hb, wb = h_ // blk, w_ // blk
        d = (a[: hb * blk, : wb * blk] - b[: hb * blk, : wb * blk]) ** 2
        mse = d.reshape(hb, blk, wb, blk, -1).mean(axis=(1, 3, 4))
        worst = float(mse.max())
        return 10 * np.log10(1.0 / worst) if worst > 0 else 99.0

    mode_psnrs = []
    worst_blocks = []
    max_abs = []
    gt_metrics = {"highest": [], "fast": []}
    for rec, a, b in zip(records, hi, fa):
        mse = float(np.mean((a - b) ** 2))
        mode_psnrs.append(10 * np.log10(1.0 / mse) if mse > 0 else 99.0)
        worst_blocks.append(worst_block_psnr(a, b))
        max_abs.append(float(np.abs(a - b).max()))
        gt_path = rec.path.replace("input", "gt").replace(
            "low_light_", "normal_light_"
        )
        # GT through the SAME PIL-exact decode/resize path as the input
        # frames (FrameDataset.load_image_u8) -- a raw cv2.resize would
        # score against differently-resampled references at non-native
        # sizes (PARITY.md "Resize semantics")
        gt = test_ds.load_image_u8(gt_path)
        for mode, out in (("highest", a), ("fast", b)):
            u8 = np.clip(out * 255.0, 0, 255).astype(np.uint8)
            gt_metrics[mode].append(
                (psnr_uint8(u8, gt), ssim_uint8(u8, gt))
            )

    res = {
        "occluder": bool(args.occluder),
        "eval_size": f"{ew}x{eh}",
        "train_size": f"{tw}x{th}",
        "fast_enh_scale": int(args.fast_enh_scale),
        "trained_mode_vs_mode_psnr_db": round(float(np.mean(mode_psnrs)), 2),
        "worst_block32_psnr_db": round(float(np.min(worst_blocks)), 2),
        "max_abs_diff": round(float(np.max(max_abs)), 5),
        "gt_psnr_highest": round(
            float(np.mean([m[0] for m in gt_metrics["highest"]])), 3),
        "gt_psnr_fast": round(
            float(np.mean([m[0] for m in gt_metrics["fast"]])), 3),
        "gt_ssim_highest": round(
            float(np.mean([m[1] for m in gt_metrics["highest"]])), 4),
        "gt_ssim_fast": round(
            float(np.mean([m[1] for m in gt_metrics["fast"]])), 4),
    }
    res["gate_pass_fast"] = bool(
        res["trained_mode_vs_mode_psnr_db"] >= 40.0
        and res["worst_block32_psnr_db"] >= 30.0
        and abs(res["gt_psnr_highest"] - res["gt_psnr_fast"]) < 0.05
        and abs(res["gt_ssim_highest"] - res["gt_ssim_fast"]) < 0.001
    )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
