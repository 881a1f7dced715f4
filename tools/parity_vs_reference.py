#!/usr/bin/env python
"""Turnkey real-weights A/B harness vs the reference implementation.

The reference's evaluated behavior flows entirely from its released blobs
(weights/BVI-RLV.pt, weights/BVI-Coral.pt, weights/raft-sintel.pth --
/root/reference/.MISSING_LARGE_BLOBS:2-4), which are absent from this image.
The moment they appear, this ONE command fires the full parity A/B:

    python tools/parity_vs_reference.py \
        --weights /path/to/BVI-RLV.pt [--raft /path/to/raft-sintel.pth] \
        [--frames /dir/of/pngs [--gt /dir/of/gt/pngs]] \
        [--lpips /path/to/lpips_weights.npz] [--out report.json]

It converts the checkpoint, runs the reference Finetunemodel (torch CPU,
torchvision equalize stubbed with the documented LUT algorithm) and our
forward_inference on the same frame sequence, and reports per-frame
PSNR(ref, ours) for H2/H3 plus per-side PSNR/SSIM (+LPIPS when weights are
given) against GT.

Reference quirk handled deliberately (model/model.py:272-286, SURVEY 2.2):
Finetunemodel loads its checkpoint BEFORE self.raft exists, so raft.* keys
are dropped and reference inference RAFT runs RANDOM-INIT. Default here is
the FIXED semantics on both sides (RAFT weights loaded explicitly post-
construction on the reference, always loaded on ours); pass --keep_raft_bug
to leave the reference side unloaded so the delta the shipped bug causes
can be quantified.

Self-test (no blobs needed; run in CI / before trusting the harness):

    python tools/parity_vs_reference.py --selftest
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
import tempfile
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
sys.path.insert(0, REPO)


# ---------------------------------------------------------------- ref env

def _install_ref_env(torch):
    """Reference on sys.path + torchvision equalize stub + CPU patches.

    Same environment as tests/test_composed_oracle.py's ref_env fixture.
    """
    sys.path.insert(0, REF)

    def _torch_equalize(img):
        def scale_channel(chan):
            hist = torch.histc(
                chan.to(torch.float32), bins=256, min=0, max=255
            )
            nonzero = hist[hist != 0]
            step = torch.div(nonzero[:-1].sum(), 255, rounding_mode="floor")
            if step == 0:
                return chan
            lut = torch.div(
                torch.cumsum(hist, 0)
                + torch.div(step, 2, rounding_mode="floor"),
                step,
                rounding_mode="floor",
            )
            lut = torch.nn.functional.pad(lut, [1, 0])[:-1].clamp(0, 255)
            return lut[chan.to(torch.int64)].to(torch.uint8)

        flat = img.reshape(-1, img.shape[-2], img.shape[-1])
        out = torch.stack([scale_channel(c) for c in flat])
        return out.reshape(img.shape)

    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    fn = types.ModuleType("torchvision.transforms.functional")
    fn.equalize = _torch_equalize
    tr.functional = fn
    tv.transforms = tr
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tr)
    sys.modules.setdefault("torchvision.transforms.functional", fn)

    torch.Tensor.cuda = lambda self, *a, **k: self
    load_orig = torch.load

    def cpu_load(*a, **k):
        k["map_location"] = "cpu"
        k.setdefault("weights_only", False)
        return load_orig(*a, **k)

    torch.load = cpu_load


def _ref_args(dataset="RLV", of_scale=3, model_pretrain=None):
    return argparse.Namespace(
        dataset=dataset,
        of_scale=of_scale,
        model_pretrain=model_pretrain,
        small=False,
        dropout=0.0,
        alternate_corr=False,
        mixed_precision=False,
    )


# ---------------------------------------------------------------- frames

def _numeric_key(p):
    m = re.findall(r"\d+", os.path.basename(p))
    return (int(m[-1]) if m else 0, p)


def load_frames(frames_dir: str, size=None, limit=None) -> list[np.ndarray]:
    """Sorted PNG/JPG frames as float32 [0,1] HWC (reference ToTensor)."""
    from PIL import Image

    paths = sorted(
        [
            p
            for ext in ("png", "jpg", "jpeg")
            for p in glob.glob(os.path.join(frames_dir, f"*.{ext}"))
        ],
        key=_numeric_key,
    )
    if limit:
        paths = paths[:limit]
    out = []
    for p in paths:
        im = Image.open(p).convert("RGB")
        if size:
            im = im.resize(size, Image.LANCZOS)  # multi_read_data.py:129
        out.append(np.asarray(im, np.float32) / 255.0)
    return out


def synthetic_frames(n=3, h=128, w=128) -> list[np.ndarray]:
    """Slowly panning low-light sequence (real flow between frames)."""
    rng = np.random.default_rng(11)
    base = rng.uniform(0.02, 0.5, (h + 8, w + 8, 3)).astype(np.float32)
    return [base[i : i + h, 2 * i : 2 * i + w] for i in range(n)]


# ---------------------------------------------------------------- metrics

def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(1.0 / mse)


# ---------------------------------------------------------------- sides

def run_reference(torch, frames, *, of_scale, raft_path, weights_path,
                  keep_raft_bug=False):
    """Reference Finetunemodel frame loop -> list of (H2, H3) HWC f32."""
    from model.model import Finetunemodel

    model = Finetunemodel(_ref_args(of_scale=of_scale,
                                    model_pretrain=weights_path))
    if not keep_raft_bug:
        # fix the load-order bug (model/model.py:272-286): RAFT weights are
        # loaded explicitly post-construction, from the standalone file if
        # given, else from the combined checkpoint's raft.* keys
        if raft_path:
            sd = torch.load(raft_path)
            sd = {k[len("module."):] if k.startswith("module.") else k: v
                  for k, v in sd.items()}
        else:
            full = torch.load(weights_path)
            sd = {k[len("raft."):]: v for k, v in full.items()
                  if k.startswith("raft.")}
        if sd:
            model.raft.load_state_dict(sd, strict=False)
    model.eval()

    outs = []
    for i, f in enumerate(frames):
        model.is_new_seq = i == 0
        t = torch.from_numpy(
            np.ascontiguousarray(f.transpose(2, 0, 1))[None]
        )
        with torch.no_grad():
            H2, H3, s3 = model(t)
        outs.append(
            (
                H2[0].detach().numpy().transpose(1, 2, 0),
                H3[0].detach().numpy().transpose(1, 2, 0),
            )
        )
    return outs


def run_ours(frames, *, of_scale, net_vars, raft_vars):
    """Our jitted predict_step frame loop -> list of (H2, H3) HWC f32."""
    import jax
    import jax.numpy as jnp

    from zero_tig_tpu.core import precision
    from zero_tig_tpu.pipeline import predict_step

    precision.set_precision("highest")  # f32-faithful parity mode
    outs = []
    carry = None
    for i, f in enumerate(frames):
        frame = jnp.asarray(f[None])
        if carry is None:
            zeros = jnp.zeros_like(frame)
            carry = {"last_H3": zeros, "last_s3": zeros}
        (H2, H3, s3), carry = predict_step(
            net_vars, raft_vars, frame, carry, jnp.asarray(i == 0),
            of_scale=of_scale, raft_iters=12,
        )
        outs.append((np.asarray(H2[0]), np.asarray(H3[0])))
    return outs


# ---------------------------------------------------------------- main

def run_ab(weights_path, *, raft_path=None, frames=None, gts=None,
           of_scale=3, lpips_path=None, keep_raft_bug=False,
           out_path=None) -> dict:
    import jax
    import torch

    _install_ref_env(torch)

    from zero_tig_tpu.core.checkpoint import load_torch_checkpoint
    from zero_tig_tpu.eval.lpips import LPIPSScorer
    from zero_tig_tpu.eval.metrics import ssim_uint8, to_uint8

    # --- conversion report
    sd = torch.load(weights_path)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    net_vars, raft_vars = load_torch_checkpoint(weights_path)
    if net_vars is None:
        raise SystemExit(f"{weights_path}: no network weights converted")
    n_net = len(jax.tree_util.tree_leaves(net_vars)) if net_vars else 0
    n_raft_ck = len(jax.tree_util.tree_leaves(raft_vars)) if raft_vars else 0
    print(f"converted: {n_net} network tensors, {n_raft_ck} raft tensors "
          f"from {len(sd)} checkpoint keys")

    if raft_path:
        _, raft_vars2 = load_torch_checkpoint(raft_path)
        if raft_vars2 is not None:
            raft_vars = raft_vars2
            print(f"raft: loaded explicitly from {raft_path} "
                  f"({len(jax.tree_util.tree_leaves(raft_vars))} tensors)")
    if raft_vars is None:
        raise SystemExit(
            "no RAFT weights in the checkpoint and no --raft given; "
            "the A/B would compare random flow nets"
        )

    if frames is None:
        frames = synthetic_frames()
        of_scale = 1

    print(f"running reference (torch CPU) on {len(frames)} frames ...")
    ref_outs = run_reference(
        torch, frames, of_scale=of_scale, raft_path=raft_path,
        weights_path=weights_path, keep_raft_bug=keep_raft_bug,
    )
    print("running ours (precision=highest) ...")
    our_outs = run_ours(
        frames, of_scale=of_scale, net_vars=net_vars, raft_vars=raft_vars
    )

    scorer = LPIPSScorer.maybe_load(lpips_path)
    report = {"frames": [], "weights": weights_path, "of_scale": of_scale}
    for i, ((rh2, rh3), (oh2, oh3)) in enumerate(zip(ref_outs, our_outs)):
        row = {
            "frame": i,
            "psnr_ab_H2": round(_psnr(rh2, oh2), 2),
            "psnr_ab_H3": round(_psnr(rh3, oh3), 2),
            "max_abs_H3": round(float(np.abs(rh3 - oh3).max()), 6),
        }
        if gts is not None:
            gt8 = to_uint8(gts[i])
            r8, o8 = to_uint8(rh3), to_uint8(oh3)
            row["ref_psnr_gt"] = round(_psnr(r8 / 255.0, gt8 / 255.0), 2)
            row["our_psnr_gt"] = round(_psnr(o8 / 255.0, gt8 / 255.0), 2)
            row["ref_ssim_gt"] = round(ssim_uint8(r8, gt8), 4)
            row["our_ssim_gt"] = round(ssim_uint8(o8, gt8), 4)
            if scorer:
                row["ref_lpips_gt"] = round(scorer(rh3, gts[i]), 4)
                row["our_lpips_gt"] = round(scorer(oh3, gts[i]), 4)
        report["frames"].append(row)
        print("  " + json.dumps(row))

    report["mean_psnr_ab_H3"] = round(
        float(np.mean([r["psnr_ab_H3"] for r in report["frames"]])), 2
    )
    if gts is not None:
        for k in ("ref_psnr_gt", "our_psnr_gt", "ref_ssim_gt", "our_ssim_gt"):
            report[f"mean_{k}"] = round(
                float(np.mean([r[k] for r in report["frames"]])), 4
            )
    print(f"A/B mean PSNR(ref, ours) on H3: {report['mean_psnr_ab_H3']} dB")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {out_path}")
    return report


def selftest() -> None:
    """Export random-init weights to .pt and run the full A/B on them."""
    import jax

    import torch

    from zero_tig_tpu.core.checkpoint import save_torch_pt
    from zero_tig_tpu.models import (
        init_network_variables,
        init_raft_variables,
    )

    net_vars = init_network_variables(jax.random.PRNGKey(21))
    raft_vars = init_raft_variables(jax.random.PRNGKey(22))
    with tempfile.TemporaryDirectory() as d:
        pt = os.path.join(d, "selftest.pt")
        save_torch_pt(pt, net_vars, raft_vars)
        report = run_ab(pt, of_scale=3, frames=None)
    worst = min(r["psnr_ab_H3"] for r in report["frames"])
    assert worst > 50.0, f"selftest A/B PSNR too low: {worst} dB"
    print(f"SELFTEST PASS (worst per-frame A/B H3 PSNR {worst} dB)")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--weights", help="combined checkpoint (BVI-RLV.pt)")
    p.add_argument("--raft", help="raft-sintel.pth (explicit RAFT load)")
    p.add_argument("--frames", help="dir of sequential PNG frames")
    p.add_argument("--gt", help="dir of GT frames (same order)")
    p.add_argument("--lpips", help="converted lpips_weights.npz")
    p.add_argument("--of_scale", type=int, default=3)
    p.add_argument("--limit", type=int, default=8, help="max frames")
    p.add_argument("--size", default="1920x1080",
                   help="WxH resize (RLV operating point), or 'native'")
    p.add_argument("--keep_raft_bug", action="store_true",
                   help="reproduce the reference's unloaded-RAFT inference")
    p.add_argument("--out", help="write report JSON here")
    p.add_argument("--selftest", action="store_true")
    p.add_argument(
        "--platform", default="cpu",
        help="jax platform for our side (default cpu: the A/B is "
        "f32-faithful parity work; pass 'axon' to score on the TPU)",
    )
    args = p.parse_args(argv)

    import jax

    if args.platform:
        # the axon sitecustomize overrides JAX_PLATFORMS (CLAUDE.md); the
        # config update is the reliable way to force CPU
        jax.config.update("jax_platforms", args.platform)

    if args.selftest:
        selftest()
        return

    if not args.weights:
        p.error("--weights required (or --selftest)")
    size = None
    if args.size != "native":
        w, h = (int(x) for x in args.size.split("x"))
        size = (w, h)
    frames = gts = None
    if args.frames:
        frames = load_frames(args.frames, size=size, limit=args.limit)
        if args.gt:
            gts = load_frames(args.gt, size=size, limit=args.limit)
    run_ab(
        args.weights, raft_path=args.raft, frames=frames, gts=gts,
        of_scale=args.of_scale, lpips_path=args.lpips,
        keep_raft_bug=args.keep_raft_bug, out_path=args.out,
    )


if __name__ == "__main__":
    main()
