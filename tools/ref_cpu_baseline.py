#!/usr/bin/env python
"""Measured same-host CPU baseline: the reference's Finetunemodel inference
(torch, CPU -- its predict path is CPU-capable, predict.py:16-17) vs our
predict_step on the SAME frames, frame count, and host.

Anchors bench.py's vs_baseline ratio with at least one measured number
(VERDICT r4 item 4): the A100 figure stays an estimate (BASELINE.md
"Reference baseline estimate"), but the reference-vs-ours ratio on this
host is real. Identical semantics both sides: same random weights via the
.pt converter round trip, RAFT weights loaded explicitly on the reference
(its Finetunemodel drops raft.* keys -- model/model.py:272-286, fixed here
exactly as tests/test_composed_oracle.py does), eval-mode BN, recurrence
active (first frame is_new_seq=True).

torchvision is absent in this image, so a stub exposing
transforms.functional.equalize (the documented torchvision LUT algorithm,
same as our golden-tested ops/equalize.py) is injected before importing the
reference -- identical to the oracle tests' stub.

Usage:
    python tools/ref_cpu_baseline.py [--width 512 --height 512 --frames 4]
    # 1080p (several minutes of torch-CPU RAFT):
    python tools/ref_cpu_baseline.py --width 1920 --height 1080 --frames 3
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import tempfile
import time
import types

import numpy as np

REF = "/root/reference"


def _install_ref_env():
    import torch

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
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr
    sys.modules["torchvision.transforms.functional"] = fn

    torch.Tensor.cuda = lambda self, *a, **k: self
    load_orig = torch.load

    def cpu_load(*a, **k):
        k["map_location"] = "cpu"
        k.setdefault("weights_only", False)
        return load_orig(*a, **k)

    torch.load = cpu_load
    sys.path.insert(0, REF)


def _frames(n, h, w, seed=11):
    """Slowly panning low-light sequence (real flow between frames)."""
    rng = np.random.default_rng(seed)
    # row offset reaches n-1 and column offset 2*(n-1): headroom must
    # cover both (h+8 rows only allowed --frames <= 9)
    base = rng.uniform(0.02, 0.5, (h + n + 8, w + 2 * n + 8, 3)).astype(
        np.float32
    )
    import cv2

    base = cv2.filter2D(base, -1, np.ones((3, 3), np.float32) / 9.0)
    return [base[i : i + h, 2 * i : 2 * i + w][None] for i in range(n)]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--of_scale", type=int, default=3)
    ap.add_argument(
        "--skip_ref", action="store_true",
        help="only measure our CPU path (e.g. re-runs)",
    )
    args = ap.parse_args(argv)
    h, w, n = args.height, args.width, args.frames

    # ---- our side first (jax claims no devices on CPU) ----------------
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import torch

    torch.set_num_threads(max(torch.get_num_threads(), 1))

    from zero_tig_tpu.core import precision
    from zero_tig_tpu.core.checkpoint import save_torch_pt
    from zero_tig_tpu.models import (
        init_network_variables,
        init_raft_variables,
    )
    from zero_tig_tpu.pipeline import predict_step

    net_vars = init_network_variables(jax.random.PRNGKey(2))
    raft_vars = init_raft_variables(jax.random.PRNGKey(3))
    frames = _frames(n, h, w)
    flags = [True] + [False] * (n - 1)

    res = {"host": "1-core CPU (this VM)", "size": f"{w}x{h}", "frames": n,
           "of_scale": args.of_scale, "raft_iters": 12}

    for mode in ("highest", "fast"):
        precision.set_precision(mode)
        jax.clear_caches()
        carry = {
            "last_H3": jnp.zeros((1, h, w, 3), jnp.float32),
            "last_s3": jnp.zeros((1, h, w, 3), jnp.float32),
        }
        times = []
        for i, (f, new) in enumerate(zip(frames, flags)):
            t0 = time.time()
            (H2, H3, s3), carry = predict_step(
                net_vars, raft_vars, jnp.asarray(f), carry,
                jnp.asarray(new), of_scale=args.of_scale, raft_iters=12,
            )
            jax.block_until_ready(H3)
            dt = time.time() - t0
            if i > 0:  # frame 0 pays compile
                times.append(dt)
            print(f"# ours[{mode}] frame {i}: {dt:.2f}s", file=sys.stderr)
        res[f"ours_{mode}_ms_per_frame"] = round(
            statistics.median(times) * 1e3, 1
        )
    precision.set_precision("highest")

    # ---- reference side ------------------------------------------------
    if not args.skip_ref:
        _install_ref_env()
        from model.model import Finetunemodel  # noqa: E402

        ckpt = tempfile.mktemp(suffix=".pt")
        save_torch_pt(ckpt, net_vars, raft_vars)
        ns = argparse.Namespace(
            dataset="RLV", of_scale=args.of_scale, model_pretrain=ckpt,
            small=False, dropout=0.0, alternate_corr=False,
            mixed_precision=False,
        )
        ref = Finetunemodel(ns)
        raft_sd = {
            k[len("raft."):]: v
            for k, v in torch.load(ckpt).items()
            if k.startswith("raft.")
        }
        _, unexpected = ref.raft.load_state_dict(raft_sd, strict=False)
        assert not unexpected
        ref.eval()

        times = []
        for i, (f, new) in enumerate(zip(frames, flags)):
            ref.is_new_seq = new
            t = torch.from_numpy(
                np.ascontiguousarray(f.transpose(0, 3, 1, 2))
            )
            t0 = time.time()
            with torch.no_grad():
                ref(t)
            dt = time.time() - t0
            if i > 0:  # frame 0 has no flow/warp (new seq): not comparable
                times.append(dt)
            print(f"# reference frame {i}: {dt:.2f}s", file=sys.stderr)
        res["reference_ms_per_frame"] = round(
            statistics.median(times) * 1e3, 1
        )
        res["speedup_highest"] = round(
            res["reference_ms_per_frame"]
            / res["ours_highest_ms_per_frame"], 2,
        )
        res["speedup_fast"] = round(
            res["reference_ms_per_frame"] / res["ours_fast_ms_per_frame"], 2
        )

    print(json.dumps(res))


if __name__ == "__main__":
    main()
