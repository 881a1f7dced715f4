"""Standalone RAFT flow demo. Parity: reference demo.py (minus the
hard-coded Windows paths): loads a RAFT checkpoint, runs flow between
consecutive frame pairs at a chosen size, times the jitted forward, writes
flow visualizations and warped/overlap images.
"""

from __future__ import annotations

import argparse
import glob
import os
import time

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import load_torch_checkpoint
from ..models import init_raft_variables, raft_forward
from ..ops.warp import warp_tensor
from ..utils.flow_viz import flow_to_image


def main(argv=None):
    from ..core.cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser("RAFT demo")
    p.add_argument("--model", type=str, default=None, help="raft checkpoint")
    p.add_argument("--path", type=str, required=True, help="frame folder")
    p.add_argument("--save", type=str, default="./demo_out")
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=360)
    p.add_argument("--iters", type=int, default=15)
    args = p.parse_args(argv)

    if args.model and os.path.exists(args.model):
        _, raft_vars = load_torch_checkpoint(args.model)
        assert raft_vars is not None, "no RAFT weights found in checkpoint"
    else:
        print("WARNING: no checkpoint -- running random-init RAFT")
        raft_vars = init_raft_variables(jax.random.PRNGKey(0))

    frames = sorted(
        glob.glob(os.path.join(args.path, "*.png"))
        + glob.glob(os.path.join(args.path, "*.jpg"))
    )
    os.makedirs(args.save, exist_ok=True)

    @jax.jit
    def flow_fn(v, i1, i2):
        return raft_forward(v, i1, i2, iters=args.iters)

    def load(fp):
        img = cv2.cvtColor(cv2.imread(fp), cv2.COLOR_BGR2RGB)
        img = cv2.resize(img, (args.width, args.height))
        return jnp.asarray(img[None].astype(np.float32))

    for f1, f2 in zip(frames[:-1], frames[1:]):
        i1, i2 = load(f1), load(f2)
        t1 = time.time()
        _, flow_up = flow_fn(raft_vars, i1, i2)
        flow_up.block_until_ready()
        t2 = time.time()
        print(f"{os.path.basename(f1)} -> {os.path.basename(f2)}: "
              f"{t2 - t1:.4f}s")

        flo_rgb = flow_to_image(np.asarray(flow_up[0]))
        warped, overlap = warp_tensor(flow_up, i1 / 255.0, i2 / 255.0)
        stem = os.path.splitext(os.path.basename(f2))[0]
        cv2.imwrite(
            os.path.join(args.save, f"{stem}_flow.png"),
            cv2.cvtColor(flo_rgb, cv2.COLOR_RGB2BGR),
        )
        over = (np.clip(np.asarray(overlap[0]), 0, 1) * 255).astype(np.uint8)
        cv2.imwrite(
            os.path.join(args.save, f"{stem}_overlap.png"),
            cv2.cvtColor(over, cv2.COLOR_RGB2BGR),
        )


if __name__ == "__main__":
    main()
