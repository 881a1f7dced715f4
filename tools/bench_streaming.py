#!/usr/bin/env python
"""End-to-end streaming inference benchmark: PNG decode -> prefetch ->
fused frame step, overlapped. This is the user-facing frames/sec including
host IO (bench.py measures the device step alone).

Writes N synthetic 1080p frames to a temp dir, then streams them through
data.device_prefetch + pipeline.predict_step exactly like cli/predict.py.
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

import cv2
import numpy as np

import jax
import jax.numpy as jnp

HEIGHT = int(os.environ.get("BENCH_HEIGHT", "1080"))
WIDTH = int(os.environ.get("BENCH_WIDTH", "1920"))
FRAMES = int(os.environ.get("BENCH_FRAMES", "16"))
PRECISION = os.environ.get("BENCH_PRECISION", "fast")


def main():
    from zero_tig_tpu.core import precision
    from zero_tig_tpu.data.datasets import FrameDataset
    from zero_tig_tpu.data.prefetch import device_prefetch
    from zero_tig_tpu.models import (
        init_network_variables,
        init_raft_variables,
    )
    from zero_tig_tpu.pipeline import predict_step

    precision.set_precision(PRECISION)

    tmp = tempfile.mkdtemp(prefix="bench_stream_")
    rng = np.random.default_rng(0)
    base = cv2.GaussianBlur(
        (rng.random((HEIGHT, WIDTH, 3)) * 255).astype(np.uint8), (31, 31), 8
    )
    paths = []
    for i in range(FRAMES):
        img = np.clip(
            base.astype(int) + rng.integers(-8, 8, base.shape), 0, 255
        ).astype(np.uint8)
        p = os.path.join(tmp, f"{i:05d}.png")
        cv2.imwrite(p, img)
        paths.append(p)
    print(f"# wrote {FRAMES} frames {HEIGHT}x{WIDTH}", file=sys.stderr)

    net_vars = init_network_variables(jax.random.PRNGKey(0))
    raft_vars = init_raft_variables(jax.random.PRNGKey(1))
    ds = FrameDataset(paths, size=(WIDTH, HEIGHT))

    carry = None
    times = []
    t_first = None
    t0 = time.time()
    for i, rec in enumerate(device_prefetch(ds.iter_u8(), depth=3)):
        if carry is None:
            zeros = jnp.zeros_like(rec.image)
            carry = {"last_H3": zeros, "last_s3": zeros}
        t1 = time.time()
        (H2, H3, s3), carry = predict_step(
            net_vars, raft_vars, rec.image, carry,
            jnp.asarray(rec.is_new_seq), of_scale=3, raft_iters=12,
        )
        float(jax.device_get(H3.ravel()[0]))  # full sync (axon platform)
        if i == 0:
            t_first = time.time() - t1
            t0 = time.time()
        else:
            times.append(time.time() - t1)
    total = time.time() - t0
    per = statistics.median(times)
    print(
        f"# first frame (compile): {t_first:.1f}s; steady-state median "
        f"{per * 1e3:.1f} ms/frame; sustained {(FRAMES - 1) / total:.2f} fps "
        f"(decode+H2D+compute overlapped, precision={PRECISION})",
        file=sys.stderr,
    )
    import json

    print(json.dumps({
        "metric": "1080p_streaming_end_to_end_frames_per_sec",
        "value": round((FRAMES - 1) / total, 3),
        "unit": "frames/sec",
    }))


if __name__ == "__main__":
    main()
