#!/usr/bin/env python
"""End-to-end streaming inference benchmark: PNG decode -> prefetch ->
fused frame step, overlapped. This is the user-facing frames/sec including
host IO (bench.py measures the device step alone).

Writes N synthetic 1080p frames to a temp dir, then streams them through
the same staging as cli/predict.py.

BENCH_STAGING selects the host->device staging under test:
  chunk (default) -- data.prefetch.chunk_prefetch: ONE uint8 H2D block per
                     --chunk frames, [0,1] normalize in-graph (the round-5
                     dispatch-tax fix applied to the IO path).
  frame           -- the pre-fix path: device_prefetch (device_put +
                     on-device /255 per frame) + jnp.stack per chunk.
  both            -- run frame THEN chunk in one process (same compile
                     cache/session; the only trustworthy A/B through the
                     relay, CLAUDE.md).
"""

from __future__ import annotations

import os
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
CHUNK = int(os.environ.get("BENCH_CHUNK", "8"))
STAGING = os.environ.get("BENCH_STAGING", "chunk")


def run_stream(paths, net_vars, raft_vars, staging):
    """Stream the frames once; returns (sustained_fps, first_chunk_s)."""
    from zero_tig_tpu.data.datasets import FrameDataset
    from zero_tig_tpu.data.prefetch import (
        ChunkRecord,
        chunk_prefetch,
        chunk_records,
        device_prefetch,
    )
    from zero_tig_tpu.pipeline import predict_chunk, predict_step

    ds = FrameDataset(paths, size=(WIDTH, HEIGHT))
    if staging == "chunk":
        items = chunk_prefetch(ds.iter_u8(), CHUNK, depth=3)
    else:
        items = chunk_records(device_prefetch(ds.iter_u8(), depth=3), CHUNK)

    carry = None
    done = 0
    t_first = None
    t0 = time.time()
    for item in items:
        first = t_first is None
        t1 = time.time()
        if isinstance(item, ChunkRecord):
            if carry is None:
                zeros = jnp.zeros(item.images[0].shape, jnp.float32)
                carry = {"last_H3": zeros, "last_s3": zeros}
            (H2s, H3s, _), carry = predict_chunk(
                net_vars, raft_vars, item.images, carry, item.flags,
                of_scale=3, raft_iters=12,
            )
            float(jnp.ravel(H3s)[0])  # scalar sync (axon platform)
            n = len(item.records)
        else:
            if carry is None:
                zeros = jnp.zeros(item.image.shape, jnp.float32)
                carry = {"last_H3": zeros, "last_s3": zeros}
            (H2, H3, s3), carry = predict_step(
                net_vars, raft_vars, item.image, carry,
                jnp.asarray(item.is_new_seq), of_scale=3, raft_iters=12,
            )
            float(jnp.ravel(H3)[0])
            n = 1
        if first:
            t_first = time.time() - t1
            t0 = time.time()
        else:
            done += n
    return done / (time.time() - t0), t_first


def main():
    from zero_tig_tpu.core import precision
    from zero_tig_tpu.data.datasets import FrameDataset
    from zero_tig_tpu.models import (
        init_network_variables,
        init_raft_variables,
    )

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

    # host decode rate alone (the 1-core bound on this box)
    ds = FrameDataset(paths, size=(WIDTH, HEIGHT))
    t0 = time.time()
    for rec in ds.iter_u8():
        pass
    decode_fps = FRAMES / (time.time() - t0)
    print(f"# host decode alone: {decode_fps:.2f} fps", file=sys.stderr)

    import json

    runs = ["frame", "chunk"] if STAGING == "both" else [STAGING]
    for staging in runs:
        fps, t_first = run_stream(paths, net_vars, raft_vars, staging)
        print(
            f"# [{staging}] first chunk (compile): {t_first:.1f}s; "
            f"sustained {fps:.2f} fps (chunk={CHUNK}, "
            f"precision={PRECISION})",
            file=sys.stderr,
        )
        print(json.dumps({
            "metric": "1080p_streaming_end_to_end_frames_per_sec",
            "value": round(fps, 3),
            "unit": "frames/sec",
            "staging": staging,
            "host_decode_fps": round(decode_fps, 2),
        }))


if __name__ == "__main__":
    main()
