#!/usr/bin/env python
"""Per-source device-time profile of the fused inference step.

Runs predict_chunk under jax.profiler and aggregates device op durations by
the emitting SOURCE LINE -- the round-3 lesson baked into a tool: knockout
deltas mis-attribute whenever XLA re-fuses around the removed op (they
booked the warp's 23.4 ms/frame patchify conv at ~7), and isolated
microbenches through the axon relay are dominated by the ~30-40 ms
per-dispatch latency unless scan-amortized. The profiler trace is the
ground truth; this prints it per frame, per source.

Usage: python tools/profile_trace.py [--height 1080 --width 1920
       --chunk 8 --of_scale 3 --raft_iters 12 --precision fast --top 30]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import shutil
import sys
import tempfile


def aggregate(
    trace_dir: str, frames: int, top: int, by_category: bool = False
) -> None:
    """Per-source (default) or per-hlo_category leaf-op device time.

    by_category exists because per-source attribution books layout-
    assignment artifacts (relayout copies, zero-fill loops) on the
    enclosing loop/source line: the 31 ms/frame channel-major warp-table
    zero-fill that round 3's d1 packing triggered was invisible per-source
    (booked on the scan line) and obvious per-category ("wide.body" +
    copy). Break down by category BEFORE believing a scan-line entry.
    """
    files = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not files:
        print("no trace files found", file=sys.stderr)
        return
    with gzip.open(sorted(files)[-1], "rt") as fh:
        tr = json.load(fh)
    agg: collections.Counter = collections.Counter()
    cnt: collections.Counter = collections.Counter()
    loops: collections.Counter = collections.Counter()
    for e in tr.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        a = e.get("args", {})
        if "device_duration_ps" not in a:
            continue
        name = e.get("name", "")
        if name.startswith(("jit_", "$", "np.")):
            continue
        if by_category:
            key = a.get("hlo_category") or name.split(".")[0]
        else:
            key = a.get("source") or name.split(".")[0]
        ms = int(a["device_duration_ps"]) / 1e9
        if a.get("hlo_category") == "while":
            # loop wrappers CONTAIN the leaf ops below -- listing them in
            # the main table would double count
            loops[key] += ms
            continue
        agg[key] += ms
        cnt[key] += 1
    total = 0.0
    head = "hlo_category" if by_category else "source"
    print(f"{'ms/frame':>9}  {'calls':>6}  {head}")
    for k, v in agg.most_common(top):
        print(f"{v / frames:9.3f}  {cnt[k]:6d}  {k}")
        total += v
    print(f"total accounted (leaf ops): {total / frames:.1f} ms/frame")
    for k, v in loops.most_common(5):
        print(f"(loop total, overlaps leaves) {v / frames:7.2f} ms/frame  {k}")


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--trace_dir",
        help="aggregate an EXISTING jax.profiler trace directory instead "
        "of running predict_chunk (e.g. a trace captured through "
        "tools/tpu_worker.py); --chunk must match the frames per "
        "dispatch of the traced program (1 for a single step)",
    )
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--of_scale", type=int, default=3)
    ap.add_argument("--raft_iters", type=int, default=12)
    ap.add_argument("--precision", default="fast")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument(
        "--by_category", action="store_true",
        help="aggregate by hlo_category instead of source line (finds "
        "layout-assignment artifacts that per-source booking hides)",
    )
    args = ap.parse_args(argv)

    if args.trace_dir:
        aggregate(
            args.trace_dir, args.chunk, args.top,
            by_category=args.by_category,
        )
        return

    import jax
    import jax.numpy as jnp
    import jax.profiler

    from zero_tig_tpu.core import precision
    from zero_tig_tpu.models import (
        init_network_variables,
        init_raft_variables,
    )
    from zero_tig_tpu.pipeline import predict_chunk

    precision.set_precision(args.precision)
    net_vars = init_network_variables(jax.random.PRNGKey(0))
    raft_vars = init_raft_variables(jax.random.PRNGKey(1))
    frame = (
        jax.random.uniform(
            jax.random.PRNGKey(2), (1, args.height, args.width, 3),
            jnp.float32,
        ) * 0.2
    )
    frames = jnp.stack([frame + 0.001 * i for i in range(args.chunk)])
    news = jnp.zeros((args.chunk,), jnp.bool_)
    carry = {
        "last_H3": jnp.zeros_like(frame),
        "last_s3": jnp.zeros_like(frame) + 0.5,
    }

    def run(c):
        (H2s, H3s), c = predict_chunk(
            net_vars, raft_vars, frames, c, news,
            of_scale=args.of_scale, raft_iters=args.raft_iters, emit="u8",
        )
        float(H3s[-1, 0, 0, 0, 0])  # relay-reliable sync
        return c

    carry = run(carry)  # compile
    tdir = tempfile.mkdtemp(prefix="ztt_trace_")
    try:
        jax.profiler.start_trace(tdir)
        run(carry)
        jax.profiler.stop_trace()
        aggregate(tdir, args.chunk, args.top, by_category=args.by_category)
    finally:
        shutil.rmtree(tdir, ignore_errors=True)


if __name__ == "__main__":
    main()
