#!/usr/bin/env python
"""Headline benchmark: fused 1080p enhance+RAFT+warp inference, frames/sec/chip.

Runs the full per-frame inference step (denoise_1 -> RAFT flow at 1/3 res ->
backward warp -> enhancer -> denoise_2) as ONE jitted XLA graph at the
reference operating point (1920x1080 frames, of_scale=3, 12 RAFT iterations;
BASELINE.md "Operating points"), threading the recurrent carry exactly like
streaming video inference.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

vs_baseline: ratio to the reference implementation's estimated A100 frame
rate (15 fps -- see BASELINE.md "Reference baseline estimate"; the reference
cannot execute in this image: CUDA-only train path, torchvision/skimage/lpips
not installed, reference weights not in the snapshot).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import jax
import jax.numpy as jnp

REF_BASELINE_FPS = 15.0  # documented estimate, BASELINE.md

HEIGHT = int(os.environ.get("BENCH_HEIGHT", "1080"))
WIDTH = int(os.environ.get("BENCH_WIDTH", "1920"))
OF_SCALE = int(os.environ.get("BENCH_OF_SCALE", "3"))
RAFT_ITERS = int(os.environ.get("BENCH_RAFT_ITERS", "12"))
STEPS = int(os.environ.get("BENCH_STEPS", "10"))
WARMUP = int(os.environ.get("BENCH_WARMUP", "3"))
# headline runs the TPU-native bf16 operating point; "highest" is the
# f32-faithful parity mode (see core/precision.py and BASELINE.md)
PRECISION = os.environ.get("BENCH_PRECISION", "fast")
# frames per lax.scan chunk: streaming video inference issues K frames per
# dispatch (pipeline.predict_chunk), amortizing the per-call host/relay
# latency (~30 ms through the axon relay) exactly like production serving;
# every frame is fully computed. 32 measured ~1 ms/frame better than 16.
CHUNK = int(os.environ.get("BENCH_CHUNK", "32"))
# independent scene streams batched on ONE chip: the model is fully
# batch-agnostic (per-scene carry + per-scene is_new_seq,
# models/network.py:662), so B>1 amortizes the per-frame layout/glue/small-op
# overhead that dominates at B=1 (MFU 0.49%, BENCH_r04). frames/sec/chip
# counts ALL scenes' frames; equivalence vs sequential single-scene runs is
# tested in tests/test_batched_predict.py.
BATCH = int(os.environ.get("BENCH_BATCH", "1"))


def main() -> None:
    from zero_tig_tpu.core.cache import enable_persistent_cache

    enable_persistent_cache()
    from zero_tig_tpu.core import precision
    from zero_tig_tpu.models import (
        init_network_variables,
        init_raft_variables,
    )
    from zero_tig_tpu.pipeline import predict_chunk, predict_step

    precision.set_precision(PRECISION)

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    net_vars = init_network_variables(jax.random.PRNGKey(0))
    raft_vars = init_raft_variables(jax.random.PRNGKey(1))

    key = jax.random.PRNGKey(2)
    k1, k2 = jax.random.split(key)
    frame = (
        jax.random.uniform(k1, (BATCH, HEIGHT, WIDTH, 3), jnp.float32) * 0.2
    )
    noise = jax.random.uniform(k2, (BATCH, HEIGHT, WIDTH, 3), jnp.float32)
    carry = {
        "last_H3": jnp.zeros_like(frame),
        "last_s3": jnp.zeros_like(frame) + 0.5,
    }

    def step(carry, f, new):
        return predict_step(
            net_vars, raft_vars, f, carry, jnp.asarray(new),
            of_scale=OF_SCALE, raft_iters=RAFT_ITERS,
        )

    def chunk_step(carry, fs, news):
        # emit="u8": in-graph PNG quantization + s3 dropped from the
        # emitted stack -- the serving operating point (7x less output
        # traffic; PNGs bit-identical to host-side quantization)
        return predict_chunk(
            net_vars, raft_vars, fs, carry, news,
            of_scale=OF_SCALE, raft_iters=RAFT_ITERS, emit="u8",
        )

    # warmup (compile) + prime the recurrence
    t0 = time.time()
    (_, _, _), carry = step(carry, frame, True)
    jax.block_until_ready(carry)
    print(f"# compile+first step: {time.time() - t0:.1f}s", file=sys.stderr)

    if CHUNK > 1:
        frames = jnp.stack(
            [frame + 0.001 * (i % 3) * noise for i in range(CHUNK)]
        )
        news = jnp.zeros((CHUNK,), jnp.bool_)
        t0 = time.time()
        _, carry = chunk_step(carry, frames, news)
        float(carry["last_H3"][0, 0, 0, 0])
        print(f"# chunk compile: {time.time() - t0:.1f}s", file=sys.stderr)

    times = []
    for i in range(STEPS):
        f = frame + 0.001 * (i % 3) * noise  # vary input, avoid caching
        t1 = time.time()
        if CHUNK > 1:
            frames = frames + 0.0005 * (i % 2)
            (H2s, H3s), carry = chunk_step(carry, frames, news)
            # device->host readback: the only reliable full sync on the
            # experimental axon platform (block_until_ready returns early)
            float(H3s[-1, 0, 0, 0, 0])
            times.append((time.time() - t1) / (CHUNK * BATCH))
        else:
            (H2, H3, s3), carry = step(carry, f, False)
            float(H3[0, 0, 0, 0])
            times.append((time.time() - t1) / BATCH)

    sec = statistics.median(times)
    fps = 1.0 / sec
    print(
        f"# median {sec * 1e3:.1f} ms/frame over {STEPS} steps "
        f"({HEIGHT}x{WIDTH}, of_scale={OF_SCALE}, iters={RAFT_ITERS}, "
        f"precision={PRECISION}, batch={BATCH})",
        file=sys.stderr,
    )

    # Roofline accounting: achieved FLOP/s from the compiled program's own
    # cost model vs the v5e MXU peak (197 TFLOP/s bf16). Answers "how far
    # from speed-of-light is this frame?" without ratios to estimated
    # baselines. Same machinery as flowtools/benchmark.py:52-58 /
    # ptlflow_scripts model_benchmark FLOPs accounting.
    V5E_BF16_PEAK = 197e12
    V5E_HBM_BPS = 819e9  # ~819 GB/s HBM bandwidth per v5e chip
    mfu = flops_per_frame = bytes_per_frame = hbm_roofline_ms = None
    try:
        if CHUNK > 1:
            lowered = predict_chunk.lower(
                net_vars, raft_vars, frames, carry, news,
                of_scale=OF_SCALE, raft_iters=RAFT_ITERS, emit="u8",
            )
        else:
            lowered = predict_step.lower(
                net_vars, raft_vars, frame, carry, jnp.asarray(False),
                of_scale=OF_SCALE, raft_iters=RAFT_ITERS,
            )
        cost = lowered.compile().cost_analysis() or {}
        flops_chunk = float(cost.get("flops", 0.0))
        if flops_chunk > 0:
            flops_per_frame = flops_chunk / (max(CHUNK, 1) * BATCH)
            mfu = (flops_per_frame / sec) / V5E_BF16_PEAK
            print(
                f"# {flops_per_frame / 1e9:.1f} GFLOP/frame -> "
                f"{flops_per_frame / sec / 1e12:.2f} TFLOP/s achieved = "
                f"{mfu * 100:.1f}% of v5e bf16 peak",
                file=sys.stderr,
            )
        bytes_chunk = float(cost.get("bytes accessed", 0.0))
        if bytes_chunk > 0:
            # This frame is bandwidth-bound, not FLOP-bound (47.8 GFLOP
            # would take 0.24 ms at MXU peak): the meaningful roofline is
            # the HBM one -- bytes the cost model books against ~819 GB/s.
            bytes_per_frame = bytes_chunk / (max(CHUNK, 1) * BATCH)
            hbm_roofline_ms = bytes_per_frame / V5E_HBM_BPS * 1e3
            print(
                f"# {bytes_per_frame / 1e9:.2f} GB/frame accessed -> HBM "
                f"roofline {hbm_roofline_ms:.1f} ms/frame "
                f"({hbm_roofline_ms / (sec * 1e3) * 100:.0f}% of measured)",
                file=sys.stderr,
            )
    except Exception as e:  # cost model optional; never fail the bench
        print(f"# cost_analysis unavailable: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "1080p_enhance_raft_warp_frames_per_sec_per_chip",
                "value": round(fps, 3),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / REF_BASELINE_FPS, 3),
                "ms_per_frame": round(sec * 1e3, 2),
                "batch_scenes": BATCH,
                "mfu_vs_v5e_bf16_peak": (
                    round(mfu, 4) if mfu is not None else None
                ),
                "gflops_per_frame": (
                    round(flops_per_frame / 1e9, 1)
                    if flops_per_frame is not None
                    else None
                ),
                "hbm_gb_per_frame": (
                    round(bytes_per_frame / 1e9, 2)
                    if bytes_per_frame is not None
                    else None
                ),
                "hbm_roofline_ms": (
                    round(hbm_roofline_ms, 2)
                    if hbm_roofline_ms is not None
                    else None
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
