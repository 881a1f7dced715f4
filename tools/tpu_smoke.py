#!/usr/bin/env python
"""Scripted TPU smoke suite: one command, ~5 min on a warm compile cache,
asserting the TPU-only fast paths the CPU test suite cannot see
(tests/ pins the cpu backend; Pallas runs interpret-mode there).

Checks, each printed as a JSON line and summarized at the end (rc != 0 on
any failure):

  1. bench_ms      -- chunked 1080p fast inference ms/frame within
                      --headline_ms * (1 +- --tol_frac) of the recorded
                      headline (BASELINE.md round-4: 49.5).
  2. xpack_psnr    -- fast-mode xpack (packed-pair layout) vs fast-mode
                      plain outputs at 256px: PSNR >= 40 dB (same math,
                      different tiling/reassociation).
  3. mode_psnr     -- fast vs highest H3 PSNR at 256px with the recurrence
                      active, random init: >= 26 dB canary (historical
                      random-weight value ~31 dB, BASELINE.md round 1; the
                      TRAINED gate number is ~54 dB via quality_gate.py).
  4. train_finite  -- one packed fast train_step at 512px: loss finite,
                      and within --train_tol (default 2%) of the unpacked
                      step's loss (xpack_train parity, BASELINE.md ~0.16%).

Run it against the real chip (the default backend on this image):
    python tools/tpu_smoke.py
The relay's executable-load latency is wildly variable (16-446 s for the
same cached program, CLAUDE.md) -- wall-clock is printed but never asserted.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def psnr(a, b):
    import numpy as np

    mse = float(np.mean((np.asarray(a, np.float32) - np.asarray(b, np.float32)) ** 2))
    return 99.0 if mse == 0 else float(10 * np.log10(1.0 / mse))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--headline_ms", type=float, default=49.5)
    ap.add_argument("--tol_frac", type=float, default=0.15)
    ap.add_argument("--train_tol", type=float, default=0.02)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument(
        "--skip_bench", action="store_true",
        help="skip the 1080p latency check (e.g. on CPU)",
    )
    args = ap.parse_args(argv)

    import numpy as np

    from zero_tig_tpu.core.cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from zero_tig_tpu.core import precision
    from zero_tig_tpu.models import (
        init_network_variables,
        init_raft_variables,
    )
    from zero_tig_tpu.pipeline import (
        init_train_state,
        predict_chunk,
        predict_step,
        train_step,
    )
    from zero_tig_tpu.core.config import Config

    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    results = {}
    failures = []

    net_vars = init_network_variables(jax.random.PRNGKey(0))
    raft_vars = init_raft_variables(jax.random.PRNGKey(1))

    # ---- 1. headline latency ------------------------------------------
    if not args.skip_bench:
        precision.set_precision("fast")
        jax.clear_caches()
        K = args.chunk
        k1, k2 = jax.random.split(jax.random.PRNGKey(2))
        frames = (
            jax.random.uniform(k1, (K, 1, 1080, 1920, 3), jnp.float32) * 0.2
        )
        carry = {
            "last_H3": jnp.zeros((1, 1080, 1920, 3), jnp.float32),
            "last_s3": jnp.zeros((1, 1080, 1920, 3), jnp.float32) + 0.5,
        }
        news = jnp.zeros((K,), jnp.bool_)
        t0 = time.time()
        (H2s, H3s), carry = predict_chunk(
            net_vars, raft_vars, frames, carry, news,
            of_scale=3, raft_iters=12, emit="u8",
        )
        float(jnp.asarray(H3s[-1, 0, 0, 0, 0], jnp.float32))
        print(f"# 1080p compile+first: {time.time()-t0:.1f}s", file=sys.stderr)
        times = []
        for i in range(args.steps):
            frames = frames + 0.0005 * (i % 2)
            t1 = time.time()
            (H2s, H3s), carry = predict_chunk(
                net_vars, raft_vars, frames, carry, news,
                of_scale=3, raft_iters=12, emit="u8",
            )
            float(jnp.asarray(H3s[-1, 0, 0, 0, 0], jnp.float32))
            times.append((time.time() - t1) / K)
        ms = float(np.median(times)) * 1e3
        lo = args.headline_ms * (1 - args.tol_frac)
        hi = args.headline_ms * (1 + args.tol_frac)
        ok = lo <= ms <= hi
        results["bench_ms"] = {"ms_per_frame": round(ms, 2), "ok": ok,
                               "bounds": [round(lo, 1), round(hi, 1)]}
        if not ok:
            failures.append("bench_ms")
        print(json.dumps({"check": "bench_ms", **results["bench_ms"]}))
        del frames, carry, H2s, H3s
        import gc

        gc.collect()

    # ---- 2 + 3. xpack-vs-plain and fast-vs-highest at 256px -----------
    rng = np.random.default_rng(5)
    frame = jnp.asarray(rng.random((1, 256, 256, 3)).astype(np.float32) * 0.3)
    carry0 = {
        "last_H3": jnp.asarray(rng.random((1, 256, 256, 3)).astype(np.float32)),
        "last_s3": jnp.asarray(
            rng.random((1, 256, 256, 3)).astype(np.float32) * 0.5 + 0.25
        ),
    }

    def one(mode, xpack_parts=None):
        precision.set_precision(mode)
        if xpack_parts is not None:
            precision.set_xpack(xpack_parts)
        jax.clear_caches()
        (H2, H3, s3), _ = predict_step(
            net_vars, raft_vars, frame, carry0, jnp.asarray(False),
            of_scale=2, raft_iters=8,
        )
        out = np.asarray(jnp.asarray(H3, jnp.float32))
        precision.set_xpack(None)
        return out

    fast_xp = one("fast")  # xpack default-on in fast mode
    fast_plain = one("fast", xpack_parts=())
    hi_out = one("highest")
    precision.set_precision("highest")

    p_xp = psnr(fast_xp, fast_plain)
    ok = bool(p_xp >= 40.0)
    results["xpack_psnr"] = {"psnr_db": round(p_xp, 2), "ok": ok}
    if not ok:
        failures.append("xpack_psnr")
    print(json.dumps({"check": "xpack_psnr", **results["xpack_psnr"]}))

    p_mode = psnr(fast_xp, hi_out)
    ok = bool(p_mode >= 26.0)
    results["mode_psnr"] = {"psnr_db": round(p_mode, 2), "ok": ok}
    if not ok:
        failures.append("mode_psnr")
    print(json.dumps({"check": "mode_psnr", **results["mode_psnr"]}))

    # ---- 4. packed fast train step at 512px ---------------------------
    precision.set_precision("fast")
    jax.clear_caches()
    cfg = Config(of_scale=3, raft_iters=12)
    tframe = jnp.asarray(rng.random((1, 512, 512, 3)).astype(np.float32) * 0.3)
    state = init_train_state(cfg, net_vars, (1, 512, 512, 3))
    t0 = time.time()
    losses = {}
    for label, xp_train in (("packed", True), ("plain", False)):
        precision.set_xpack_train(xp_train)
        jax.clear_caches()
        st = state
        _, loss = train_step(
            st, raft_vars, tframe, jnp.asarray(False),
            of_scale=3, raft_iters=12, bn_train=True,
        )
        losses[label] = float(loss)
    precision.set_xpack_train(None)
    precision.set_precision("highest")
    rel = abs(losses["packed"] - losses["plain"]) / max(
        abs(losses["plain"]), 1e-9
    )
    ok = (
        np.isfinite(losses["packed"])
        and np.isfinite(losses["plain"])
        and rel <= args.train_tol
    )
    results["train_finite"] = {
        "loss_packed": round(losses["packed"], 4),
        "loss_plain": round(losses["plain"], 4),
        "rel_diff": round(rel, 5),
        "ok": bool(ok),
    }
    if not ok:
        failures.append("train_finite")
    print(json.dumps({"check": "train_finite", **results["train_finite"]}))
    print(f"# train-step pair took {time.time()-t0:.1f}s", file=sys.stderr)

    print(json.dumps({"smoke_pass": not failures, "failures": failures}))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
