#!/usr/bin/env python
"""Per-component TPU micro-benchmarks to locate the frame-step bottleneck."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from zero_tig_tpu.models import (
    DENOISE_1,
    DENOISE_2,
    ENHANCER,
    init_network_variables,
    init_raft_variables,
    raft_forward,
)
from zero_tig_tpu.models.raft.corr import build_corr_pyramid, lookup_corr
from zero_tig_tpu.ops import coords_grid, equalize01, grid_sample_pixel, warp_tensor
from zero_tig_tpu.ops.filters import blur, calculate_local_variance


def timeit(name, fn, *args, n=5):
    out = fn(*args)  # compile
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x)), out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x)), out)
    dt = (time.time() - t0) / n * 1e3
    print(f"{name:40s} {dt:9.2f} ms")
    return dt


def main():
    key = jax.random.PRNGKey(0)
    net_vars = init_network_variables(key)
    raft_vars = init_raft_variables(key)

    f1080 = jax.random.uniform(key, (1, 1080, 1920, 3)) * 0.2
    f360 = jax.random.uniform(key, (1, 360, 640, 3)) * 255.0
    fm = jax.random.normal(key, (1, 45, 80, 256))

    p = net_vars["params"]
    timeit("denoise1 @1080p", jax.jit(
        lambda x: DENOISE_1.apply({"params": p["denoise_1"]}, x)), f1080)
    timeit("denoise2 @1080p(12ch)", jax.jit(
        lambda x: DENOISE_2.apply({"params": p["denoise_2"]},
                                  jnp.concatenate([x, x, x, x], -1))), f1080)
    timeit("enhancer @1080p(9ch)", jax.jit(
        lambda x: ENHANCER.apply(
            {"params": p["enhance"],
             "batch_stats": net_vars["batch_stats"]["enhance"]},
            jnp.concatenate([x, x, x], -1), use_running_average=True)), f1080)
    timeit("blur @1080p", jax.jit(blur), f1080)
    timeit("local_variance @1080p", jax.jit(calculate_local_variance), f1080)
    timeit("equalize01 @360x640", jax.jit(equalize01), f360 / 255.0)

    timeit("raft_forward @360x640 12it", jax.jit(
        lambda v, a, b: raft_forward(v, a, b, iters=12)), raft_vars, f360, f360)
    timeit("raft_forward @360x640 1it", jax.jit(
        lambda v, a, b: raft_forward(v, a, b, iters=1)), raft_vars, f360, f360)

    timeit("corr build @45x80", jax.jit(
        lambda a, b: build_corr_pyramid(a, b).levels), fm, fm)

    pyr = jax.jit(lambda a, b: build_corr_pyramid(a, b))(fm, fm)
    coords = coords_grid(1, 45, 80)
    timeit("corr lookup x1", jax.jit(
        lambda py, c: lookup_corr(py, c)), pyr, coords)

    flow = jax.random.normal(key, (1, 360, 640, 2)) * 3
    img = jax.random.uniform(key, (1, 1080, 1920, 3))
    timeit("warp_tensor @1080p", jax.jit(warp_tensor), flow, img, img)

    gx = jax.random.uniform(key, (1, 1080, 1920)) * 1920
    gy = jax.random.uniform(key, (1, 1080, 1920)) * 1080
    timeit("grid_sample_pixel @1080p", jax.jit(grid_sample_pixel), img, gx, gy)


if __name__ == "__main__":
    main()
