#!/usr/bin/env python
"""Quantify the quality impact of precision mode 'fast' (bf16 MXU multiplies)
vs 'highest' (f32-faithful): PSNR between the two modes' H3 outputs on the
same weights and frames. Run on CPU or TPU."""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np


def run(mode: str, net_vars, raft_vars, frames):
    from zero_tig_tpu.core import precision
    from zero_tig_tpu.models.network import forward_inference

    precision.set_precision(mode)
    fwd = jax.jit(
        lambda v, r, f, c, n: forward_inference(
            v, r, f, c, n, of_scale=2, raft_iters=4
        )
    )
    carry = {
        "last_H3": jnp.zeros_like(frames[0]),
        "last_s3": jnp.zeros_like(frames[0]),
    }
    outs = []
    for i, f in enumerate(frames):
        (H2, H3, s3), carry = fwd(net_vars, raft_vars, f, carry,
                                  jnp.asarray(i == 0))
        outs.append(np.asarray(H3))
    jax.clear_caches()
    return outs


def main():
    from zero_tig_tpu.models import (
        init_network_variables,
        init_raft_variables,
    )

    key = jax.random.PRNGKey(0)
    net_vars = init_network_variables(key)
    raft_vars = init_raft_variables(jax.random.PRNGKey(1))
    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    frames = [
        jax.random.uniform(k, (1, 96, 128, 3), jnp.float32) * 0.2 for k in ks
    ]

    hi = run("highest", net_vars, raft_vars, frames)
    fa = run("fast", net_vars, raft_vars, frames)

    for i, (a, b) in enumerate(zip(hi, fa)):
        mse = float(np.mean((a - b) ** 2))
        psnr = 10 * np.log10(1.0 / mse) if mse > 0 else float("inf")
        print(f"frame {i}: fast-vs-highest PSNR {psnr:.1f} dB "
              f"(max abs diff {np.abs(a - b).max():.2e})")


if __name__ == "__main__":
    main()
