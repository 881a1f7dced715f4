# Lab snippet for tools/tpu_worker.py: batched multi-scene single-chip
# throughput at the 1080p operating point (VERDICT r4 item 1).
#
# Measures predict_chunk at B in {1, 2, 4, 8} independent scene streams,
# holding B*CHUNK = 32 frames per dispatch (same dispatch amortization,
# same staging memory scale). Reports ms/frame-per-scene and the implied
# frames/sec/chip. Equivalence of batched vs sequential outputs is tested
# on CPU in tests/test_batched_predict.py.
#
# Submit with:  cat tools/snippets_batched.py > /tmp/tpu_cmd

import gc
import statistics
import time

import jax
import jax.numpy as jnp

from zero_tig_tpu.core.cache import enable_persistent_cache
from zero_tig_tpu.core import precision
from zero_tig_tpu.models import init_network_variables, init_raft_variables
from zero_tig_tpu.pipeline import predict_chunk

enable_persistent_cache()
precision.set_precision("fast")

H, W, OF, IT = 1080, 1920, 3, 12
TOTAL = 32  # frames per dispatch, all configs
STEPS = 6

try:
    net_vars = init_network_variables(jax.random.PRNGKey(0))
    raft_vars = init_raft_variables(jax.random.PRNGKey(1))

    for B in (1, 2, 4, 8):
        K = TOTAL // B
        k1, k2 = jax.random.split(jax.random.PRNGKey(2))
        frames = jax.random.uniform(k1, (K, B, H, W, 3), jnp.float32) * 0.2
        news = jnp.zeros((K, B), jnp.bool_)
        carry = {
            "last_H3": jnp.zeros((B, H, W, 3), jnp.float32),
            "last_s3": jnp.zeros((B, H, W, 3), jnp.float32) + 0.5,
        }
        t0 = time.time()
        (H2s, H3s), carry = predict_chunk(
            net_vars, raft_vars, frames, carry, news,
            of_scale=OF, raft_iters=IT, emit="u8",
        )
        float(jnp.asarray(H3s[-1, 0, 0, 0, 0], jnp.float32))
        print(f"B={B} K={K} compile+first {time.time()-t0:.1f}s", flush=True)
        times = []
        for i in range(STEPS):
            frames = frames + 0.0005 * (i % 2)
            t1 = time.time()
            (H2s, H3s), carry = predict_chunk(
                net_vars, raft_vars, frames, carry, news,
                of_scale=OF, raft_iters=IT, emit="u8",
            )
            float(jnp.asarray(H3s[-1, 0, 0, 0, 0], jnp.float32))
            times.append((time.time() - t1) / (K * B))
        ms = statistics.median(times) * 1e3
        print(
            f"B={B}: {ms:.2f} ms/frame-per-scene = {1e3/ms:.2f} "
            f"frames/sec/chip",
            flush=True,
        )
        del frames, news, carry, H2s, H3s
        gc.collect()
finally:
    for name in ("net_vars", "raft_vars", "frames", "news", "carry",
                 "H2s", "H3s"):
        globals().pop(name, None)
    gc.collect()
    jax.clear_caches()
