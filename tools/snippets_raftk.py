# Post-relay-recovery measurement, SAFE ORDER: cheap/cached graphs first,
# the known-pathological-compile graph (gru-fused predict_chunk -- the one
# whose 50-min remote compile preceded the relay outage) LAST.
# Normally fed to tools/tpu_worker.py's FIFO (which shares one chip claim);
# the imports below also make it runnable standalone: python tools/snippets_raftk.py
import sys, time, statistics

import jax
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
for m in [k for k in list(sys.modules) if k.startswith(("zero_tig_tpu", "tools"))]:
    del sys.modules[m]
from zero_tig_tpu.core.cache import enable_persistent_cache
enable_persistent_cache()
from zero_tig_tpu.core import precision
from zero_tig_tpu.models import init_network_variables, init_raft_variables
from zero_tig_tpu.pipeline import predict_chunk

H, W, OF, IT, CHUNK = 1080, 1920, 3, 12, 32
net_vars = init_network_variables(jax.random.PRNGKey(0))
raft_vars = init_raft_variables(jax.random.PRNGKey(1))
frame = jax.random.uniform(jax.random.PRNGKey(2), (1, H, W, 3), jnp.float32) * 0.2
precision.set_precision("fast")

def bench(tag, chunk=CHUNK):
    jax.clear_caches()
    carry = {"last_H3": jnp.zeros_like(frame), "last_s3": jnp.zeros_like(frame) + 0.5}
    frames = jnp.stack([frame + 0.001 * (i % 3) for i in range(chunk)])
    news = jnp.zeros((chunk,), jnp.bool_)
    t0 = time.time()
    (H2s, H3s), carry = predict_chunk(net_vars, raft_vars, frames, carry, news,
                                      of_scale=OF, raft_iters=IT, emit="u8")
    float(carry["last_H3"][0, 0, 0, 0])
    print(f"{tag} compile+first: {time.time()-t0:.1f}s", flush=True)
    times = []
    for i in range(6):
        fs = frames + 0.0005 * (i % 2)
        t1 = time.time()
        (H2s, H3s), carry = predict_chunk(net_vars, raft_vars, fs, carry, news,
                                          of_scale=OF, raft_iters=IT, emit="u8")
        float(H3s[-1, 0, 0, 0, 0])
        times.append((time.time() - t1) / chunk)
    print(f"{tag}: {statistics.median(times)*1e3:.2f} ms/frame", flush=True)

# 1) standalone Pallas kernel probe (small graph, fails fast on Mosaic 500)
from zero_tig_tpu.models.raft.update import BasicUpdateBlock, update_block_apply_fast
from zero_tig_tpu.models.raft.update_kernel import update_block_apply_kernel
blk = BasicUpdateBlock(hidden_dim=128)
net = jax.random.normal(jax.random.PRNGKey(6), (1, 45, 80, 128))
inp = jax.random.normal(jax.random.PRNGKey(7), (1, 45, 80, 128))
corr = jax.random.normal(jax.random.PRNGKey(8), (1, 45, 80, 324))
flw = jax.random.normal(jax.random.PRNGKey(9), (1, 45, 80, 2))
v = blk.init(jax.random.PRNGKey(5), net, inp, corr, flw)
try:
    t0 = time.time()
    kn, kd = jax.jit(update_block_apply_kernel)(v["params"], net, inp, corr, flw)
    float(kd[0, 0, 0, 0])
    print(f"kernel standalone compile+run: {time.time()-t0:.1f}s", flush=True)
    rn, rd = jax.jit(update_block_apply_fast)(v["params"], net, inp, corr, flw)
    dn = float(jnp.abs(kn.astype(jnp.float32) - rn.astype(jnp.float32)).max())
    dd = float(jnp.abs(kd - rd).max())
    print(f"kernel-vs-fast max diff net={dn:.4f} delta={dd:.4f}", flush=True)
    ok = dn < 0.1 and dd < 0.1
except Exception as e:
    print(f"kernel FAILED: {type(e).__name__}: {str(e)[:400]}", flush=True)
    ok = False

# 2) default sanity (HLO unchanged since 49.41 run -> persistent-cache hit)
bench("default-module")

# 3) kernel end-to-end
if ok:
    precision.set_raft_kernel(True)
    bench("raft-kernel")
    precision.set_raft_kernel(False)

# 4) the risky one last
precision.set_raft_fused(True)
bench("raft-fused")
precision.set_raft_fused(False)
print("RESULT raftk done (mask-once base 49.41)", flush=True)
