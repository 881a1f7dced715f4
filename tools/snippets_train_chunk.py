"""train_chunk dispatch-tax re-probe (round 5, measured on one v5e).

Result: per-frame train_step 310.6/310.6 ms/frame (controls) vs
chunk4 293.4 / chunk8 289.8 -- the relay ~20 ms/dispatch tax amortized.
Submitted through tools/tpu_worker.py; jax/jnp live in the worker ns.
"""
# train_chunk re-probe at the current W-minor packed operating point
# (round 5): does in-graph frame chunking amortize the relay's ~25-40 ms
# per-dispatch tax that the per-frame train_step pays?
import sys, time, statistics, gc

sys.path.insert(0, "/root/repo")
for m in [k for k in list(sys.modules) if k.startswith(("zero_tig_tpu", "tools"))]:
    del sys.modules[m]
from zero_tig_tpu.core.cache import enable_persistent_cache

enable_persistent_cache()
from zero_tig_tpu.core import precision
from zero_tig_tpu.core.config import Config
from zero_tig_tpu.models import init_network_variables, init_raft_variables
from zero_tig_tpu.pipeline import init_train_state, train_step, train_chunk
import functools

H, W, OF, IT = 1080, 1920, 3, 12
net_vars = init_network_variables(jax.random.PRNGKey(0))
raft_vars = init_raft_variables(jax.random.PRNGKey(1))
frame = jax.random.uniform(jax.random.PRNGKey(2), (1, H, W, 3), jnp.float32) * 0.2
cfg = Config(of_scale=OF, raft_iters=IT)
precision.set_precision("fast")


def _sync(x):
    return float(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def bench_step(tag, n=6):
    state = init_train_state(cfg, net_vars, (1, H, W, 3))
    t0 = time.time()
    state, loss = train_step(state, raft_vars, frame, jnp.asarray(False),
                             of_scale=OF, raft_iters=IT, bn_train=True)
    _sync(loss)
    print(f"{tag} compile+first {time.time()-t0:.1f}s loss={float(loss):.2f}",
          flush=True)
    times = []
    for i in range(n):
        f = frame + 0.0005 * (i % 2)
        t1 = time.time()
        state, loss = train_step(state, raft_vars, f, jnp.asarray(False),
                                 of_scale=OF, raft_iters=IT, bn_train=True)
        _sync(loss)
        times.append(time.time() - t1)
    print(f"{tag}: {statistics.median(times)*1e3:.1f} ms/frame", flush=True)
    del state, loss
    gc.collect()


tc_jit = jax.jit(
    functools.partial(train_chunk, of_scale=OF, raft_iters=IT, bn_train=True)
)


def bench_chunk(tag, K, n=4):
    state = init_train_state(cfg, net_vars, (1, H, W, 3))
    frames = jnp.stack([frame + 0.0005 * (i % 2) for i in range(K)])
    flags = jnp.zeros((K,), bool)
    t0 = time.time()
    state, losses = tc_jit(state, raft_vars, frames, flags)
    _sync(losses)
    print(f"{tag} compile+first {time.time()-t0:.1f}s loss0={float(losses[0]):.2f}",
          flush=True)
    times = []
    for i in range(n):
        fs = frames + 0.0001 * (i % 2)
        t1 = time.time()
        state, losses = tc_jit(state, raft_vars, fs, flags)
        _sync(losses)
        times.append((time.time() - t1) / K)
    print(f"{tag}: {statistics.median(times)*1e3:.1f} ms/frame", flush=True)
    del state, losses, frames
    gc.collect()


try:
    bench_step("tc-step-control")
    bench_chunk("tc-chunk4", 4)
    bench_chunk("tc-chunk8", 8)
    bench_step("tc-step-control2", n=4)
finally:
    gc.collect()
    jax.clear_caches()
print("RESULT tc done", flush=True)
