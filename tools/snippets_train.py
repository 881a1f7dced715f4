# Train-step TPU measurement (VERDICT r3 item 4): profile + time the fused
# fast-mode train step at 1080p, re-measure the exact f32 spatial-banded
# path, and sweep train_chunk sizes. Feed to tools/tpu_worker.py's FIFO;
# imports below also make it runnable standalone.
#
# SAFE ORDER: cached/fast graphs first; the spatial f32 path (largest
# compile) last. Record results in BASELINE.md "Training" table.
import sys, time, statistics

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
for m in [k for k in list(sys.modules) if k.startswith(("zero_tig_tpu", "tools"))]:
    del sys.modules[m]
from zero_tig_tpu.core.cache import enable_persistent_cache

enable_persistent_cache()
from zero_tig_tpu.core import precision
from zero_tig_tpu.core.config import Config
from zero_tig_tpu.models import init_network_variables, init_raft_variables
from zero_tig_tpu.pipeline import init_train_state, train_chunk, train_step

H, W, OF, IT = 1080, 1920, 3, 12
net_vars = init_network_variables(jax.random.PRNGKey(0))
raft_vars = init_raft_variables(jax.random.PRNGKey(1))
frame = jax.random.uniform(jax.random.PRNGKey(2), (1, H, W, 3), jnp.float32) * 0.2
cfg = Config(of_scale=OF, raft_iters=IT)


def fresh_state():
    return init_train_state(cfg, net_vars, (1, H, W, 3))


def sync(x):
    return float(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def bench_step(tag, fn, n=6):
    state = fresh_state()
    t0 = time.time()
    state, loss = fn(state, frame)
    sync(loss)
    print(f"{tag} compile+first: {time.time()-t0:.1f}s loss={float(loss):.1f}",
          flush=True)
    times = []
    for i in range(n):
        f = frame + 0.0005 * (i % 2)
        t1 = time.time()
        state, loss = fn(state, f)
        sync(loss)
        times.append(time.time() - t1)
    print(f"{tag}: {statistics.median(times)*1e3:.1f} ms/frame", flush=True)


# 1) fast fused train step (the round-1 0.8 s/frame number to beat)
precision.set_precision("fast")
bench_step(
    "train-fast-step",
    lambda s, f: train_step(s, raft_vars, f, jnp.asarray(False),
                            of_scale=OF, raft_iters=IT, bn_train=True),
)

# 2) fast train_chunk=4 (amortizes relay dispatch like predict_chunk;
#    sequential-frame semantics preserved through the scan)
CH = 4
frames4 = jnp.stack([frame + 0.001 * i for i in range(CH)])
news4 = jnp.zeros((CH,), jnp.bool_)


def chunk_fn(s, f):
    fs = frames4 + (f[0, 0, 0, 0] - frame[0, 0, 0, 0])
    s, losses = train_chunk(s, raft_vars, fs, news4,
                            of_scale=OF, raft_iters=IT, bn_train=True)
    return s, losses


state = fresh_state()
t0 = time.time()
state, losses = chunk_fn(state, frame)
sync(losses)
print(f"train-fast-chunk4 compile+first: {time.time()-t0:.1f}s", flush=True)
times = []
for i in range(4):
    t1 = time.time()
    state, losses = chunk_fn(state, frame + 0.0005 * (i % 2))
    sync(losses)
    times.append((time.time() - t1) / CH)
print(f"train-fast-chunk4: {statistics.median(times)*1e3:.1f} ms/frame",
      flush=True)

# 3) per-source profile of the fast step (one traced step; aggregate with
#    tools/profile_trace.py --by_category afterwards)
import pathlib

trace_dir = "/tmp/train_trace"
pathlib.Path(trace_dir).mkdir(exist_ok=True)
state = fresh_state()
state, loss = train_step(state, raft_vars, frame, jnp.asarray(False),
                         of_scale=OF, raft_iters=IT, bn_train=True)
sync(loss)
with jax.profiler.trace(trace_dir):
    state, loss = train_step(state, raft_vars, frame + 0.001,
                             jnp.asarray(False),
                             of_scale=OF, raft_iters=IT, bn_train=True)
    sync(loss)
print(f"trace written to {trace_dir} (run tools/profile_trace.py on it)",
      flush=True)

# 4) exact f32 spatial-banded train (round-2 number: 1.53 s/frame) -- the
#    largest compile, LAST
precision.set_precision("highest")
from zero_tig_tpu.pipeline.spatial import train_step_spatial

bench_step(
    "train-exact-spatial",
    lambda s, f: train_step_spatial(s, raft_vars, f, jnp.asarray(False),
                                    bands=4, halo=32,
                                    of_scale=OF, raft_iters=IT,
                                    bn_train=True),
    n=3,
)
precision.set_precision("fast")
print("RESULT train measurements done", flush=True)
