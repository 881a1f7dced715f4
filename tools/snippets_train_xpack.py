# Packed-layout fast TRAIN step measurement (round-4/5 lever: xpack in the
# value_and_grad graph). Feed to tools/tpu_worker.py's FIFO; also runnable
# standalone. Measures plain vs packed fast train_step at the 1080p
# operating point, bn_train True and False, then a per-category profile of
# the winner.
import sys, time, statistics, gc

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
from zero_tig_tpu.pipeline import init_train_state, train_step

H, W, OF, IT = 1080, 1920, 3, 12
net_vars = init_network_variables(jax.random.PRNGKey(0))
raft_vars = init_raft_variables(jax.random.PRNGKey(1))
frame = jax.random.uniform(jax.random.PRNGKey(2), (1, H, W, 3), jnp.float32) * 0.2
cfg = Config(of_scale=OF, raft_iters=IT)
precision.set_precision("fast")


def sync(x):
    return float(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def bench(tag, bn_train, packed, n=6):
    precision.set_xpack_train(packed)
    jax.clear_caches()
    state = init_train_state(cfg, net_vars, (1, H, W, 3))
    t0 = time.time()
    state, loss = train_step(state, raft_vars, frame, jnp.asarray(False),
                             of_scale=OF, raft_iters=IT, bn_train=bn_train)
    sync(loss)
    print(f"{tag} compile+first: {time.time()-t0:.1f}s loss={float(loss):.1f}",
          flush=True)
    times = []
    for i in range(n):
        f = frame + 0.0005 * (i % 2)
        t1 = time.time()
        state, loss = train_step(state, raft_vars, f, jnp.asarray(False),
                                 of_scale=OF, raft_iters=IT, bn_train=bn_train)
        sync(loss)
        times.append(time.time() - t1)
    print(f"{tag}: {statistics.median(times)*1e3:.1f} ms/frame", flush=True)
    del state, loss
    gc.collect()


try:
    # cheapest-risk order: packed first (new graphs), then the plain
    # reference numbers (already cached cross-process)
    bench("train-fast-XPACK-bn1", True, True)
    bench("train-fast-XPACK-bn0", False, True)
    bench("train-fast-plain-bn1", True, False)
    bench("train-fast-plain-bn0", False, False)
finally:
    precision.set_xpack_train(None)
    gc.collect()
    jax.clear_caches()
print("RESULT xpack-train measurements done", flush=True)
