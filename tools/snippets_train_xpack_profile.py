# Profile the PACKED fast train step (the new 370 ms/frame default) to find
# the next structural lever. Feed to tools/tpu_worker.py's FIFO; traces 4
# steps into /tmp/trace_xpt -- aggregate on the host with
#   python tools/profile_trace.py --trace_dir /tmp/trace_xpt --frames 4
#   python tools/profile_trace.py --trace_dir /tmp/trace_xpt --frames 4 --by_category
import sys, time, shutil, gc

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
precision.set_precision("fast")
precision.set_xpack_train(True)
jax.clear_caches()


def sync(x):
    return float(jax.tree_util.tree_leaves(x)[0].ravel()[0])


try:
    net_vars = init_network_variables(jax.random.PRNGKey(0))
    raft_vars = init_raft_variables(jax.random.PRNGKey(1))
    frame = jax.random.uniform(
        jax.random.PRNGKey(2), (1, H, W, 3), jnp.float32
    ) * 0.2
    cfg = Config(of_scale=OF, raft_iters=IT)
    state = init_train_state(cfg, net_vars, (1, H, W, 3))

    def step(state, f):
        return train_step(state, raft_vars, f, jnp.asarray(False),
                          of_scale=OF, raft_iters=IT, bn_train=True)

    t0 = time.time()
    state, loss = step(state, frame)
    sync(loss)
    print(f"xpt-profile warmup: {time.time()-t0:.1f}s loss={float(loss):.1f}",
          flush=True)
    state, loss = step(state, frame + 0.001)
    sync(loss)

    shutil.rmtree("/tmp/trace_xpt", ignore_errors=True)
    with jax.profiler.trace("/tmp/trace_xpt"):
        for i in range(4):
            state, loss = step(state, frame + 0.0005 * (i % 2))
            sync(loss)
    print("RESULT trace written to /tmp/trace_xpt (4 frames)", flush=True)
finally:
    for n in ("state", "loss", "frame", "net_vars", "raft_vars"):
        if n in dir():
            exec(f"del {n}")
    precision.set_xpack_train(None)
    gc.collect()
    jax.clear_caches()
