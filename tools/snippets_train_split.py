# Measure train_step_split (flow phase as its own dispatch) vs the
# monolithic packed fast train step (369.8 ms/frame bn1 / 371.7 bn0).
# The monolithic value_and_grad graph books ~22 ms/frame of channel-major
# DUS loop building the warp's patchify table; the split flow program is
# inference-shaped where XLA fuses it. Feed to tools/tpu_worker.py's FIFO.
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
from zero_tig_tpu.pipeline import init_train_state, train_step_split

H, W, OF, IT = 1080, 1920, 3, 12
precision.set_precision("fast")
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

    for bn_train, n in ((True, 6), (False, 4)):
        state = init_train_state(cfg, net_vars, (1, H, W, 3))
        t0 = time.time()
        state, loss = train_step_split(
            state, raft_vars, frame, jnp.asarray(False),
            of_scale=OF, raft_iters=IT, bn_train=bn_train,
        )
        sync(loss)
        print(
            f"train-SPLIT-bn{int(bn_train)} compile+first: "
            f"{time.time()-t0:.1f}s loss={float(loss):.1f}", flush=True,
        )
        times = []
        for i in range(n):
            t1 = time.time()
            state, loss = train_step_split(
                state, raft_vars, frame + 0.0005 * (i % 2),
                jnp.asarray(False),
                of_scale=OF, raft_iters=IT, bn_train=bn_train,
            )
            sync(loss)
            times.append(time.time() - t1)
        print(
            f"train-SPLIT-bn{int(bn_train)}: "
            f"{statistics.median(times)*1e3:.1f} ms/frame", flush=True,
        )
        del state, loss
        gc.collect()
    print("RESULT split-flow train measured (mono: 369.8 bn1 / 371.7 bn0)",
          flush=True)
finally:
    for nme in ("state", "loss", "frame", "net_vars", "raft_vars"):
        if nme in dir():
            exec(f"del {nme}")
    gc.collect()
    jax.clear_caches()
