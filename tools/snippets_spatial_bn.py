# Measure the incremental pass-A banded BN (round-4 rework): exact f32
# spatial train step at 1080p, bands=2, bn_train=True (epoch-0 point).
# Round-4 baseline with the 6-prefix-sweep pass A: 2741.6 ms/frame
# (bn_train=False control: 1514.8). Feed to tools/tpu_worker.py's FIFO.
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
from zero_tig_tpu.pipeline import init_train_state, train_step_spatial

H, W, OF, IT = 1080, 1920, 3, 12
precision.set_precision("highest")
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

    for bn_train, n in ((True, 4), (False, 2)):
        t0 = time.time()
        state2, loss = train_step_spatial(
            state, raft_vars, frame, jnp.asarray(False),
            bands=2, halo=32, of_scale=OF, raft_iters=IT, bn_train=bn_train,
        )
        sync(loss)
        print(
            f"spatial-bn{int(bn_train)} compile+first: {time.time()-t0:.1f}s "
            f"loss={float(loss):.1f}", flush=True,
        )
        times = []
        for i in range(n):
            t1 = time.time()
            state2, loss = train_step_spatial(
                state, raft_vars, frame + 0.0005 * (i % 2), jnp.asarray(False),
                bands=2, halo=32, of_scale=OF, raft_iters=IT,
                bn_train=bn_train,
            )
            sync(loss)
            times.append(time.time() - t1)
        print(
            f"spatial-bn{int(bn_train)} bands=2: "
            f"{statistics.median(times)*1e3:.1f} ms/frame", flush=True,
        )
        del state2, loss
        gc.collect()
    print("RESULT spatial incremental pass-A measured", flush=True)
finally:
    for nme in ("state", "state2", "loss", "frame", "net_vars", "raft_vars"):
        if nme in dir():
            exec(f"del {nme}")
    gc.collect()
    jax.clear_caches()
