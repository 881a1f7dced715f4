# Train-graph warp-table layout probe: the fast train step books ~22
# ms/frame of channel-major DUS loop (dynamic-update-slice.165,
# bf16[1,128,2079604]) building the patchify gather operand -- the round-3
# pathology, re-triggered in the value_and_grad graph (inference builds the
# same table in ~2 ms). Variant A pins the concat with an
# optimization_barrier so layout assignment keeps the default C-minor
# buffer. Feed to tools/tpu_worker.py's FIFO.
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
import zero_tig_tpu.ops.sampling as S

H, W, OF, IT = 1080, 1920, 3, 12
precision.set_precision("fast")
jax.clear_caches()

_orig_patchify = S._patchify


def _patchify_barrier(img):
    return jax.lax.optimization_barrier(_orig_patchify(img))


def sync(x):
    return float(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def bench(tag, n=5):
    jax.clear_caches()
    state = init_train_state(cfg, net_vars, (1, H, W, 3))
    t0 = time.time()
    state, loss = train_step(state, raft_vars, frame, jnp.asarray(False),
                             of_scale=OF, raft_iters=IT, bn_train=True)
    sync(loss)
    print(f"{tag} compile+first: {time.time()-t0:.1f}s loss={float(loss):.1f}",
          flush=True)
    times = []
    for i in range(n):
        t1 = time.time()
        state, loss = train_step(
            state, raft_vars, frame + 0.0005 * (i % 2), jnp.asarray(False),
            of_scale=OF, raft_iters=IT, bn_train=True,
        )
        sync(loss)
        times.append(time.time() - t1)
    print(f"{tag}: {statistics.median(times)*1e3:.1f} ms/frame", flush=True)
    del state, loss
    gc.collect()


try:
    net_vars = init_network_variables(jax.random.PRNGKey(0))
    raft_vars = init_raft_variables(jax.random.PRNGKey(1))
    frame = jax.random.uniform(
        jax.random.PRNGKey(2), (1, H, W, 3), jnp.float32
    ) * 0.2
    cfg = Config(of_scale=OF, raft_iters=IT)

    S._patchify = _patchify_barrier
    bench("train-xpack-bn1-PATCHBARRIER")
    S._patchify = _orig_patchify
    print("RESULT warp layout probe done (base was 369.8)", flush=True)
finally:
    S._patchify = _orig_patchify
    for nme in ("state", "loss", "frame", "net_vars", "raft_vars"):
        if nme in dir():
            exec(f"del {nme}")
    gc.collect()
    jax.clear_caches()
