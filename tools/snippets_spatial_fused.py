"""Fused spatial-step dispatch A/B (round 5, measured on one v5e).

Results (1080p bands=2 f32, same worker session, controls sandwiching):
  per-band bn0 1677.0 -> fused ONE-dispatch 1518.1 / 1516.3 ms/frame
  per-band bn1 2109.5 / 2453.9 -> fused THREE-dispatch 1961.5
  single-program bn1 form: OOM 16.86G > 15.75G HBM (42% padded util)
Submitted through tools/tpu_worker.py; jax/jnp live in the worker ns.
"""
# Fused one-dispatch spatial step A/B (round 5): per-band dispatch form
# vs _fused_spatial_step at 1080p bands=2, both BN modes, f32 highest.
import sys, time, statistics, gc

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
net_vars = init_network_variables(jax.random.PRNGKey(0))
raft_vars = init_raft_variables(jax.random.PRNGKey(1))
frame = jax.random.uniform(jax.random.PRNGKey(2), (1, H, W, 3), jnp.float32) * 0.2
cfg = Config(of_scale=OF, raft_iters=IT)
precision.set_precision("highest")


def _sync(x):
    return float(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def bench(tag, fused, bn_train, n=4):
    state = init_train_state(cfg, net_vars, (1, H, W, 3))
    t0 = time.time()
    state, loss = train_step_spatial(
        state, raft_vars, frame, jnp.asarray(False), bands=2, halo=32,
        of_scale=OF, raft_iters=IT, bn_train=bn_train, fused=fused,
    )
    _sync(loss)
    print(f"{tag} compile+first {time.time()-t0:.1f}s loss={float(loss):.2f}",
          flush=True)
    times = []
    for i in range(n):
        f = frame + 0.0005 * (i % 2)
        t1 = time.time()
        state, loss = train_step_spatial(
            state, raft_vars, f, jnp.asarray(False), bands=2, halo=32,
            of_scale=OF, raft_iters=IT, bn_train=bn_train, fused=fused,
        )
        _sync(loss)
        times.append(time.time() - t1)
    print(f"{tag}: {statistics.median(times)*1e3:.1f} ms/frame", flush=True)
    del state, loss
    gc.collect()


try:
    bench("fsp-perband-bn0", False, False)
    bench("fsp-fused-bn0", True, False)
    bench("fsp-perband-bn1", False, True)
    bench("fsp-fused-bn1", True, True)
    bench("fsp-perband-bn0-ctl", False, False, n=3)
finally:
    gc.collect()
    jax.clear_caches()
print("RESULT fsp done", flush=True)

# --- follow-up: 3-phase bn1 form (snip_fsp2) ---
def _sync(x):
    return float(jax.tree_util.tree_leaves(x)[0].ravel()[0])

def bench(tag, fused, bn_train, n=4):
    state = init_train_state(cfg, net_vars, (1, H, W, 3))
    t0 = time.time()
    state, loss = train_step_spatial(
        state, raft_vars, frame, jnp.asarray(False), bands=2, halo=32,
        of_scale=OF, raft_iters=IT, bn_train=bn_train, fused=fused)
    _sync(loss)
    print(f"{tag} compile+first {time.time()-t0:.1f}s loss={float(loss):.2f}", flush=True)
    times = []
    for i in range(n):
        f = frame + 0.0005 * (i % 2)
        t1 = time.time()
        state, loss = train_step_spatial(
            state, raft_vars, f, jnp.asarray(False), bands=2, halo=32,
            of_scale=OF, raft_iters=IT, bn_train=bn_train, fused=fused)
        _sync(loss)
        times.append(time.time() - t1)
    print(f"{tag}: {statistics.median(times)*1e3:.1f} ms/frame", flush=True)
    del state, loss
    gc.collect()

try:
    bench("fsp2-fused3-bn1", True, True)
    bench("fsp2-perband-bn1-ctl", False, True, n=3)
    bench("fsp2-fused-bn0-ctl", True, False, n=3)
finally:
    gc.collect()
    jax.clear_caches()
print("RESULT fsp2 done", flush=True)
