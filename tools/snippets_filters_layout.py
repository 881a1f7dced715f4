# Round-5 scout: the packed train step books ~63 ms/frame on the f32
# 3-channel loss-tail filters (blur / local stats / pair_downsampler at
# 1080p -- ops/filters.py lines in the round-4 trace), ~30x their HBM
# roofline, consistent with 3-of-128 lane padding. Measure the same math
# in a W-minor layout (B, C, H, W): separable filters as shifted-adds on
# a lane-dense minor dim. Scan-amortized (relay dispatch ~30-40 ms).
# Feed to tools/tpu_worker.py's FIFO.
import sys, time, statistics, gc

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
for m in [k for k in list(sys.modules) if k.startswith(("zero_tig_tpu", "tools"))]:
    del sys.modules[m]
from zero_tig_tpu.core.cache import enable_persistent_cache

enable_persistent_cache()
from zero_tig_tpu.ops.filters import _BLUR_KERNEL_21, blur, local_stddev, pair_downsampler
import numpy as np

H, W, N = 1080, 1920, 12

k2d = np.asarray(_BLUR_KERNEL_21, np.float64)
row = k2d[10]
s1d = jnp.asarray((row / np.sqrt(row[10])).astype(np.float32))


def blur_wminor(xc):
    """21x21 separable reflect-pad blur on (B, C, H, W): shifted adds on
    the lane-dense minor dim (H shifts ride sublanes)."""
    xp = jnp.pad(xc, ((0, 0), (0, 0), (10, 10), (10, 10)), mode="reflect")
    # H pass: 21 shifted slices along axis 2
    acc = None
    for k in range(21):
        t = s1d[k] * xp[:, :, k : k + H, :]
        acc = t if acc is None else acc + t
    # W pass
    out = None
    for k in range(21):
        t = s1d[k] * acc[:, :, :, k : k + W]
        out = t if out is None else out + t
    return out


def pd_wminor(xc):
    a = xc[:, :, 0::2, 0::2]
    b = xc[:, :, 0::2, 1::2]
    c = xc[:, :, 1::2, 0::2]
    d = xc[:, :, 1::2, 1::2]
    return 0.5 * (b + c), 0.5 * (a + d)


def bench(tag, fn, x, n=3):
    f = jax.jit(lambda x0: jax.lax.scan(
        lambda c, _: (fn(c + 1e-6), 0.0), x0, None, length=N)[0])
    y = f(x)
    _ = float(jax.tree_util.tree_leaves(y)[0].ravel()[0])
    times = []
    for _i in range(n):
        t1 = time.time()
        y = f(x)
        _ = float(jax.tree_util.tree_leaves(y)[0].ravel()[0])
        times.append((time.time() - t1) / N * 1e3)
    print(f"{tag}: {statistics.median(times):.3f} ms/call", flush=True)
    del y, f
    gc.collect()


try:
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, H, W, 3), jnp.float32)
    xc = jnp.transpose(x, (0, 3, 1, 2))

    def carryize(fn):
        # keep the scan carry full-res: fold the op's output into a scalar
        # perturbation (tanh blocks constant folding; the reduction is a
        # single pass over the op's output, identical for both layouts)
        return lambda c: c + 1e-6 * jnp.tanh(jnp.mean(sum(fn(c))))

    bench("blur NHWC (depthwise conv, shipped)", blur, x)
    bench("blur W-minor (shifted adds)", blur_wminor, xc)
    bench("pair_downsampler NHWC (shipped)",
          carryize(pair_downsampler), x)
    bench("pair_downsampler W-minor", carryize(pd_wminor), xc)
    bench("local_stddev NHWC (shipped)", local_stddev, x)
    # round-trip transpose: the entry/exit tax of a W-minor loss tail
    bench("transpose NHWC->NCHW->NHWC round trip",
          lambda t: jnp.transpose(
              jnp.transpose(t, (0, 3, 1, 2)) + 1e-6, (0, 2, 3, 1)
          ), x)
    print("RESULT filters layout scout done", flush=True)
finally:
    for nme in ("x", "xc", "y"):
        if nme in dir():
            exec(f"del {nme}")
    gc.collect()
    jax.clear_caches()
