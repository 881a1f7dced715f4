"""Persistent XLA compilation cache for instant(er) CLI startup.

Findings on this platform (round 2, measured with jax_explain_cache_misses):
the persistent cache keys ARE stable across processes (identical entry
hashes; the 8.5 MB jit_predict_step executable is written once and HIT by
later processes -- no miss warning). What remains variable is the axon
relay's executable-load/claim path: the same cached predict_step took 16 s
in one process and 446 s in another with zero recompilation. On
conventional TPU runtimes the cache removes the 20-700 s compile tax
entirely; here it removes the compile while the experimental relay's load
variance persists (out of our control).

Every CLI enables the cache by default; ZERO_TIG_COMPILE_CACHE=off
disables, or set it to a directory path to relocate. Note: on CPU, cached
AOT executables log a machine-feature-mismatch warning when the cache dir
moves between heterogeneous hosts (XLA falls back safely); keep the cache
host-local.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a durable directory."""
    path = path or os.environ.get(
        "ZERO_TIG_COMPILE_CACHE",
        os.path.expanduser("~/.cache/zero_tig_tpu/xla"),
    )
    if not path or path.lower() in ("0", "off", "none"):
        return None
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return path
