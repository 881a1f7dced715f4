#!/usr/bin/env python
"""Persistent TPU worker: holds the (slow-to-acquire) chip claim and executes
python snippets submitted through a FIFO, so iterative TPU work doesn't pay
the ~10-minute grant-reacquisition penalty per process.

Usage:
    python tools/tpu_worker.py /tmp/tpu_cmd /tmp/tpu_log &
    # submit work (appends full snippet output to the log):
    cat snippet.py > /tmp/tpu_cmd
    # each snippet runs in a shared namespace; 'DONE <n>' marks completion
"""

from __future__ import annotations

import os
import sys
import time
import traceback


def main():
    fifo_path, log_path = sys.argv[1], sys.argv[2]
    if os.path.exists(fifo_path):
        os.remove(fifo_path)
    os.mkfifo(fifo_path)

    log = open(log_path, "a", buffering=1)
    sys.stdout = log
    sys.stderr = log

    print(f"[worker] claiming TPU...", flush=True)
    t0 = time.time()
    import jax
    import jax.numpy as jnp

    print(f"[worker] devices={jax.devices()} claim_s={time.time()-t0:.1f}",
          flush=True)

    ns = {"jax": jax, "jnp": jnp, "time": time}
    n = 0
    while True:
        with open(fifo_path) as f:
            code = f.read()
        if code.strip() == "EXIT":
            print("[worker] exiting", flush=True)
            return
        n += 1
        print(f"[worker] --- snippet {n} ---", flush=True)
        t0 = time.time()
        try:
            exec(compile(code, f"<snippet{n}>", "exec"), ns)
            print(f"DONE {n} ({time.time()-t0:.1f}s)", flush=True)
        except Exception:
            traceback.print_exc()
            print(f"FAIL {n} ({time.time()-t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
