#!/usr/bin/env python
"""Standalone checkpoint converter: reference .pt <-> native .msgpack.

The in-library converter (core/checkpoint.py) handles both directions with
exact key parity (incl. the Enhancer's shared conv+BN aliases and the
NCHW/OIHW <-> NHWC/HWIO transposes); this CLI exposes it for users moving
between the PyTorch reference and this framework without running a full
train/predict:

    # reference checkpoint -> native pytree checkpoint
    python tools/convert_checkpoint.py weights/BVI-RLV.pt out/BVI-RLV.msgpack

    # native -> reference-loadable .pt (combined net + raft keys)
    python tools/convert_checkpoint.py run/model_epochs/weights_4.msgpack \
        out/weights_4.pt

Direction follows the output extension. .msgpack stores
{"net": {params, batch_stats}, "raft": {params, batch_stats}}.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument(
        "--seed", type=int, default=2,
        help="init seed for structure templates (native -> .pt)",
    )
    args = ap.parse_args(argv)

    import jax

    from zero_tig_tpu.core.checkpoint import (
        load_msgpack,
        load_torch_checkpoint,
        save_msgpack,
        save_torch_pt,
    )
    from zero_tig_tpu.models import (
        init_network_variables,
        init_raft_variables,
    )

    net_tmpl = init_network_variables(jax.random.PRNGKey(args.seed))
    raft_tmpl = init_raft_variables(jax.random.PRNGKey(args.seed + 1))

    if args.dst.endswith((".msgpack", ".msgpk")):
        net_vars, raft_vars = load_torch_checkpoint(args.src)
        save_msgpack(
            args.dst,
            {"net": net_vars or net_tmpl, "raft": raft_vars or raft_tmpl},
        )
        missing = [k for k, v in (("net", net_vars), ("raft", raft_vars))
                   if v is None]
        if missing:
            print(f"note: {args.src} had no {'/'.join(missing)} keys; "
                  "template init written for those", file=sys.stderr)
    elif args.dst.endswith((".pt", ".pth")):
        tree = load_msgpack(args.src, {"net": net_tmpl, "raft": raft_tmpl})
        save_torch_pt(args.dst, tree["net"], tree["raft"])
    else:
        ap.error("output must end in .msgpack or .pt/.pth")
    print(f"wrote {args.dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
