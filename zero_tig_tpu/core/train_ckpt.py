"""Full training-state checkpointing with resume.

The reference saves only ``model.state_dict()`` per epoch -- no optimizer
moments, no step counter, no resume (utils/utils.py:94-95, SURVEY.md
section 5). As a production framework feature, this module persists the
COMPLETE TrainState (params, batch_stats, Adam moments, recurrent carry)
plus progress metadata, atomically, in flax-msgpack format.
"""

from __future__ import annotations

import json
import os
from typing import Any

from flax import serialization

from ..pipeline.steps import TrainState


def save_train_state(
    path: str, state: TrainState, *, epoch: int, step: int, extra: dict | None = None
) -> None:
    """Atomic save of the full TrainState + metadata sidecar."""
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "carry": state.carry,
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(payload))
    os.replace(tmp, path)
    meta = {"epoch": epoch, "step": step, **(extra or {})}
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f)


def restore_train_state(
    path: str, template: TrainState
) -> tuple[TrainState, dict]:
    """Restore a TrainState saved by save_train_state.

    `template` provides the pytree structure (build it with
    pipeline.init_train_state on the same config/shapes).
    """
    tpl = {
        "params": template.params,
        "batch_stats": template.batch_stats,
        "opt_state": template.opt_state,
        "carry": template.carry,
    }
    with open(path, "rb") as f:
        restored = serialization.from_bytes(tpl, f.read())
    meta: dict[str, Any] = {}
    meta_path = path + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    state = TrainState(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        carry=restored["carry"],
    )
    return state, meta


def latest_checkpoint(ckpt_dir: str, prefix: str = "state_") -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    cands = [
        f for f in os.listdir(ckpt_dir)
        if f.startswith(prefix) and f.endswith(".msgpack")
    ]
    if not cands:
        return None
    cands.sort(key=lambda f: int(f[len(prefix) : -len(".msgpack")]))
    return os.path.join(ckpt_dir, cands[-1])
