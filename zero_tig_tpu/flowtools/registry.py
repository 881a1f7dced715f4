"""Flow-model registry for the benchmarking/validation sidecar.

The reference vendors ptlflow tooling over an external model zoo
(ptlflow_scripts/, SURVEY.md section 1 L7). This framework ships its own
RAFT; the registry keeps the sidecar extensible to additional flow models
without importing a zoo.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax


@dataclass
class FlowModel:
    name: str
    init_fn: Callable[[jax.Array], Any]  # key -> variables
    forward_fn: Callable[..., tuple]  # (vars, img1, img2, iters) -> flows
    default_iters: int
    # (vars, img1, img2, iters) -> (seq, B, H, W, 2) full-res prediction
    # sequence for supervised training (RAFT: per-refinement-iteration;
    # PWC: per-pyramid-level); None = model is not trainable via the
    # sidecar's sequence loss
    predictions_fn: Callable[..., Any] | None = None


_REGISTRY: dict[str, FlowModel] = {}


def register_flow_model(model: FlowModel) -> None:
    _REGISTRY[model.name] = model


def get_flow_model(name: str) -> FlowModel:
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown flow model {name!r}; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def available_models() -> list[str]:
    return sorted(_REGISTRY)


def _register_builtin() -> None:
    from ..models.classical_flow import init_lk_variables, lk_forward
    from ..models.pwc import init_pwc_variables, pwc_forward
    from ..models.raft.raft import init_raft_variables, raft_forward
    from ..models.raft.small import init_raft_small_variables, raft_small_forward

    register_flow_model(
        FlowModel(
            name="raft",
            init_fn=init_raft_variables,
            forward_fn=lambda v, a, b, iters: raft_forward(v, a, b, iters=iters),
            default_iters=12,
            predictions_fn=lambda v, a, b, iters: raft_forward(
                v, a, b, iters=iters, return_predictions=True
            )[1],
        )
    )
    register_flow_model(
        FlowModel(
            name="raft_small",
            init_fn=init_raft_small_variables,
            forward_fn=lambda v, a, b, iters: raft_small_forward(
                v, a, b, iters=iters
            ),
            default_iters=12,
            predictions_fn=lambda v, a, b, iters: raft_small_forward(
                v, a, b, iters=iters, return_predictions=True
            )[1],
        )
    )
    register_flow_model(
        FlowModel(
            name="lk_pyramid",
            init_fn=init_lk_variables,
            forward_fn=lambda v, a, b, iters: lk_forward(v, a, b, iters=iters),
            default_iters=3,
            predictions_fn=None,  # classical: nothing to train
        )
    )
    register_flow_model(
        FlowModel(
            name="pwc_lite",
            init_fn=init_pwc_variables,
            forward_fn=lambda v, a, b, iters: pwc_forward(
                v, a, b, iters=iters
            ),
            default_iters=1,
            predictions_fn=lambda v, a, b, iters: pwc_forward(
                v, a, b, iters=iters, return_predictions=True
            )[1],
        )
    )


_register_builtin()
