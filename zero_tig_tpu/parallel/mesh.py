"""Device-mesh utilities: scene-parallel DP x spatial sharding over ICI.

The reference is strictly single-device (SURVEY.md section 2.7); its only
scale-out is SLURM-level subprocess orchestration (run_pipeline.py). The
TPU-native equivalents here:

  * ``data`` axis -- independent video scenes sharded across chips. Each
    chip carries its own recurrent (last_H3, last_s3) state; gradients for
    batched-scene training are globally averaged by XLA (the loss mean over
    the sharded batch dim lowers to an all-reduce over ICI automatically).
  * ``spatial`` axis -- frame width sharded across chips for the conv
    stacks; XLA's SPMD partitioner inserts the halo exchanges
    (``ppermute``-style collectives) for every conv window.

Everything rides ``jax.sharding.NamedSharding`` + jit: no hand-written
collectives are warranted by this workload (conv nets, no attention).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int = 1, n_spatial: int = 1, devices=None) -> Mesh:
    """A (data, spatial) mesh over the first n_data*n_spatial devices."""
    if devices is None:
        devices = jax.devices()
    need = n_data * n_spatial
    if len(devices) < need:
        raise ValueError(
            f"mesh {n_data}x{n_spatial} needs {need} devices, "
            f"have {len(devices)}"
        )
    grid = np.array(devices[:need]).reshape(n_data, n_spatial)
    return Mesh(grid, ("data", "spatial"))


def frame_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC frames: scenes over 'data', width over 'spatial'."""
    return NamedSharding(mesh, P("data", None, "spatial", None))


def flag_sharding(mesh: Mesh) -> NamedSharding:
    """(B,) per-scene flags over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(mesh: Mesh, tree: Any) -> Any:
    """Replicate a parameter pytree across the mesh."""
    s = replicated(mesh)
    return jax.device_put(tree, s)


def shard_frames(mesh: Mesh, frames: Any) -> Any:
    return jax.device_put(frames, frame_sharding(mesh))


def carry_sharding(mesh: Mesh) -> NamedSharding:
    return frame_sharding(mesh)
