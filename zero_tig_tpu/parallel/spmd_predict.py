"""Scene-parallel SPMD inference driver.

The serving/eval analogue of spmd_train (SURVEY.md section 2.7-1): B
independent scene streams run the fused inference step TOGETHER on the
mesh's data axis. Every row's recurrent carry stays chip-local (no
communication at all -- scenes are embarrassingly parallel), parameters are
replicated, and each lockstep batch is one `predict_step` dispatch over a
(B, H, W, 3) frame block. Per-frame outputs are exactly the single-device
outputs (all per-sample math; sharded-vs-single equivalence is tested on
the 8-device CPU mesh).

Streams shorter than the longest wrap to their start; the driver dedupes
the revisited paths so each frame is emitted once.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import Config
from ..data.datasets import FrameDataset
from ..pipeline import predict_step
from .mesh import flag_sharding, frame_sharding, make_mesh, shard_params
from .spmd_train import batched_records


def predict_scenes_spmd(
    config: Config,
    dataset: FrameDataset,
    net_vars: dict,
    raft_vars,
    on_frame: Callable[[str, np.ndarray, np.ndarray, np.ndarray], None],
    *,
    mesh=None,
) -> int:
    """Run B = mesh data-axis scene streams in lockstep.

    on_frame(path, H2, H3, s3) fires once per unique frame, with (H, W, 3)
    float32 arrays. Returns the number of frames emitted.
    """
    if mesh is None:
        mesh = make_mesh(config.mesh_data, config.mesh_spatial)
    n_data = mesh.shape["data"]

    net_vars = shard_params(mesh, net_vars)
    raft_vars = shard_params(mesh, raft_vars)
    fs = frame_sharding(mesh)

    shape = (n_data, config.frame_height, config.frame_width, 3)
    carry = {
        "last_H3": jax.device_put(jnp.zeros(shape, jnp.float32), fs),
        "last_s3": jax.device_put(jnp.zeros(shape, jnp.float32), fs),
    }
    sk = dict(
        of_scale=config.of_scale, raft_iters=config.raft_iters,
        enh_scale=config.enh_scale,
    )

    emitted: set[str] = set()
    count = 0
    with jax.sharding.set_mesh(mesh):
        for frames, flags, paths in batched_records(dataset, n_data):
            f = jax.device_put(jnp.asarray(frames), fs)
            g = jax.device_put(jnp.asarray(flags), flag_sharding(mesh))
            (H2, H3, s3), carry = predict_step(
                net_vars, raft_vars, f, carry, g, **sk
            )
            H2n, H3n, s3n = (np.asarray(H2), np.asarray(H3), np.asarray(s3))
            for i, p in enumerate(paths):
                if p in emitted:
                    continue  # wrapped stream revisit
                emitted.add(p)
                on_frame(p, H2n[i], H3n[i], s3n[i])
                count += 1
    return count
