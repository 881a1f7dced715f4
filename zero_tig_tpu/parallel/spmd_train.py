"""Scene-parallel SPMD training driver.

The reference scales out by launching one process per dataset under SLURM
(run_pipeline.py). TPU-natively, B independent scenes train TOGETHER on a
(data, spatial) mesh: each chip row holds one scene's frames and recurrent
carry (chip-local, never communicated), gradients average across scenes via
the ICI all-reduce XLA inserts for the batched loss mean, and frame width
can additionally shard across the spatial axis (XLA adds conv halos).

Semantics note: the reference presents frames strictly sequentially with
batch 1, so scene-parallel training is a *different* (better-conditioned)
optimization trajectory -- gradients average over B scenes per step. This is
the intended production mode, not a bit-reproduction of the paper loop
(which batch_size=1 still gives).
"""

from __future__ import annotations

from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import Config
from ..data.datasets import FrameDataset
from ..models import init_network_variables
from ..pipeline import TrainState, init_train_state, train_step
from .mesh import flag_sharding, frame_sharding, make_mesh, shard_params


def scene_streams(
    dataset: FrameDataset, n_streams: int
) -> list[list[str]]:
    """Split the dataset's frame paths into n contiguous scene-preserving
    streams (round-robin over scene boundaries, balanced by frame count)."""
    from ..data.datasets import sequential_judgment

    scenes: list[list[str]] = []
    prev = None
    for p in dataset.paths:
        if prev is None or sequential_judgment(p, prev):
            scenes.append([])
        scenes[-1].append(p)
        prev = p
    streams: list[list[str]] = [[] for _ in range(n_streams)]
    sizes = [0] * n_streams
    for scene in sorted(scenes, key=len, reverse=True):
        i = int(np.argmin(sizes))
        streams[i].extend(scene)
        sizes[i] += len(scene)
    return streams


def batched_records(
    dataset: FrameDataset, n_streams: int
) -> Iterator[tuple[np.ndarray, np.ndarray, list[str]]]:
    """Yield ((B, H, W, 3) frames, (B,) is_new_seq, [B paths]) lockstep
    batches.

    Streams shorter than the longest loop back to their start (their
    re-entry is a new sequence, resetting that chip's carry; inference
    drivers dedupe revisited paths).
    """
    streams = scene_streams(dataset, n_streams)
    if any(not s for s in streams):
        raise ValueError(
            f"need >= {n_streams} scenes/frames to fill every stream"
        )
    length = max(len(s) for s in streams)
    prevs = [s[0] for s in streams]
    from ..data.datasets import sequential_judgment

    for t in range(length):
        frames = []
        flags = []
        paths = []
        for i, s in enumerate(streams):
            p = s[t % len(s)]
            # first frame self-compares -> new seq; wraparound jumps back to
            # a lower index -> new seq (both via sequential_judgment)
            flags.append(sequential_judgment(p, prevs[i]))
            prevs[i] = p
            paths.append(p)
            frames.append(dataset.load_image(p))
        yield np.stack(frames), np.asarray(flags), paths


def train_scenes_spmd(
    config: Config,
    dataset: FrameDataset,
    raft_vars,
    *,
    net_vars: dict | None = None,
    epochs: int | None = None,
    epoch_offset: int = 0,
    state: TrainState | None = None,
    mesh=None,
    log_fn=print,
) -> TrainState:
    """Train over B = mesh data-axis scene streams in SPMD lockstep.

    state/epoch_offset let a caller drive one epoch at a time (the train
    CLI does, to save per-epoch artifacts): the BN schedule quirk keys on
    the ABSOLUTE epoch (epoch_offset + loop index).
    """
    if mesh is None:
        mesh = make_mesh(config.mesh_data, config.mesh_spatial)
    n_data = mesh.shape["data"]
    if net_vars is None:
        net_vars = init_network_variables(jax.random.PRNGKey(config.seed))

    fs = frame_sharding(mesh)
    if state is None:
        shape = (n_data, config.frame_height, config.frame_width, 3)
        state = init_train_state(config, net_vars, shape)
        state = state._replace(
            params=shard_params(mesh, state.params),
            batch_stats=shard_params(mesh, state.batch_stats),
            opt_state=shard_params(mesh, state.opt_state),
            carry=jax.device_put(state.carry, fs),
        )
    raft_vars = shard_params(mesh, raft_vars)

    step_kwargs = dict(
        of_scale=config.of_scale, raft_iters=config.raft_iters,
        is_wb=config.is_wb, lr=config.lr, grad_clip=config.grad_clip,
        weight_decay=config.weight_decay,
    )
    epochs = config.epochs if epochs is None else epochs
    with jax.sharding.set_mesh(mesh):
        for rel_epoch in range(epochs):
            epoch = epoch_offset + rel_epoch
            bn_train = epoch == 0
            losses = []
            for step, (frames, flags, _paths) in enumerate(
                batched_records(dataset, n_data)
            ):
                f = jax.device_put(jnp.asarray(frames), fs)
                g = jax.device_put(jnp.asarray(flags), flag_sharding(mesh))
                state, loss = train_step(
                    state, raft_vars, f, g, bn_train=bn_train, **step_kwargs
                )
                losses.append(float(loss))
                log_fn(f"spmd-epoch {epoch:03d} {step:03d} {losses[-1]:f}")
            log_fn(f"spmd-epoch {epoch:03d} mean {float(np.mean(losses)):f}")
    return state
