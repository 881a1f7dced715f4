"""Zero-shot training CLI. Parity: reference train.py (same flags/artifacts).

Artifacts per run (train.py:33-36, :135, :149-152):
    <save>/Train-YYYYmmdd-HHMMSS/
        log.txt, scripts/ (snapshot), initial_weights.pt
        model_epochs/weights_<epoch>.pt      (+ .msgpack native twins)
        result/{denoise,enhance}/<scene>_<frame>_{denoise,enhance}_<e>.png
"""

from __future__ import annotations

import argparse
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import save_msgpack, save_torch_pt
from ..core.config import Config, add_config_args, config_from_args
from ..data import create_dataset, device_prefetch
from ..data.prefetch import ChunkRecord, chunk_prefetch
from ..pipeline import (
    eval_forward_step,
    init_train_state,
    train_chunk,
    train_step,
    train_step_spatial,
)
from .common import (
    count_parameters_in_mb,
    create_exp_dir,
    load_variables,
    setup_logging,
    write_png,
)


def run_training(config: Config, *, bn_schedule_faithful: bool = True) -> str:
    """Train per config; returns the run directory."""
    run_dir = create_exp_dir(config.save)
    model_dir = os.path.join(run_dir, "model_epochs")
    os.makedirs(model_dir, exist_ok=True)
    log = setup_logging(run_dir)
    log.info("args = %s", config)

    net_vars, raft_vars = load_variables(config, for_training=True)
    log.info("model size = %f", count_parameters_in_mb(
        {"net": net_vars["params"], "raft": raft_vars["params"]}))

    size = (config.frame_width, config.frame_height)
    train_ds = create_dataset(
        config.dataset, config.lowlight_images_path, "train", size=size
    )
    log.info("Training data: %d", len(train_ds))
    test_ds = create_dataset(
        config.dataset, config.lowlight_images_path, "test", size=size
    )
    log.info("Test data: %d", len(test_ds))

    frame_shape = (config.batch_size, config.frame_height, config.frame_width, 3)
    state = init_train_state(config, net_vars, frame_shape)
    save_msgpack(os.path.join(run_dir, "initial_weights.msgpack"),
                 {"params": state.params, "batch_stats": state.batch_stats})

    from ..core.precision import set_precision
    from ..core.train_ckpt import (
        latest_checkpoint,
        restore_train_state,
        save_train_state,
    )

    set_precision(config.precision)
    start_epoch = 0
    if config.resume:
        ckpt = (
            latest_checkpoint(model_dir)
            if config.resume == "auto"
            else config.resume
        )
        if ckpt and os.path.exists(ckpt):
            state, meta = restore_train_state(ckpt, state)
            start_epoch = int(meta.get("epoch", -1)) + 1
            log.info("Resumed full train state from %s (epoch %d)",
                     ckpt, start_epoch)

    if config.mesh_data > 1:
        # scene-parallel SPMD training (parallel/spmd_train.py): B scene
        # streams in lockstep on the (data x spatial) mesh. A different
        # (better-conditioned) trajectory than the reference's strict
        # batch-1 sequential loop -- the intended production scale-out.
        from ..parallel import make_mesh, train_scenes_spmd

        log.info(
            "SPMD training: mesh=(%d x %d)",
            config.mesh_data, config.mesh_spatial,
        )
        mesh = make_mesh(config.mesh_data, config.mesh_spatial)
        spmd_state = None
        for epoch in range(start_epoch, config.epochs):
            spmd_state = train_scenes_spmd(
                config, train_ds, raft_vars, net_vars=net_vars,
                epochs=1, epoch_offset=epoch, state=spmd_state, mesh=mesh,
                log_fn=log.info,
            )
            host_state = jax.tree_util.tree_map(np.asarray, spmd_state)
            net_out = {
                "params": host_state.params,
                "batch_stats": host_state.batch_stats,
            }
            save_msgpack(
                os.path.join(model_dir, f"weights_{epoch}.msgpack"), net_out
            )
            try:
                save_torch_pt(
                    os.path.join(model_dir, f"weights_{epoch}.pt"),
                    net_out, jax.tree_util.tree_map(np.asarray, raft_vars),
                )
            except ImportError:
                log.warning("torch unavailable: skipped .pt export")
            _dump_eval_images(
                config, host_state, raft_vars, test_ds, run_dir, epoch
            )
        return run_dir

    step_kwargs = dict(
        of_scale=config.of_scale,
        raft_iters=config.raft_iters,
        is_wb=config.is_wb,
        lr=config.lr,
        grad_clip=config.grad_clip,
        weight_decay=config.weight_decay,
    )

    total_step = 0
    for epoch in range(start_epoch, config.epochs):
        # reference BN-mode schedule quirk: only epoch 0 trains with batch
        # statistics (train.py:115-138; see models.network.forward_train)
        bn_train = (epoch == 0) if bn_schedule_faithful else True
        losses = []
        if config.spatial_bands > 1:
            stream = device_prefetch(
                train_ds.iter_u8(), depth=config.prefetch_depth
            )
            # per-band gradient accumulation: f32-faithful full-res training
            # on one chip (pipeline.train_step_spatial; equivalence-tested).
            # Epoch 0 uses the exact two-pass banded train-mode BatchNorm
            # (bug-faithful reference schedule, train.py:115-138).
            for item in stream:
                state, loss = train_step_spatial(
                    state, raft_vars, item.image,
                    jnp.asarray(item.is_new_seq),
                    bands=config.spatial_bands, halo=config.spatial_halo,
                    bn_train=bn_train, **step_kwargs,
                )
                losses.append(float(loss))
                total_step += 1
                log.info(
                    "train-epoch %03d %03d %f", epoch, len(losses) - 1,
                    losses[-1],
                )
            items = ()  # frames consumed; fall through to the epoch tail
        else:
            # chunk_prefetch stages each chunk as ONE uint8 H2D block
            # (steps normalize in-graph); trailing partials arrive as
            # per-frame DeviceRecords
            items = chunk_prefetch(
                train_ds.iter_u8(), config.chunk,
                depth=config.prefetch_depth,
            )
        # --chunk K runs K sequential frames as ONE lax.scan program
        # (pipeline.train_chunk, loop-equivalence tested); the trailing
        # partial group uses the per-frame step so no padding frame ever
        # advances the optimizer
        for item in items:
            if isinstance(item, ChunkRecord):
                state, k_losses = train_chunk(
                    state, raft_vars, item.images, item.flags,
                    bn_train=bn_train, **step_kwargs,
                )
                for lv in np.asarray(k_losses):
                    losses.append(float(lv))
                    total_step += 1
                    log.info(
                        "train-epoch %03d %03d %f", epoch, len(losses) - 1,
                        losses[-1],
                    )
            else:
                state, loss = train_step(
                    state, raft_vars, item.image,
                    jnp.asarray(item.is_new_seq), bn_train=bn_train,
                    **step_kwargs,
                )
                losses.append(float(loss))
                total_step += 1
                log.info(
                    "train-epoch %03d %03d %f", epoch, len(losses) - 1,
                    losses[-1],
                )
        log.info("train-epoch %03d %f", epoch, float(np.mean(losses)))

        net_out = {"params": state.params, "batch_stats": state.batch_stats}
        save_msgpack(
            os.path.join(model_dir, f"weights_{epoch}.msgpack"), net_out
        )
        save_train_state(
            os.path.join(model_dir, f"state_{epoch}.msgpack"),
            state, epoch=epoch, step=total_step,
        )
        try:
            save_torch_pt(
                os.path.join(model_dir, f"weights_{epoch}.pt"),
                net_out, raft_vars,
            )
        except ImportError:
            log.warning("torch unavailable: skipped .pt export")

        # per-epoch eval image dump (train.py:137-152)
        _dump_eval_images(config, state, raft_vars, test_ds, run_dir, epoch)
    return run_dir


def _dump_eval_images(config, state, raft_vars, test_ds, run_dir, epoch):
    """Per-epoch test-split dumps (train.py:137-152).

    Deliberate fix over the reference: its eval loop calls Network.forward
    directly, which never runs update_H3 (that happens only inside _loss,
    model/model.py:205-219), so reference eval frames 2+ warp the recurrent
    state left over from the LAST TRAINING FRAME. Here the carry threads
    through the eval frames like real streaming inference.
    """
    os.makedirs(os.path.join(run_dir, "result", "denoise"), exist_ok=True)
    os.makedirs(os.path.join(run_dir, "result", "enhance"), exist_ok=True)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    carry = None
    for rec in device_prefetch(test_ds.iter_u8(), depth=config.prefetch_depth):
        if carry is None:
            zeros = jnp.zeros_like(rec.image)
            carry = {"last_H3": zeros, "last_s3": zeros}
        (H2, H3), carry = eval_forward_step(
            variables, raft_vars, rec.image, carry,
            jnp.asarray(rec.is_new_seq),
            of_scale=config.of_scale, raft_iters=config.raft_iters,
        )
        # reference names dumps by the immediate parent dir only
        # (train.py:146), which collides across scenes sharing a brightness
        # folder; include the scene dir as well.
        parent = os.path.dirname(rec.path)
        scene = f"{os.path.basename(os.path.dirname(parent))}_{os.path.basename(parent)}"
        name = f"{scene}_{rec.name}"
        write_png(
            os.path.join(run_dir, "result", "denoise",
                         f"{name}_denoise_{epoch}.png"),
            np.asarray(H3)[0],
        )
        write_png(
            os.path.join(run_dir, "result", "enhance",
                         f"{name}_enhance_{epoch}.png"),
            np.asarray(H2)[0],
        )


def main(argv=None):
    from ..core.cache import enable_persistent_cache

    enable_persistent_cache()
    parser = argparse.ArgumentParser("ZERO-TIG")
    add_config_args(parser)
    config = config_from_args(parser.parse_args(argv))
    np.random.seed(config.seed)
    run_training(config)


if __name__ == "__main__":
    main()
