"""Streaming enhancement service: a resident process serving frame streams.

The reference has no serving story -- every invocation pays model setup and
(on this platform) compilation. This daemon productizes the worker pattern:
load weights ONCE, compile ONCE (plus the persistent cache), then watch an
inbox directory for frames and stream them through the fused step with
per-scene recurrent carries, exactly like predict but incremental and
restart-safe.

Layout:
    <inbox>/<scene...>/NNN.png        arriving low-light frames
    <save>/<scene...>/NNN_denoise.png (H3) + NNN_enhance.png (H2)
    <save>/manifest.jsonl             one line per processed frame

Frames process in numeric order per scene directory; a gap in numbering
starts a new sequence (the reference's sequential_judgment semantics). A
frame is only consumed once its successor exists or the stream has been
quiet for --serve_settle_sec (so partially-written files are never read).
Already-produced outputs are skipped on restart (idempotent). The service
exits when <inbox>/STOP exists or nothing new arrived for
--serve_max_idle_sec.
"""

from __future__ import annotations

import argparse
import glob
import json
import logging
import os
import time

import jax.numpy as jnp
import numpy as np

from ..core.config import Config, add_config_args, config_from_args
from ..data.datasets import extract_number, sort_files_by_name
from ..pipeline import predict_chunk, predict_step
from .common import load_variables, setup_logging, write_png


def _scan(inbox: str) -> dict[str, list[str]]:
    """Scene dir -> numerically sorted frame paths. (The STOP sentinel is
    a bare file, never *.png, so no filtering is needed here; the loop-top
    existence check handles shutdown.)"""
    frames: dict[str, list[str]] = {}
    for p in glob.glob(os.path.join(inbox, "**", "*.png"), recursive=True):
        frames.setdefault(os.path.dirname(p), []).append(p)
    return {d: sort_files_by_name(ps) for d, ps in frames.items()}


def run_serve(
    config: Config,
    *,
    poll_sec: float = 0.5,
    settle_sec: float = 2.0,
    max_idle_sec: float = 60.0,
) -> int:
    """Serve until STOP or idle timeout; returns frames processed."""
    os.makedirs(config.save, exist_ok=True)
    setup_logging(config.save)
    log = logging.getLogger()

    from ..core.precision import set_precision

    set_precision(config.precision)
    net_vars, raft_vars = load_variables(config)
    log.info("serving %s -> %s", config.lowlight_images_path, config.save)

    # --mesh_data N: scene-parallel SPMD serving (SURVEY 2.7-1 composed
    # with the serving story) -- up to N scene streams step in lockstep as
    # ONE sharded predict_step dispatch over the mesh's data axis, carries
    # staying per-scene. Width sharding composes via --mesh_spatial.
    mesh = fs = gs = None
    if config.mesh_data > 1 or config.mesh_spatial > 1:
        from ..parallel import (
            flag_sharding,
            frame_sharding,
            make_mesh,
            shard_params,
        )

        mesh = make_mesh(config.mesh_data, config.mesh_spatial)
        net_vars = shard_params(mesh, net_vars)
        raft_vars = shard_params(mesh, raft_vars)
        fs = frame_sharding(mesh)
        gs = flag_sharding(mesh)
        log.info("scene-parallel serving on mesh %s", dict(mesh.shape))

    manifest_path = os.path.join(config.save, "manifest.jsonl")
    done: set[str] = set()
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            done = {json.loads(line)["path"] for line in f if line.strip()}
        log.info("resuming: %d frames already served", len(done))

    carries: dict[str, dict] = {}
    last_idx: dict[str, int] = {}
    sk = dict(
        of_scale=config.of_scale, raft_iters=config.raft_iters,
        enh_scale=config.enh_scale,
    )
    processed = 0
    last_activity = time.time()
    inbox = config.lowlight_images_path

    from PIL import Image

    with open(manifest_path, "a") as manifest:
        while True:
            if os.path.exists(os.path.join(inbox, "STOP")):
                log.info("STOP file found; exiting")
                break
            scenes = _scan(inbox)
            acted = False
            now = time.time()

            def load_frame(p: str) -> np.ndarray:
                # uint8 to the device: 4x less H2D than f32 and avoids the
                # relay's pathologically slow float-transfer path (see
                # data.prefetch). The steps normalize in-graph
                # (pipeline.steps._norm_frames; reassociation-level ~1e-7
                # vs host /255 -- far below the u8 emit quantization).
                with Image.open(p) as im:
                    im = im.convert("RGB")
                    size = (config.frame_width, config.frame_height)
                    if im.size != size:
                        im = im.resize(size, Image.Resampling.BICUBIC)
                    return np.asarray(im, np.uint8)

            def emit(p, scene, idx, is_new, H2, H3):
                rel = os.path.relpath(p, inbox)
                out_dir = os.path.join(config.save, os.path.dirname(rel))
                os.makedirs(out_dir, exist_ok=True)
                stem = os.path.splitext(os.path.basename(p))[0]
                write_png(
                    os.path.join(out_dir, stem + "_denoise.png"),
                    np.asarray(H3),
                )
                write_png(
                    os.path.join(out_dir, stem + "_enhance.png"),
                    np.asarray(H2),
                )
                manifest.write(json.dumps({
                    "path": p, "scene": scene, "index": idx,
                    "new_seq": bool(is_new), "t": time.time(),
                }) + "\n")
                manifest.flush()
                done.add(p)
                log.info("served %s (new_seq=%s)", rel, is_new)

            todo_map: dict[str, list[str]] = {}
            for scene, paths in sorted(scenes.items()):
                # maximal consecutive settled prefix of unserved frames
                todo: list[str] = []
                for i, p in enumerate(paths):
                    if p in done:
                        continue
                    settled = (
                        i + 1 < len(paths)
                        or now - os.path.getmtime(p) >= settle_sec
                    )
                    if not settled:
                        break
                    todo.append(p)
                if todo:
                    todo_map[scene] = todo

            if mesh is not None and todo_map:
                import jax

                acted = True
                n_data = config.mesh_data
                while any(todo_map.values()):
                    # one frame from each of up to n_data active scenes;
                    # short rows pad with a replica of row 0 (fresh-seq
                    # flag, throwaway carry slot, output dropped)
                    active = [
                        s for s in sorted(todo_map) if todo_map[s]
                    ][:n_data]
                    metas, bf, bflag, ch3, cs3 = [], [], [], [], []
                    for slot in range(n_data):
                        if slot < len(active):
                            scene = active[slot]
                            p = todo_map[scene].pop(0)
                            idx = extract_number(p)
                            is_new = (
                                scene not in carries
                                or idx != last_idx.get(scene, -2) + 1
                            )
                            last_idx[scene] = idx
                            metas.append((p, scene, idx, is_new))
                            bf.append(load_frame(p))
                            bflag.append(is_new)
                            c = carries.get(scene)
                            if c is None:
                                z = np.zeros(bf[-1].shape, np.float32)
                                c = {"last_H3": z, "last_s3": z}
                            ch3.append(c["last_H3"])
                            cs3.append(c["last_s3"])
                        else:
                            metas.append(None)
                            bf.append(bf[0])
                            bflag.append(True)
                            ch3.append(np.zeros(bf[0].shape, np.float32))
                            cs3.append(np.zeros(bf[0].shape, np.float32))
                    f = jax.device_put(jnp.asarray(np.stack(bf)), fs)
                    g = jax.device_put(
                        jnp.asarray(np.asarray(bflag)), gs
                    )
                    carry_b = {
                        "last_H3": jax.device_put(
                            jnp.asarray(np.stack(ch3)), fs
                        ),
                        "last_s3": jax.device_put(
                            jnp.asarray(np.stack(cs3)), fs
                        ),
                    }
                    with jax.sharding.set_mesh(mesh):
                        (H2, H3, _s3), carry_b = predict_step(
                            net_vars, raft_vars, f, carry_b, g, **sk
                        )
                    H2n, H3n = np.asarray(H2), np.asarray(H3)
                    h3b = np.asarray(carry_b["last_H3"])
                    s3b = np.asarray(carry_b["last_s3"])
                    for slot, meta in enumerate(metas):
                        if meta is None:
                            continue
                        p, scene, idx, is_new = meta
                        carries[scene] = {
                            "last_H3": h3b[slot], "last_s3": s3b[slot],
                        }
                        emit(p, scene, idx, is_new, H2n[slot], H3n[slot])
                        processed += 1
                todo_map = {}

            for scene, todo in sorted(todo_map.items()):
                acted = True
                while todo:
                    if config.chunk > 1 and len(todo) >= config.chunk:
                        # settled backlog of >= K frames: ONE lax.scan
                        # dispatch (predict_chunk) -- the serving analogue
                        # of the bench's chunked throughput path. Groups
                        # are exactly K frames so one compiled program
                        # serves every backlog.
                        group = todo[: config.chunk]
                        todo = todo[config.chunk :]
                        arrs, flags, idxs = [], [], []
                        seen = scene in carries
                        for p in group:
                            idx = extract_number(p)
                            flags.append(
                                (not seen)
                                or idx != last_idx.get(scene, -2) + 1
                            )
                            seen = True  # carry exists after frame 1
                            idxs.append(idx)
                            last_idx[scene] = idx
                            arrs.append(load_frame(p))
                        frames_k = jnp.asarray(np.stack(arrs)[:, None])
                        if scene not in carries:
                            zeros = jnp.zeros(
                                frames_k[0].shape, jnp.float32
                            )
                            carries[scene] = {
                                "last_H3": zeros, "last_s3": zeros,
                            }
                        (H2s, H3s), carries[scene] = predict_chunk(
                            net_vars, raft_vars, frames_k, carries[scene],
                            jnp.asarray(flags), emit="u8", **sk,
                        )
                        H2s = np.asarray(H2s)
                        H3s = np.asarray(H3s)
                        for k, p in enumerate(group):
                            emit(p, scene, idxs[k], flags[k],
                                 H2s[k, 0], H3s[k, 0])
                        processed += len(group)
                    else:
                        p = todo.pop(0)
                        frame = jnp.asarray(load_frame(p)[None])
                        idx = extract_number(p)
                        is_new = (
                            scene not in carries
                            or idx != last_idx.get(scene, -2) + 1
                        )
                        if scene not in carries:
                            zeros = jnp.zeros(frame.shape, jnp.float32)
                            carries[scene] = {
                                "last_H3": zeros, "last_s3": zeros,
                            }
                        (H2, H3, _s3), carries[scene] = predict_step(
                            net_vars, raft_vars, frame, carries[scene],
                            jnp.asarray(is_new), **sk,
                        )
                        last_idx[scene] = idx
                        emit(p, scene, idx, is_new,
                             np.asarray(H2)[0], np.asarray(H3)[0])
                        processed += 1
            if acted:
                last_activity = time.time()
            elif time.time() - last_activity > max_idle_sec:
                log.info("idle %.0fs; exiting", max_idle_sec)
                break
            else:
                time.sleep(poll_sec)
    return processed


def main(argv=None):
    from ..core.cache import enable_persistent_cache

    enable_persistent_cache()
    parser = argparse.ArgumentParser("ZERO-TIG-serve")
    add_config_args(parser)
    parser.add_argument("--serve_poll_sec", type=float, default=0.5)
    parser.add_argument("--serve_settle_sec", type=float, default=2.0)
    parser.add_argument("--serve_max_idle_sec", type=float, default=60.0)
    args = parser.parse_args(argv)
    config = config_from_args(args)
    run_serve(
        config,
        poll_sec=args.serve_poll_sec,
        settle_sec=args.serve_settle_sec,
        max_idle_sec=args.serve_max_idle_sec,
    )


if __name__ == "__main__":
    main()
